"""Python UDTF surface (SURVEY.md §2.10) — the table-function escape hatch.

The reference keeps zero UDFs in its core and so does this engine: every
production operator is built-in-function JVM code (see t14's
sequence+slice chunker for the fast path of exactly this transform).
This module exists to COMPLETE the sanctioned-hatch surface: pandas_udf /
applyInPandas / mapInPandas / applyInPandasWithState are covered in
pandas_ops.py and streaming/stateful.py; the one remaining member of the
Spark 4 Python-function family is the user-defined TABLE function — one
row in, a relation out, usable as a lateral join in SQL.

When to reach for it: a row-to-rows expansion whose logic genuinely can't
be expressed with explode/sequence/transform (e.g. calling a tokenizer
library).  It runs a Python worker per batch, so it is strictly slower
than the built-in path — the differential test pins the two
implementations to byte-identical output so the fast path can always be
substituted.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_NORM = re.compile(r"[^a-z0-9]+")
_WS = re.compile(r"\s+")


@udtf(returnType="chunk_idx: bigint, start_tok: bigint, n_tok: bigint, chunk: string")
class ChunkDocumentUDTF:
    """Sliding-window token chunker (the UDTF twin of queries/text.py
    ``_chunk_frame``): normalize, whitespace-tokenize, emit one row per
    width-token chunk at the given stride."""

    def eval(self, text: str, width: int, stride: int):  # noqa: D102
        if text is None:
            return
        norm = _WS.sub(" ", _NORM.sub(" ", text.lower())).strip()
        if not norm:
            return
        toks = norm.split(" ")
        for start in range(0, len(toks), stride):
            chunk = toks[start : start + width]
            yield start // stride, start, len(chunk), " ".join(chunk)


def register_chunk_udtf(
    spark: SparkSession, name: str = "chunk_document"
) -> None:
    """Register for SQL lateral use:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_document(d.text, 64, 48) c``
    """
    spark.udtf.register(name, ChunkDocumentUDTF)
