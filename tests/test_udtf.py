"""Python UDTF surface (§2.10): the lateral table-function escape hatch,
pinned byte-identical to the built-in (sequence+slice) chunking path so
the JVM fast path can always substitute for it."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunk_udtf_matches_builtin_path(spark):
    from delta_lake_spark.functions.udtf_ops import register_chunk_udtf
    from delta_lake_spark.queries.text import _CHUNK_S, _CHUNK_W, _chunk_frame

    register_chunk_udtf(spark)
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 60")
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.start_tok, c.n_tok,
               md5(c.chunk) AS fp
        FROM udtf_docs d,
             LATERAL chunk_document(d.text, {_CHUNK_W}, {_CHUNK_S}) c
        """
    )
    want = _chunk_frame(spark, SF_SMOKE).join(
        docs.select("doc_id"), "doc_id"
    ).select("doc_id", "chunk_idx", "start_tok", "n_tok", "fp")
    assert rows(got) == rows(want)
    assert got.count() > 60  # multi-chunk docs actually expanded


def test_chunk_udtf_null_and_empty_inputs(spark):
    from delta_lake_spark.functions.udtf_ops import register_chunk_udtf

    register_chunk_udtf(spark)
    spark.createDataFrame(
        [(1, None), (2, ""), (3, "...")], ["doc_id", "text"]
    ).createOrReplaceTempView("udtf_edge")
    out = spark.sql(
        "SELECT d.doc_id, c.* FROM udtf_edge d, "
        "LATERAL chunk_document(d.text, 4, 2) c"
    )
    assert out.count() == 0  # null / empty / punctuation-only: no chunks
