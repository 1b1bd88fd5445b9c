"""Arrow-vectorized pandas escape hatches (SURVEY.md §2.10).

The reference needs zero UDFs (deliberately — driver-side Faker only), and
so does this engine's core: every hot-path operator is built-in JVM
functions.  These are the sanctioned escape hatches for semantics built-ins
can't express, in preference order:

1. ``@pandas_udf`` scalar — vectorized column fn, Arrow batches, ~10-100x
   faster than row-at-a-time Python UDFs.
2. ``applyInPandas`` grouped — whole-group pandas computation (medium
   state, e.g. per-group model fits / centroid math).
3. ``mapInPandas`` partition stream — see functions/multimodal.py.

Scale notes: every variant ships Arrow record batches executor-side; bound
batch memory with spark.sql.execution.arrow.maxRecordsPerBatch.  Grouped
applyInPandas shuffles on the keys and materializes ONE GROUP AT A TIME in
pandas — keys must partition the data finely enough that a group fits in
executor memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@F.pandas_udf(LongType())
def bpe_ish_token_count(text: pd.Series) -> pd.Series:
    """Sub-word-ish token estimate: words + digit runs + punctuation marks
    counted separately (a cheap stand-in for a real BPE tokenizer's length,
    vectorized over Arrow batches)."""
    words = text.str.count(r"[A-Za-z]+")
    digits = text.str.count(r"[0-9]+")
    punct = text.str.count(r"[^\sA-Za-z0-9]")
    return (words + digits + punct).fillna(0).astype("int64")


CENTROID_SCHEMA = StructType(
    [
        StructField("label", LongType()),
        StructField("n", LongType()),
        StructField("centroid", ArrayType(DoubleType())),
        StructField("mean_dist", DoubleType()),
        StructField("max_dist", DoubleType()),
    ]
)


def label_centroids(embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid + dispersion via grouped ``applyInPandas``.

    Deterministic: rows are sorted by vec_id inside each group before the
    float reductions, so accumulation order is fixed regardless of
    partitioning.  (Cross-engine float parity is still not guaranteed —
    this op is exercised by differential tests against numpy, not the SQL
    oracle.)
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        mat = np.array(pdf[vec_col].to_list(), dtype="float64")
        centroid = mat.mean(axis=0)
        dists = np.linalg.norm(mat - centroid, axis=1)
        return pd.DataFrame(
            {
                "label": [int(pdf[label_col].iloc[0])],
                "n": [len(pdf)],
                "centroid": [centroid.tolist()],
                "mean_dist": [float(dists.mean())],
                "max_dist": [float(dists.max())],
            }
        )

    return embeddings.groupBy(label_col).applyInPandas(per_group, CENTROID_SCHEMA)


def misra_gries_candidates(tokens_df: DataFrame, col: str, m: int = 4096) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter CANDIDATES over an array
    column of tokens — phase 1 of the exact two-phase top-k (queries/text.py
    t21).

    Chunked mergeable-summaries variant (Agarwal et al., "Mergeable
    Summaries"): merge each Arrow batch's exact counts into the running
    summary; when it exceeds ``m`` counters, subtract the (size-m)-th
    smallest count from every counter and drop the non-positive ones.  Each
    trim removes equal mass from > m counters at once, so any item with
    true partition frequency > N_p/(m+1) survives with a positive counter —
    hence (summing over partitions) every item with GLOBAL frequency
    > N/(m+1) is emitted by at least one partition.  Phase 2 recounts
    candidates exactly, so the top-k is exact whenever the k-th true count
    clears that bound (loose by orders of magnitude for any realistic m).

    Scale shape: the full token stream is never shuffled — each partition
    streams through pandas once and emits <= m candidate words, so the
    downstream distinct/count shuffle is O(partitions x m) rows regardless
    of corpus vocabulary.
    """
    import collections

    out_schema = StructType([StructField("candidate", StringType())])

    def per_partition(batches):
        counters: collections.Counter = collections.Counter()
        for pdf in batches:
            batch = collections.Counter()
            for arr in pdf[col]:
                batch.update(arr)
            counters.update(batch)
            if len(counters) > m:
                # subtract the (len-m)-th smallest count from everything
                d = sorted(counters.values())[len(counters) - m - 1]
                counters = collections.Counter(
                    {w: c - d for w, c in counters.items() if c > d}
                )
        yield pd.DataFrame({"candidate": list(counters.keys())})

    return tokens_df.select(col).mapInPandas(per_partition, schema=out_schema)
