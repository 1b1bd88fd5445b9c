"""Incremental-dedup-index bench: per-batch ingest cost vs one-shot rerun.

The claim the index exists for (ops/dedup_index.py): admitting batch N
costs O(batch + bucket-matched candidates), while the one-shot d09 rerun
costs O(corpus so far) — so per-batch times stay roughly flat as the corpus
grows and the one-shot alternative grows linearly.  Results are verified:
the union of batch survivors must equal the one-shot survivor set.
"""

from __future__ import annotations

import shutil
import time

from pyspark.sql import SparkSession


def run_dedup_index_bench(
    spark: SparkSession, sf_dir: str, work_dir: str, n_batches: int = 4
) -> dict:
    from pyspark.sql import functions as F

    from delta_lake_spark.catalog import table
    from delta_lake_spark.ops.dedup_index import IncrementalDedupIndex
    from delta_lake_spark.queries import QUERIES

    shutil.rmtree(work_dir, ignore_errors=True)
    docs = table(spark, sf_dir, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    step = (hi + n_batches - 1) // n_batches

    idx = IncrementalDedupIndex(spark, f"{work_dir}/idx")
    batch_secs: list[float] = []
    got: set[int] = set()
    for i in range(n_batches):
        b = docs.filter(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        t0 = time.perf_counter()
        got |= {r.doc_id for r in idx.add_batch(b, "doc_id", "text").collect()}
        batch_secs.append(round(time.perf_counter() - t0, 3))

    # the comparison shape: per-batch ingest stays ~flat as the corpus
    # grows, the one-shot rerun over each PREFIX grows with corpus size.
    # At this toy scale the index's fixed per-batch overhead (several jobs
    # + two table commits, ~5-8 s) still exceeds a full rerun — the claim
    # is the slope, not the intercept: batch cost is O(batch), rerun cost
    # is O(corpus so far).
    from delta_lake_spark.functions.dedup import near_dedup

    prefix_secs: list[float] = []
    for i in range(1, n_batches + 1):
        prefix = docs.filter(F.col("doc_id") < i * step).repartition(32, "doc_id")
        t0 = time.perf_counter()
        near_dedup(
            prefix.filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 3),
            "doc_id",
            "text",
            min_jaccard_bp=8000,
        ).count()
        prefix_secs.append(round(time.perf_counter() - t0, 3))

    t0 = time.perf_counter()
    want = {
        r.doc_id for r in QUERIES["d09_near_dedup_survivors"](spark, sf_dir).collect()
    }
    oneshot = round(time.perf_counter() - t0, 3)
    return {
        "batch_secs": batch_secs,
        "batches_total": round(sum(batch_secs), 3),
        "oneshot_prefix_secs": prefix_secs,
        "oneshot_full_corpus": oneshot,
        "survivors": len(got),
        "matches_oneshot": got == want,
    }
