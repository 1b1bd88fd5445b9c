"""Vector-index bench section: the maintained partitioned ANN index
(ops/vector_index.py) vs the brute-force exact scan, on the sf corpus.

Reported: one-time build cost, warm query latency at nprobe=1 and nprobe=5
for a 50-query batch, the brute-force latency for the same batch, and
measured recall@10 vs the exact result — the standard serving trade
(index cost + approximate probes vs full scans)."""

from __future__ import annotations

import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_vector_index(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.similarity import cosine_topk
    from delta_lake_spark.ops.vector_index import VectorIndex

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)

    shutil.rmtree(workdir, ignore_errors=True)
    ix = VectorIndex(spark, workdir)
    t0 = time.perf_counter()
    ix.build(emb)
    build_s = round(time.perf_counter() - t0, 3)

    out: dict = {"n_vectors": emb.count(), "n_queries": 50, "build_sec": build_s}

    exact = (
        cosine_topk(
            queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
            emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec")),
            k=10,
        )
        .select("qid", "vid")
    )
    t0 = time.perf_counter()
    n_exact = exact.count()
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    exact.count()
    out["brute_force_sec"] = round(min(first, time.perf_counter() - t0), 3)

    exact_pairs = {(r.qid, r.vid) for r in exact.collect()}
    for nprobe in (1, 5, 16):  # 16 = every bucket = exact through the index
        res = ix.query(queries, k=10, nprobe=nprobe)
        t0 = time.perf_counter()
        res.count()
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res.count()
        out[f"nprobe{nprobe}_sec"] = round(min(first, time.perf_counter() - t0), 3)
        hits = sum(
            1 for r in res.select("qid", "vid").collect() if (r.qid, r.vid) in exact_pairs
        )
        out[f"nprobe{nprobe}_recall_at_10"] = round(hits / max(n_exact, 1), 4)
    return out
