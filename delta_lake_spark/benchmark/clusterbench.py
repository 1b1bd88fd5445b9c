"""Incremental-clustering maintenance bench: measures the claim that
``set_clustering`` turns OPTIMIZE into an O(new data) pass.

Scenario (the steady-state maintenance loop of a clustered 100-TB fact
table, scaled down): build a clustered table, land a 5% append, then
compare the cost of the incremental pass (rewrites only the append) with
a forced full re-cluster (rewrites everything) — and show data skipping
holds after the incremental pass.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.tables.managed import ManagedTable

_CLUSTER_COLS = ["l_partkey", "l_suppkey"]


def run_cluster_bench(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> dict[str, Any]:
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir, exist_ok=True)
    li = table(spark, sf_dir, "lineitem")
    n_rows = li.count()

    t = ManagedTable(spark, os.path.join(work_dir, "lineitem"))
    t.write(li.repartition(16))
    t.set_clustering(_CLUSTER_COLS)

    t0 = time.perf_counter()
    t.optimize(target_file_bytes=1024 * 1024)
    initial_full_s = time.perf_counter() - t0
    initial_files = len(t._entry()["files"])

    # 5% append with offset keys (new orders landing)
    delta = (
        li.sample(0.05, seed=7)
        .withColumn("l_orderkey", F.col("l_orderkey") + 100_000_000)
        .repartition(4)
    )
    append_rows = delta.count()
    t.write(delta, mode="append")

    t0 = time.perf_counter()
    t.optimize(target_file_bytes=1024 * 1024)
    incremental_s = time.perf_counter() - t0
    inc_hist = t.history()[0]  # latest first
    inc_rewritten = int(inc_hist.get("added_files") or 0)

    surviving, total = t.pruned_file_count([("l_partkey", "=", 1)])

    t0 = time.perf_counter()
    t.optimize(target_file_bytes=1024 * 1024, full=True)
    full_s = time.perf_counter() - t0
    full_hist = t.history()[0]
    full_rewritten = int(full_hist.get("added_files") or 0)

    return {
        "rows": n_rows,
        "cluster_by": _CLUSTER_COLS,
        "initial_full_s": round(initial_full_s, 3),
        "initial_files": initial_files,
        "append_rows": append_rows,
        "incremental_s": round(incremental_s, 3),
        "incremental_files_rewritten": inc_rewritten,
        "full_recluster_s": round(full_s, 3),
        "full_files_rewritten": full_rewritten,
        "prune_partkey_eq": f"{surviving}/{total}",
        "speedup_incremental_vs_full": round(full_s / max(incremental_s, 1e-9), 2),
    }
