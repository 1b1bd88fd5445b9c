"""Deletion-vector benchmark: merge-on-read vs copy-on-write DELETE on a
lineitem-backed managed table.

What the numbers mean at 100 TB: a selective delete under copy-on-write
rewrites every file containing a hit (write cost ~ table bytes touched);
under merge-on-read it writes a position-list sidecar (write cost ~ hit
rows).  The read-path rent is the DV anti-join until purge_deletes
materializes.  Results are checksum-verified identical between the modes.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_dv_bench(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> dict[str, Any]:
    from delta_lake_spark.catalog import table
    from delta_lake_spark.tables import ManagedTable

    out: dict[str, Any] = {}
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate",
    )
    # the deletes target one supplier (~1/10000 of rows): selective enough
    # that copy-on-write's rewrite amplification is visible
    pred = [("l_suppkey", "=", 17)]

    def fresh(name: str) -> ManagedTable:
        path = os.path.join(work_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        t = ManagedTable(spark, path)
        t.write(li.repartition(16), mode="overwrite")
        return t

    def commit_bytes_written(t: "ManagedTable") -> int:
        """Bytes of NEW files (data + DV sidecars) landed by the last
        commit — the write-amplification number that matters at scale.
        A merge-on-read commit's ``add`` list includes carried-over file
        records whose only change is an attached DV reference; those wrote
        no bytes, so count only paths absent from the previous snapshot."""
        v = t.latest_version()
        raw = t._raw_entry(v)
        prev = {f["path"] for f in t._entry(v - 1)["files"]} if v else set()
        added = sum(
            f["size"] for f in raw.get("add", ()) if f["path"] not in prev
        )
        for dv in raw.get("dv_added", ()):
            added += os.path.getsize(os.path.join(t.path, dv))
        return added

    def warm_read_s(t: "ManagedTable") -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            t.read().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    cow = fresh("cow")
    t0 = time.perf_counter()
    cow.delete_where(pred)
    out["cow_delete_s"] = round(time.perf_counter() - t0, 3)
    out["cow_bytes_written"] = commit_bytes_written(cow)
    out["cow_read_s"] = warm_read_s(cow)
    cow_rows = cow.read().count()
    cow_sum = cow.read().agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    ).first()[0]

    mor = fresh("mor")
    t0 = time.perf_counter()
    mor.delete_where(pred, mode="merge_on_read")
    out["mor_delete_s"] = round(time.perf_counter() - t0, 3)
    out["mor_bytes_written"] = commit_bytes_written(mor)
    out["write_amplification_cow_vs_mor"] = round(
        out["cow_bytes_written"] / max(1, out["mor_bytes_written"]), 1
    )
    out["mor_read_s"] = warm_read_s(mor)
    mor_rows = mor.read().count()
    mor_sum = mor.read().agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    ).first()[0]
    out["deleted_rows"] = mor.detail()["num_deleted_rows"]
    t0 = time.perf_counter()
    mor.purge_deletes()
    out["purge_s"] = round(time.perf_counter() - t0, 3)
    out["post_purge_read_s"] = warm_read_s(mor)
    purged_rows = mor.read().count()

    out["results_identical"] = bool(
        cow_rows == mor_rows == purged_rows and cow_sum == mor_sum
    )
    out["rows_after_delete"] = cow_rows
    for name in ("cow", "mor"):
        shutil.rmtree(os.path.join(work_dir, name), ignore_errors=True)
    return out
