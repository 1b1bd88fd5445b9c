"""Bench: incremental materialized-view maintenance — flat vs linear.

Evidence for the O(changed rows) claim (tables/matview.py,
tables/sketchview.py).  At bench scale a full re-aggregate of a 150K-row
base is sub-second, so raw wall-clock can't show the win; what CAN be
shown honestly is the SHAPE: the full rebuild cost grows linearly with
the base (measured at two SFs), while the incremental refresh cost is
flat — it reads only the appended delta plus fixed MERGE/commit latency.
At 100 TB the linear term is hours and the flat term is unchanged; the
crossover is wherever a full re-aggregate costs more than ~a few seconds.

Both views are result-verified: exact rows for the sum view; for the
sketch view the count column is exact and the NDV estimate is checked
within the HLL error bound (a DataSketches union legitimately estimates
via the composite estimator while a direct single-pass sketch uses HIP —
register state is identical, the estimators differ within the configured
RSE, so byte-equality is the wrong check beyond exact mode).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.tables import (
    IncrementalAggView,
    IncrementalSketchView,
    ManagedTable,
)


def _one_sf(spark: SparkSession, sf_dir: str, work_dir: str) -> dict[str, Any]:
    shutil.rmtree(work_dir, ignore_errors=True)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    base = ManagedTable(spark, f"{work_dir}/base")
    base.write(orders)
    n_rows = base.read().count()

    agg_view = IncrementalAggView(
        spark, base, f"{work_dir}/agg", keys=["o_custkey"],
        sums={"total": "o_totalprice"},
    )
    agg_view.refresh()

    sk_view = IncrementalSketchView(
        spark, base, f"{work_dir}/sk", keys=["o_orderpriority"],
        ndv={"cust_ndv": "o_custkey"},
    )
    sk_view.refresh()

    # ~1% append with fresh order keys (some customers overlap, some new)
    delta_n = max(n_rows // 100, 100)
    max_key = base.read().agg(F.max("o_orderkey")).first()[0]
    delta = spark.range(delta_n).select(
        (F.col("id") + max_key + 1).alias("o_orderkey"),
        (F.col("id") % 5000 + 1).alias("o_custkey"),
        F.lit("1-URGENT").alias("o_orderpriority"),
        (F.col("id") % 997 + 1.0).alias("o_totalprice"),
    )
    base.write(delta, mode="append")

    t0 = time.perf_counter()
    st = agg_view.refresh()
    inc_refresh_s = round(time.perf_counter() - t0, 3)
    assert st["mode"] == "incremental"

    t0 = time.perf_counter()
    st = sk_view.refresh()
    sk_inc_refresh_s = round(time.perf_counter() - t0, 3)
    assert st["mode"] == "incremental"

    # full-rebuild comparison: re-aggregate the whole (grown) base
    t0 = time.perf_counter()
    rebuilt = (
        base.read()
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("total"),
        )
    )
    rebuilt_rows = sorted(tuple(r) for r in rebuilt.collect())
    full_rebuild_s = round(time.perf_counter() - t0, 3)
    view_rows = sorted(
        tuple(r) for r in agg_view.read().select("o_custkey", "n", "total").collect()
    )

    sk_expected = {
        r["o_orderpriority"]: (r["n"], r["cust_ndv"])
        for r in base.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("cust_ndv"),
        )
        .collect()
    }
    sk_ok = True
    for r in sk_view.read().select("o_orderpriority", "n", "cust_ndv").collect():
        want_n, want_ndv = sk_expected[r["o_orderpriority"]]
        if r["n"] != want_n:
            sk_ok = False
        # HLL default lgK=12 -> ~1.6% RSE; 5% covers estimator divergence
        if abs(r["cust_ndv"] - want_ndv) > max(0.05 * want_ndv, 2):
            sk_ok = False

    return {
        "base_rows": n_rows,
        "delta_rows": delta_n,
        "agg_incremental_refresh_s": inc_refresh_s,
        "agg_full_rebuild_s": full_rebuild_s,
        "agg_results_match": view_rows == rebuilt_rows,
        "sketch_incremental_refresh_s": sk_inc_refresh_s,
        "sketch_results_within_bounds": sk_ok,
    }


def run_incview_bench(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> dict[str, Any]:
    """Two-SF shape measurement: full-rebuild cost grows with the base,
    incremental refresh cost stays flat (O(delta) + fixed commit latency)."""
    out: dict[str, Any] = {}
    small = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    sfs = ([("small", small)] if os.path.isdir(small) else []) + [("bench", sf_dir)]
    for tag, d in sfs:
        out[tag] = _one_sf(spark, d, os.path.join(work_dir, tag))
    if "small" in out:
        out["full_rebuild_growth"] = round(
            out["bench"]["agg_full_rebuild_s"]
            / max(out["small"]["agg_full_rebuild_s"], 1e-9),
            2,
        )
        out["incremental_growth"] = round(
            out["bench"]["agg_incremental_refresh_s"]
            / max(out["small"]["agg_incremental_refresh_s"], 1e-9),
            2,
        )
        out["crossover_estimate"] = _crossover(out)
        est = out["crossover_estimate"].get("crossover_base_rows_estimate")
        if est and os.environ.get("SPARK_GRAFT_INCVIEW_XOVER", "1") != "0":
            try:
                out["crossover_measured"] = _measure_at_crossover(
                    spark, sf_dir, os.path.join(work_dir, "xover"), est
                )
            except Exception as exc:  # keep the payload alive
                out["crossover_measured"] = {
                    "error": f"{type(exc).__name__}: {exc}"
                }
    return out


def _measure_at_crossover(
    spark: SparkSession, sf_dir: str, work_dir: str, est_rows: int
) -> dict[str, Any]:
    """Turn the two-point extrapolation into a data point (VERDICT r7
    task 6): build a base of ~est_rows by replicating the bench orders
    with shifted order keys (same customer-key domain — a growing fact
    over a stable dim, which is the realistic shape), then time one
    incremental refresh vs one full rebuild at that size.  If the fitted
    crossover is right, the two times land within ~±30% of each other.
    The replication factor is capped at 100 copies of the bench orders to
    bound bench wall-clock; when the cap binds, the payload carries
    ``capped_below_crossover: true`` — the ±30% expectation only holds at
    the actual fitted estimate, not at a capped build (ADVICE r8).
    """
    shutil.rmtree(work_dir, ignore_errors=True)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    bench_rows = orders.count()
    copies = max(2, min(round(est_rows / bench_rows), 100))
    capped = copies < round(est_rows / bench_rows)
    rep = orders.select(
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("_c"),
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
    ).select(
        (F.col("o_orderkey") * copies + F.col("_c")).alias("o_orderkey"),
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
    )
    base = ManagedTable(spark, f"{work_dir}/base")
    base.write(rep)
    n_rows = base.read().count()

    agg_view = IncrementalAggView(
        spark, base, f"{work_dir}/agg", keys=["o_custkey"],
        sums={"total": "o_totalprice"},
    )
    agg_view.refresh()

    delta_n = max(n_rows // 100, 100)
    max_key = base.read().agg(F.max("o_orderkey")).first()[0]
    delta = spark.range(delta_n).select(
        (F.col("id") + max_key + 1).alias("o_orderkey"),
        (F.col("id") % 5000 + 1).alias("o_custkey"),
        F.lit("1-URGENT").alias("o_orderpriority"),
        (F.col("id") % 997 + 1.0).alias("o_totalprice"),
    )
    base.write(delta, mode="append")

    t0 = time.perf_counter()
    st = agg_view.refresh()
    inc_s = round(time.perf_counter() - t0, 3)
    assert st["mode"] == "incremental"

    t0 = time.perf_counter()
    (
        base.read()
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("total"),
        )
        .write.mode("overwrite")
        .parquet(f"{work_dir}/rebuild")
    )
    full_s = round(time.perf_counter() - t0, 3)
    shutil.rmtree(work_dir, ignore_errors=True)
    return {
        "target_rows": est_rows,
        "measured_base_rows": n_rows,
        "copies_of_bench_orders": copies,
        "capped_below_crossover": capped,
        "agg_incremental_refresh_s": inc_s,
        "agg_full_rebuild_s": full_s,
        "incremental_over_full_ratio": round(inc_s / max(full_s, 1e-9), 2),
        "note": (
            "full rebuild timed as write-to-parquet (what a real rebuild "
            "does), incremental as the view's MERGE refresh; "
            + (
                "REPLICATION CAP BOUND: measured_base_rows is below the "
                "fitted crossover, so the ±30% expectation does not apply "
                "at this point"
                if capped
                else "at the fitted crossover the two should be within ~±30%"
            )
        ),
    }


def _crossover(out: dict[str, Any]) -> dict[str, Any]:
    """Where does incremental refresh start BEATING a full rebuild?

    At bench scale the incremental path loses (fixed MERGE/commit latency
    dominates a sub-second re-aggregate).  Fit each path's measured two-SF
    cost to a power law cost(n) = c * n^a — a = log(growth) / log(base
    ratio) — and solve incremental(n) == full(n) for n.  The exponents make
    the honest story explicit: the full rebuild grows much faster than the
    near-flat incremental refresh, so above the crossover base size the
    incremental path wins and keeps winning.  Extrapolation from two
    points, so it is an order-of-magnitude estimate, not a measurement.
    """
    import math

    small, bench = out["small"], out["bench"]
    base_ratio = bench["base_rows"] / max(small["base_rows"], 1)
    if base_ratio <= 1:
        # log(base_ratio) would be 0 (ZeroDivisionError) or negative
        # (nonsense exponents) — refuse the fit rather than crash the
        # whole bench payload build (ADVICE r7).
        return {
            "note": "measured SFs have non-increasing base_rows "
            f"(ratio {base_ratio:.3g}); power-law fit undefined"
        }
    a_full = math.log(max(out["full_rebuild_growth"], 1e-9)) / math.log(base_ratio)
    a_inc = math.log(max(out["incremental_growth"], 1e-9)) / math.log(base_ratio)
    cost_gap = bench["agg_incremental_refresh_s"] / max(
        bench["agg_full_rebuild_s"], 1e-9
    )
    if a_full <= a_inc:
        return {
            "note": "full rebuild not growing faster than incremental at "
            "these SFs; no crossover extrapolation possible"
        }
    mult = cost_gap ** (1.0 / (a_full - a_inc))
    return {
        "full_rebuild_exponent": round(a_full, 3),
        "incremental_exponent": round(a_inc, 3),
        "crossover_base_multiple_of_bench": round(mult, 1),
        "crossover_base_rows_estimate": int(mult * bench["base_rows"]),
        "note": "incremental refresh beats a full rebuild once the base "
        "exceeds ~the estimated row count; below it the fixed MERGE/commit "
        "latency dominates and a full rebuild is cheaper",
    }
