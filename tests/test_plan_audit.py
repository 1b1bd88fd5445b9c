"""Plan-lint (ops.plan_audit) and distributed ranking (ops.ranking).

The sweep test at the bottom is the repo's scale gate in test form: every
registered query's static plan must be free of high-severity scale smells
(cartesian products, row-at-a-time Python UDFs, single-partition funnels),
with a small documented allowlist for calendar-bounded window inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_spark.catalog import table
from delta_lake_spark.ops.plan_audit import assert_scalable, audit, scan_report
from delta_lake_spark.ops.ranking import global_ntile, global_row_number
from delta_lake_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def codes(df, severity=None):
    return {
        f.code
        for f in audit(df)
        if severity is None or f.severity == severity
    }


# --- detectors -------------------------------------------------------------


def test_detects_cartesian(spark):
    # disable auto-broadcast: at smoke scale Spark would otherwise plan the
    # cross join as a BroadcastNestedLoopJoin (the medium-severity cousin)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = table(spark, SF_SMOKE, "orders")
        b = table(spark, SF_SMOKE, "customer")
        assert "cartesian" in codes(a.crossJoin(b), "high")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_detects_row_udf(spark):
    shout = F.udf(lambda s: s.upper())
    df = table(spark, SF_SMOKE, "customer").select(shout("c_name"))
    assert "row_udf" in codes(df, "high")


def test_detects_global_window_funnel(spark):
    w = Window.orderBy("o_orderkey")
    df = table(spark, SF_SMOKE, "orders").select(
        F.row_number().over(w).alias("rn")
    )
    assert "global_funnel" in codes(df, "high")


def test_partitioned_window_not_flagged(spark):
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    df = table(spark, SF_SMOKE, "orders").select(
        F.row_number().over(w).alias("rn")
    )
    assert "global_funnel" not in codes(df)


def test_global_scalar_agg_not_flagged(spark):
    # partial aggregation reduces each partition to one row BEFORE the
    # single-partition exchange — benign, must not be flagged
    df = table(spark, SF_SMOKE, "orders").agg(F.sum("o_totalprice"))
    assert "global_funnel" not in codes(df)


def test_sort_aggregate_final_agg_not_flagged(spark):
    # typed min/max over a struct forces Spark's SortAggregate fallback for
    # the keyless final aggregate — still the benign sees-only-partials
    # shape, must not be mistaken for a Sort funnel
    df = (
        table(spark, SF_SMOKE, "orders")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("first"))
    )
    plan_df = df
    assert "global_funnel" not in codes(plan_df)


def test_topk_not_flagged(spark):
    df = (
        table(spark, SF_SMOKE, "orders")
        .orderBy(F.desc("o_totalprice"))
        .limit(5)
    )
    assert "global_funnel" not in codes(df)


def test_assert_scalable_raises_and_allows(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = table(spark, SF_SMOKE, "orders")
        bad = a.crossJoin(table(spark, SF_SMOKE, "customer"))
        with pytest.raises(AssertionError, match="cartesian"):
            assert_scalable(bad)
        findings = assert_scalable(bad, allow=("cartesian",))
        assert any(f.code == "cartesian" for f in findings)  # still reported
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_scan_report_shows_pushdown_and_pruning(spark):
    df = (
        table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_totalprice") > 1000)
        .select("o_orderkey")
    )
    (scan,) = scan_report(df)
    assert any("o_totalprice" in p for p in scan["pushed"])
    assert "o_orderkey" in scan["columns"]
    assert "o_orderdate" not in scan["columns"]


# --- distributed ranking ---------------------------------------------------


def test_global_row_number_matches_window(spark):
    c = table(spark, SF_SMOKE, "customer")
    got = global_row_number(
        c, ["c_acctbal", "c_custkey"], out_col="rn", num_partitions=7
    )
    w = Window.orderBy("c_acctbal", "c_custkey")
    want = c.select("c_custkey", F.row_number().over(w).alias("rn"))
    assert (
        got.select("c_custkey", "rn")
        .exceptAll(want)
        .union(want.exceptAll(got.select("c_custkey", "rn")))
        .count()
        == 0
    )


@pytest.mark.parametrize("n", [3, 4, 7])
def test_global_ntile_matches_window(spark, n):
    # includes N % n != 0 cases; ntile's uneven-bucket rule must match
    c = table(spark, SF_SMOKE, "customer").limit(97)
    got = global_ntile(
        c, n, ["c_acctbal", "c_custkey"], out_col="b", num_partitions=5
    )
    w = Window.orderBy("c_acctbal", "c_custkey")
    want = c.select("c_custkey", F.ntile(n).over(w).alias("b"))
    assert (
        got.select("c_custkey", "b")
        .exceptAll(want)
        .union(want.exceptAll(got.select("c_custkey", "b")))
        .count()
        == 0
    )


def test_global_ntile_fewer_rows_than_buckets(spark):
    c = table(spark, SF_SMOKE, "customer").limit(3)
    got = global_ntile(c, 5, ["c_custkey"], out_col="b")
    assert sorted(r["b"] for r in got.collect()) == [1, 2, 3]


def test_global_ranking_plan_has_no_funnel(spark):
    c = table(spark, SF_SMOKE, "customer")
    df = global_row_number(c, ["c_acctbal", "c_custkey"])
    assert "global_funnel" not in codes(df)


# --- registry-wide scale lint ----------------------------------------------

# Documented exceptions: these windows run over DATE-level frames (one row
# per calendar day after aggregation / spine generation) — bounded by the
# calendar, not by SF, so the single-partition window is metadata-sized.
ALLOW: dict[str, tuple[str, ...]] = {
    "q10_rate_changes": ("global_funnel",),
    "q19_asof_event_rates": ("global_funnel",),
    "q64_linear_interpolation": ("global_funnel",),
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_plans_pass_scale_lint(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_scalable(df, allow=ALLOW.get(name, ()))
