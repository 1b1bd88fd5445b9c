"""ANALYZE statistics + the stats-driven planning/maintenance advisors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_spark.ops.advisor import join_advisor, maintenance_report
from delta_lake_spark.tables.managed import ManagedTable


def _mk(spark, path, df, **kw) -> ManagedTable:
    t = ManagedTable(spark, str(path))
    t.write(df, **kw)
    return t


# --------------------------------------------------------------------- #
# analyze() / statistics()
# --------------------------------------------------------------------- #


def test_analyze_collects_exact_stats(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "a", 2.5), (4, None, 0.5)],
        "k long, s string, v double",
    )
    t = _mk(spark, tmp_path / "t", df)
    assert t.statistics() is None
    v = t.analyze()
    s = t.statistics()
    assert s["as_of_version"] == v - 1  # stats describe the pre-commit snapshot
    assert s["n_rows"] == 4
    assert s["commits_since_analyze"] == 1
    cols = s["columns"]
    assert cols["k"]["n_distinct"] == 4 and cols["k"]["n_nulls"] == 0
    assert cols["s"]["n_distinct"] == 2 and cols["s"]["n_nulls"] == 1
    assert cols["v"]["n_nulls"] == 1
    assert cols["k"]["min"] == 1.0 and cols["k"]["max"] == 4.0
    assert cols["s"]["min"] == "a" and cols["s"]["max"] == "b"


def test_analyze_stats_carry_and_staleness(spark, tmp_path):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    t = _mk(spark, tmp_path / "t", df)
    t.analyze()
    n0 = t.statistics()["n_rows"]
    # stats survive later commits, with staleness counted
    t.write(spark.range(10, 15).withColumn("v", F.col("id")), mode="append")
    s = t.statistics()
    assert s["n_rows"] == n0  # still the analyzed snapshot's count
    assert s["commits_since_analyze"] == 2
    # re-analyze refreshes
    t.analyze()
    assert t.statistics()["n_rows"] == 15
    # versioned reads see the stats known AT that version
    assert t.statistics(version=1)["n_rows"] == n0


def test_analyze_counts_live_rows_after_mor_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", spark.range(100).withColumn("v", F.lit(1)))
    t.delete_where([("id", "<", 40)], mode="merge_on_read")
    t.analyze()
    assert t.statistics()["n_rows"] == 60  # DV-masked rows excluded


def test_analyze_commit_is_invisible_to_change_feed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", spark.range(5).withColumn("v", F.lit(1)))
    t.enable_cdf()
    v0 = t.latest_version()
    t.analyze()
    assert t.change_feed(from_version=v0).count() == 0


# --------------------------------------------------------------------- #
# join_advisor
# --------------------------------------------------------------------- #


def test_join_advisor_requires_stats(spark, tmp_path):
    a = _mk(spark, tmp_path / "a", spark.range(10).withColumn("k", F.col("id")))
    b = _mk(spark, tmp_path / "b", spark.range(10).withColumn("k", F.col("id")))
    with pytest.raises(ValueError, match="no statistics"):
        join_advisor(a, b, on=["k"])


def test_join_advisor_broadcasts_small_side(spark, tmp_path):
    big = _mk(
        spark,
        tmp_path / "big",
        spark.range(50_000).withColumn("k", F.col("id") % 100),
    )
    dim = _mk(spark, tmp_path / "dim", spark.range(100).withColumn("k", F.col("id")))
    big.analyze()
    dim.analyze()
    rec = join_advisor(big, dim, on=["k"])
    assert rec["strategy"] == "broadcast"
    assert rec["build_side"] == "right"
    assert rec["estimates"]["left"]["rows"] == 50_000


def test_join_advisor_flags_skewed_key_then_sort_merge(spark, tmp_path):
    # rows/NDV = 50_000/5 — way past any sane per-key average
    skewed = _mk(
        spark,
        tmp_path / "sk",
        spark.range(50_000).withColumn("k", F.col("id") % 5),
    )
    other = _mk(
        spark,
        tmp_path / "ot",
        spark.range(20_000).withColumn("k", F.col("id") % 5),
    )
    skewed.analyze()
    other.analyze()
    rec = join_advisor(skewed, other, on=["k"], broadcast_threshold_bytes=1)
    assert rec["strategy"] == "salted"
    # an even key (NDV == rows) with broadcasting disabled → sort-merge
    rec2 = join_advisor(skewed, other, on=["k"], broadcast_threshold_bytes=1,
                        hot_rows_per_key=1e12)
    assert rec2["strategy"] == "sort_merge"
    assert rec2["suggested_shuffle_partitions"] >= 32


def test_join_advisor_warns_on_stale_stats(spark, tmp_path):
    a = _mk(spark, tmp_path / "a", spark.range(10).withColumn("k", F.col("id")))
    b = _mk(spark, tmp_path / "b", spark.range(10).withColumn("k", F.col("id")))
    a.analyze()
    b.analyze()
    for i in range(12):
        a.write(
            spark.range(i, i + 1).withColumn("k", F.col("id")), mode="append"
        )
    rec = join_advisor(a, b, on=["k"])
    assert any("commits old" in w for w in rec["warnings"])


# --------------------------------------------------------------------- #
# maintenance_report
# --------------------------------------------------------------------- #


def test_maintenance_report_flags_small_files_scoped(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    df = spark.range(100).withColumn("p", (F.col("id") % 2).cast("string"))
    t.write(df.repartition(6), partition_by=["p"])
    rep = maintenance_report(t)
    assert rep["num_small_files"] == rep["num_files"] > 2
    opts = [r for r in rep["recommendations"] if r["action"] == "optimize"]
    assert len(opts) == 2  # one scoped recommendation per partition
    assert all(r["where"] is not None for r in opts)
    # the scoped recommendation is directly actionable
    t.optimize(where=opts[0]["where"])
    assert maintenance_report(t)["num_small_files"] < rep["num_small_files"]


def test_maintenance_report_flags_dv_debt_and_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", spark.range(1000).withColumn("v", F.lit(1)))
    t.analyze()
    t.delete_where([("id", "<", 500)], mode="merge_on_read")
    rep = maintenance_report(t)
    actions = {r["action"] for r in rep["recommendations"]}
    assert "purge_deletes" in actions
    assert rep["dv_rows"] == 500
    # materializing then overwriting strands old files → vacuum shows up
    t.purge_deletes()
    t.write(spark.range(5).withColumn("v", F.lit(2)), mode="overwrite")
    rep2 = maintenance_report(t)
    assert rep2["unreferenced_files"] > 0
    assert "vacuum" in {r["action"] for r in rep2["recommendations"]}


def test_maintenance_report_clean_table_is_quiet(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", spark.range(1000).withColumn("v", F.lit(1)))
    t.optimize()
    t.vacuum()
    t.analyze()
    rep = maintenance_report(t)
    assert [r for r in rep["recommendations"] if r["action"] != "optimize"] == []


def test_apply_maintenance_executes_report(spark, tmp_path):
    from delta_lake_spark.ops.advisor import apply_maintenance

    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(spark.range(2000).withColumn("v", F.lit(1)).repartition(8))
    t.delete_where([("id", "<", 1000)], mode="merge_on_read")
    rep = maintenance_report(t)
    planned = {r["action"] for r in rep["recommendations"]}
    assert {"optimize", "analyze"} <= planned
    done = apply_maintenance(t, rep, vacuum_retain_hours=0.0)
    assert {d["action"] for d in done} == planned
    # after the pass: compacted, DVs materialized, stats fresh
    rep2 = maintenance_report(t)
    after = {r["action"] for r in rep2["recommendations"]}
    assert "purge_deletes" not in after and "analyze" not in after
    assert t.read().count() == 1000
    assert t.statistics()["n_rows"] == 1000
