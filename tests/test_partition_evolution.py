"""Partition evolution: set_partitioning changes the spec for future
writes while old layouts keep reading and pruning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("country", F.when(F.col("id") % 2 == 0, "de").otherwise("fr"))
        .withColumn("day", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.col("id") * 10)
    )


def _has_partition(t, col):
    return [
        f["path"] for f in t._entry()["files"] if col in (f.get("partition") or {})
    ]


def test_evolve_unpartitioned_to_partitioned(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 100))
    t.set_partitioning(["country"])
    t.write(_df(spark, 100, 200), mode="append")
    # old files flat, new files Hive-partitioned
    assert _has_partition(t, "country")
    assert len(_has_partition(t, "country")) < len(t._entry()["files"])
    # reads union both layouts with full schema
    got = t.read()
    assert got.count() == 200
    assert got.filter(F.col("country") == "de").count() == 100
    # pruning works across layouts: new files by partition value,
    # old files by footer stats (country is low-cardinality, both present
    # in every old file, so only the partition side prunes)
    surviving, total = t.pruned_file_count([("country", "=", "de")])
    assert surviving < total


def test_evolve_changes_spec_for_rewrites_and_optimize(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 300), partition_by=["day"])
    t.set_partitioning(["country"])
    before = t.read().orderBy("id").collect()
    # OPTIMIZE migrates the whole table to the new layout in one pass
    # (default target: every small file is rewrite-eligible)
    t.optimize()
    files = t._entry()["files"]
    assert all("country" in (f.get("partition") or {}) for f in files)
    assert all("day" not in (f.get("partition") or {}) for f in files)
    assert t.read().orderBy("id").collect() == before


def test_evolution_guard_rails_and_append_check(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 10), partition_by=["day"])
    with pytest.raises(ValueError, match="not in table schema"):
        t.set_partitioning(["nope"])
    t.set_partitioning(["country"])
    # explicit old spec on append now conflicts with the evolved layout
    with pytest.raises(ValueError, match="partition_by"):
        t.write(_df(spark, 10, 20), mode="append", partition_by=["day"])
    # explicit new spec and implicit both fine
    t.write(_df(spark, 10, 20), mode="append", partition_by=["country"])
    t.write(_df(spark, 20, 30), mode="append")
    assert t.read().count() == 30
    # clearing returns to unpartitioned appends
    t.set_partitioning(None)
    t.write(_df(spark, 30, 40), mode="append")
    assert t.read().count() == 40


def test_merge_and_dml_adopt_new_spec(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 0, 100), partition_by=["day"])
    t.set_partitioning(["country"])
    src = _df(spark, 0, 5).withColumn("v", F.lit(-1))
    t.merge(src, ["id"])
    # merge-rewritten files landed under the NEW spec
    rewritten = [
        f
        for f in t._entry()["files"]
        if "country" in (f.get("partition") or {})
    ]
    assert rewritten
    assert t.read().filter(F.col("v") == -1).count() == 5
    assert t.read().count() == 100
