"""Auto-compaction + optimized writes (delta.autoOptimize analog): the
small-file answer for micro-append/streaming ingest."""

from __future__ import annotations

import pytest

from delta_lake_spark.tables.managed import ManagedTable


def _files_in(mt, pval):
    return [
        f for f in mt._entry()["files"]
        if (f.get("partition") or {}).get("p") == pval
    ]


def test_auto_compact_scoped_to_crossing_partitions(spark, tmp_path):
    mt = ManagedTable(spark, str(tmp_path / "t"))
    mt.write(spark.createDataFrame([(1, "a")], "k long, p string"), partition_by=["p"])
    mt.set_auto_compact(min_files=4, min_file_bytes=10 * 1024 * 1024)
    for i in range(2, 8):
        mt.write(
            spark.createDataFrame([(i, "a"), (i, "b")], "k long, p string"),
            mode="append",
        )
    # p=a crossed the threshold (7 small files) and was compacted in place;
    # p=b stayed under it and was NOT rewritten
    assert len(_files_in(mt, "a")) == 1
    assert 2 <= len(_files_in(mt, "b")) <= 3
    assert mt.read().count() == 13
    ops = [h["operation"] for h in mt.history()]
    assert "optimize" in ops
    # content identical to an uncompacted twin
    twin = ManagedTable(spark, str(tmp_path / "u"))
    twin.write(spark.createDataFrame([(1, "a")], "k long, p string"), partition_by=["p"])
    for i in range(2, 8):
        twin.write(
            spark.createDataFrame([(i, "a"), (i, "b")], "k long, p string"),
            mode="append",
        )
    assert sorted(map(tuple, mt.read().collect())) == sorted(
        map(tuple, twin.read().collect())
    )


def test_auto_compact_off_by_default_and_disableable(spark, tmp_path):
    mt = ManagedTable(spark, str(tmp_path / "t"))
    mt.write(spark.createDataFrame([(1,)], "k long"))
    for i in range(2, 8):
        mt.write(spark.createDataFrame([(i,)], "k long"), mode="append")
    ops = [h["operation"] for h in mt.history()]
    assert "optimize" not in ops  # no property, no compaction
    n_before = len(mt._entry()["files"])
    mt.set_auto_compact(min_files=4, min_file_bytes=10 * 1024 * 1024)
    mt.set_auto_compact(enabled=False)
    mt.write(spark.createDataFrame([(8,)], "k long"), mode="append")
    assert len(mt._entry()["files"]) > n_before  # disabled again: no rewrite
    assert "optimize" not in [h["operation"] for h in mt.history()]
    with pytest.raises(ValueError, match="min_files"):
        mt.set_auto_compact(min_files=1)


def test_auto_compact_unpartitioned_table(spark, tmp_path):
    mt = ManagedTable(spark, str(tmp_path / "t"))
    mt.write(spark.createDataFrame([(1,)], "k long"))
    mt.set_auto_compact(min_files=4, min_file_bytes=10 * 1024 * 1024)
    for i in range(2, 6):
        mt.write(spark.createDataFrame([(i,)], "k long"), mode="append")
    # compaction fired mid-loop and keeps the file count bounded below the
    # threshold + the appends since
    assert "optimize" in [h["operation"] for h in mt.history()]
    assert len(mt._entry()["files"]) < 4
    assert sorted(r.k for r in mt.read().collect()) == [1, 2, 3, 4, 5]


def test_optimize_write_one_file_per_partition(spark, tmp_path):
    df = spark.range(1000).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    ).repartition(32)
    mt = ManagedTable(spark, str(tmp_path / "t"))
    mt.write(df, partition_by=["p"], optimize_write=True)
    assert len(mt._entry()["files"]) == 3  # one per partition value, not 96
    assert mt.read().count() == 1000
    # as a sticky table property
    mt.set_optimize_write(True)
    mt.write(df, mode="append")
    assert len(mt._entry()["files"]) == 6
    assert mt.read().count() == 2000
