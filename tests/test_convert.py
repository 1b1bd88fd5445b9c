"""convert_from_parquet (CONVERT TO DELTA analog): in-place registration of
a plain parquet directory as a managed table, no data rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable


def test_convert_partitioned_directory_in_place(spark, tmp_path):
    path = str(tmp_path / "raw")
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    df.write.partitionBy("p").parquet(path)
    files_before = {
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(path)
        for n in ns
        if n.endswith(".parquet")
    }
    mt = ManagedTable.convert_from_parquet(
        spark, path, partition_schema={"p": "string"}
    )
    # no rewrite: the exact same files back the table
    files_after = {
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(path)
        for n in ns
        if n.endswith(".parquet") and "_log" not in dp
    }
    assert files_after == files_before
    # content + typed partition column round-trip
    got = mt.read()
    assert got.count() == 100
    assert dict(got.dtypes)["p"] == "string"
    # parquet scans surface partition columns last; align before comparing
    assert sorted(map(tuple, got.select("k", "p", "v").collect())) == sorted(
        map(tuple, df.collect())
    )
    # partition pruning works off the converted records
    kept, total = mt.pruned_file_count([("p", "=", "1")])
    assert kept < total

    # the table behaves like any managed table afterwards
    # converted schema orders partition columns last (parquet-scan order)
    mt.write(
        spark.createDataFrame([(100, 1.0, "0")], "k long, v double, p string"),
        mode="append",
    )
    assert mt.read().count() == 101
    mt.delete_where([("k", "<", 10)])
    assert mt.read().count() == 91
    assert mt.read(version=0).count() == 100  # time travel to the converted snapshot
    mt.optimize()
    assert mt.read().count() == 91
    # vacuum reclaims converted files once rewrites retired them
    mt.vacuum(retain_hours=0.0)
    assert mt.read().count() == 91


def test_convert_rejects_bad_inputs(spark, tmp_path):
    path = str(tmp_path / "t")
    mt = ManagedTable(spark, path)
    mt.write(spark.range(3).toDF("k"))
    with pytest.raises(ValueError, match="already a managed table"):
        ManagedTable.convert_from_parquet(spark, path)
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        ManagedTable.convert_from_parquet(spark, empty)


def test_convert_flat_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(50).toDF("k").write.parquet(path)
    mt = ManagedTable.convert_from_parquet(spark, path)
    assert mt.read().count() == 50
    assert mt._entry().get("partition_by") == []
    # stats-based skipping works on converted footers
    kept, total = mt.pruned_file_count([("k", "=", -1)])
    assert kept == 0 and total >= 1


def test_converted_table_feeds_cdf(spark, tmp_path):
    path = str(tmp_path / "raw")
    spark.range(5).toDF("k").write.parquet(path)
    mt = ManagedTable.convert_from_parquet(spark, path)
    mt.enable_cdf()
    mt.delete_where([("k", "=", 1)])
    rows = sorted(
        (r._commit_version, r._change_type, r.k)
        for r in mt.change_feed(-1).collect()
    )
    assert rows == [
        (0, "insert", 0), (0, "insert", 1), (0, "insert", 2),
        (0, "insert", 3), (0, "insert", 4), (2, "delete", 1),
    ]
