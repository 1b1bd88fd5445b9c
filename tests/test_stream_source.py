"""Streaming SOURCE over managed tables (tables/stream_source.py): version
offsets, exactly-once incremental delivery, dataChange=false skipping,
change-commit rejection, and schema-evolution null-fill."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable
from delta_lake_spark.tables.stream_source import register_managed_stream_source


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_managed_stream_source(spark)


def _drain(spark, table_path, out, ckpt, **opts):
    reader = spark.readStream.format("managed_stream").option("path", table_path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out)


def test_incremental_exactly_once_and_optimize_skipped(spark, tmp_path):
    tp, out, ckpt = (str(tmp_path / x) for x in ("t", "out", "ckpt"))
    mt = ManagedTable(spark, tp)
    mt.write(
        spark.createDataFrame([(1, "US"), (2, "DE")], "k long, country string"),
        partition_by=["country"],
    )
    mt.write(
        spark.createDataFrame([(3, "US")], "k long, country string"),
        mode="append",
    )
    got = _drain(spark, tp, out, ckpt)
    assert sorted((r["k"], r["country"]) for r in got.collect()) == [
        (1, "US"),
        (2, "DE"),
        (3, "US"),
    ]
    # partition column recovered from Hive path components, typed
    assert dict(got.dtypes)["country"] == "string"

    # restart from the checkpoint: only the NEW commit flows; the OPTIMIZE
    # commit (dataChange=false analog) must be invisible to the stream
    mt.write(
        spark.createDataFrame([(4, "FR")], "k long, country string"),
        mode="append",
    )
    mt.optimize()
    got2 = _drain(spark, tp, out, ckpt)
    assert sorted((r["k"], r["country"]) for r in got2.collect()) == [
        (1, "US"),
        (2, "DE"),
        (3, "US"),
        (4, "FR"),
    ]
    # a third drain with no new commits delivers nothing new (exactly-once)
    got3 = _drain(spark, tp, out, ckpt)
    assert got3.count() == 4


def test_change_commit_raises_unless_skipped(spark, tmp_path):
    tp = str(tmp_path / "t")
    mt = ManagedTable(spark, tp)
    mt.write(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    mt.write(
        spark.createDataFrame([(3, 30.0)], "k long, v double"), mode="append"
    )
    mt.delete_where([("k", "=", 1)])  # rewrite -> change commit

    with pytest.raises(Exception, match="not append-only"):
        _drain(spark, tp, str(tmp_path / "o1"), str(tmp_path / "c1"))

    got = _drain(
        spark,
        tp,
        str(tmp_path / "o2"),
        str(tmp_path / "c2"),
        skipChangeCommits="true",
    )
    # the delete commit is skipped wholesale; earlier appends still flow
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3]


def test_starting_version_and_schema_evolution_null_fill(spark, tmp_path):
    tp = str(tmp_path / "t")
    mt = ManagedTable(spark, tp)
    mt.write(spark.createDataFrame([(1,)], "k long"))
    mt.write(spark.createDataFrame([(2,)], "k long"), mode="append")
    mt.write(
        spark.createDataFrame([(3, "x")], "k long, tag string"),
        mode="append",
        merge_schema=True,
    )

    # startingVersion skips the initial snapshot commit
    got = _drain(
        spark,
        tp,
        str(tmp_path / "o1"),
        str(tmp_path / "c1"),
        startingVersion="1",
    )
    rows = {r["k"]: r["tag"] for r in got.collect()}
    # pre-evolution file null-fills the new column; evolved file carries it
    assert rows == {2: None, 3: "x"}
