"""Custom Python DataSource (Spark 4 API): .npy embedding shards.

Covers the four contracts the source exists for: lossless round-trip,
partition-parallel reads, planning-time vec_id pushdown pruning, and the
distributed shard writer's manifest commit.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual

from delta_lake_spark.io.npy_source import (
    MANIFEST,
    NpyReader,
    register_npy_source,
)


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    """Three shards, 10+7+5 rows of dim 4, deterministic values."""
    d = tmp_path_factory.mktemp("npy_shards")
    rng = np.random.default_rng(42)
    for i, rows in enumerate([10, 7, 5]):
        np.save(d / f"shard-{i}.npy", rng.normal(size=(rows, 4)).astype(np.float32))
    return str(d)


def test_read_matches_numpy(spark, npy_dir):
    register_npy_source(spark)
    df = spark.read.format("npy").load(npy_dir).orderBy("vec_id")
    rows = df.collect()
    assert [r.vec_id for r in rows] == list(range(22))
    expected = np.concatenate(
        [np.load(os.path.join(npy_dir, f"shard-{i}.npy")) for i in range(3)]
    )
    got = np.array([r.embedding for r in rows], dtype=np.float32)
    assert np.array_equal(got, expected)


def test_reads_are_partition_parallel(spark, npy_dir):
    register_npy_source(spark)
    df = spark.read.format("npy").option("rows_per_partition", 4).load(npy_dir)
    # 10/4 -> 3, 7/4 -> 2, 5/4 -> 2 row-range partitions
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 22


def test_vec_id_pushdown_prunes_partitions(npy_dir):
    """Planning-time pruning: with vec_id >= 17 only the last shard's ranges
    survive; the bound also trims exactly inside the surviving range."""
    r = NpyReader({"path": npy_dir, "rows_per_partition": "4"})
    leftover = list(r.pushFilters([GreaterThanOrEqual(("vec_id",), 18)]))
    assert leftover == []  # fully consumed
    parts = r.partitions()
    assert [(p.start_id, p.n_rows) for p in parts] == [(17, 4), (21, 1)]
    ids = [row[0] for p in parts for row in _batches_to_rows(r, p)]
    assert ids == [18, 19, 20, 21]


def _batches_to_rows(reader, partition):
    out = []
    for batch in reader.read(partition):
        ids = batch.column(0).to_pylist()
        out.extend((i,) for i in ids)
    return out


def test_pushdown_correct_through_spark(spark, npy_dir):
    register_npy_source(spark)
    df = (
        spark.read.format("npy")
        .option("rows_per_partition", 4)
        .load(npy_dir)
        .filter((F.col("vec_id") >= 6) & (F.col("vec_id") < 15))
    )
    assert sorted(r.vec_id for r in df.collect()) == list(range(6, 15))


def test_write_round_trip(spark, npy_dir, tmp_path):
    register_npy_source(spark)
    src = spark.read.format("npy").load(npy_dir)
    out = str(tmp_path / "out_shards")
    (
        src.repartitionByRange(3, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.format("npy")
        .mode("append")
        .save(out)
    )
    assert os.path.exists(os.path.join(out, MANIFEST))
    back = spark.read.format("npy").load(out).orderBy("vec_id")
    a = np.array([r.embedding for r in src.orderBy("vec_id").collect()])
    b = np.array([r.embedding for r in back.collect()])
    assert np.array_equal(a, b)


def test_writer_rejects_wrong_schema(spark, tmp_path):
    register_npy_source(spark)
    df = spark.range(3).select(F.col("id").alias("x"))
    with pytest.raises(Exception, match="vec_id"):
        df.write.format("npy").mode("append").save(str(tmp_path / "bad"))
