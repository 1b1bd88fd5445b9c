"""IO edge tests: CSV round-trips (declared vs inferred schema), JSON,
single-file export, parquet writer options."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from delta_lake_spark.catalog import table
from delta_lake_spark.io import (
    read_csv,
    read_json,
    write_csv,
    write_parquet,
    write_single_csv,
)
from tests.conftest import SF_SMOKE


def test_csv_roundtrip_declared_schema(spark, tmp_path):
    src = table(spark, SF_SMOKE, "nation")
    write_csv(src, str(tmp_path / "nation_csv"))
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    back = read_csv(spark, str(tmp_path / "nation_csv"), schema=schema)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_inference_all_strings_without_infer(spark, tmp_path):
    """Reference behavior: header only, no inference -> every column string
    (deltalake.ipynb:112-116)."""
    write_csv(table(spark, SF_SMOKE, "region"), str(tmp_path / "r"))
    plain = read_csv(spark, str(tmp_path / "r"))
    assert all(f.dataType == StringType() for f in plain.schema.fields)
    inferred = read_csv(spark, str(tmp_path / "r"), infer=True)
    assert inferred.schema["r_regionkey"].dataType != StringType()  # numeric


def test_json_roundtrip(spark, tmp_path):
    src = table(spark, SF_SMOKE, "region")
    src.write.json(str(tmp_path / "j"))
    schema = StructType(
        [
            StructField("r_regionkey", LongType()),
            StructField("r_name", StringType()),
        ]
    )
    back = read_json(spark, str(tmp_path / "j"), schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.select("r_regionkey", "r_name").collect())
    )


def test_write_single_csv(spark, tmp_path):
    dest = str(tmp_path / "out.csv")
    write_single_csv(table(spark, SF_SMOKE, "nation").orderBy("n_nationkey"), dest)
    assert os.path.isfile(dest)
    with open(dest) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("n_nationkey")
    assert len(lines) == 1 + table(spark, SF_SMOKE, "nation").count()


def test_write_parquet_max_records_per_file(spark, tmp_path):
    df = spark.range(1000).withColumn("x", F.col("id").cast(DoubleType())).coalesce(1)
    write_parquet(df, str(tmp_path / "p"), max_records_per_file=100)
    files = [f for f in os.listdir(tmp_path / "p") if f.endswith(".parquet")]
    assert len(files) == 10
    assert spark.read.parquet(str(tmp_path / "p")).count() == 1000


def test_postgres_ddl_from_schema(spark):
    import pytest

    from delta_lake_spark.io.serving import postgres_ddl

    df = spark.sql(
        """SELECT CAST(1 AS BIGINT) AS id, CAST(2.5 AS DECIMAL(15,2)) AS amount,
                  'x' AS name, CAST('2023-01-01' AS DATE) AS d,
                  CAST(true AS BOOLEAN) AS flag"""
    )
    ddl = postgres_ddl(df, "serving.tx", primary_key="id")
    assert "CREATE TABLE IF NOT EXISTS serving.tx" in ddl
    assert "id BIGINT" in ddl
    assert "amount DECIMAL(15,2)" in ddl
    assert "name TEXT" in ddl
    assert "d DATE" in ddl
    assert "flag BOOLEAN" in ddl
    assert "PRIMARY KEY (id)" in ddl
    # non-relational columns must fail loudly, not export garbage
    with pytest.raises(TypeError, match="array<int>"):
        postgres_ddl(spark.sql("SELECT array(1,2) AS a"), "t")


def test_export_for_copy_bundle(spark, tmp_path):
    from delta_lake_spark.io.serving import export_for_copy

    src = table(spark, SF_SMOKE, "nation")
    out = export_for_copy(src, str(tmp_path / "serve"), "nation", single_file=True)
    with open(out["script"]) as fh:
        script = fh.read()
    assert script.startswith("CREATE TABLE IF NOT EXISTS nation")
    assert "\\copy nation FROM" in script and "FORMAT csv, HEADER true" in script
    # the extract must round-trip through the declared schema
    back = (
        spark.read.schema(src.schema).option("header", "true").csv(out["data"])
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    multi = export_for_copy(src, str(tmp_path / "serve2"), "nation")
    with open(multi["script"]) as fh:
        assert fh.read().count("\\copy nation FROM") >= 1


def test_write_jdbc_roundtrip_derby(spark, tmp_path):
    """K7 exercised at runtime: the JDBC serving sink against the embedded
    Apache Derby engine that ships on Spark's own classpath (the Hive
    metastore dependency — no vendored jars).  Covers the reference's
    Postgres serving edge (silver.py:14-73) end-to-end: write via the JDBC
    DataSource, read back via spark.read.jdbc, values and count match."""
    from delta_lake_spark.io.writers import write_jdbc

    url = f"jdbc:derby:{tmp_path}/servedb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(src, url, "nation_serving", mode="overwrite", **props)
    # append path on an existing table (the reference's batched loads)
    write_jdbc(src.limit(3), url, "nation_serving", mode="append", **props)

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_serving")
        .options(**props)
        .load()
    )
    assert back.count() == src.count() + 3
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.dropDuplicates(["n_nationkey"]).collect()))
    assert a == b


def test_events_ts_unit_sniff_error_paths(tmp_path):
    """ADVICE r3: a ts column with no timestamp logical type must raise (not
    silently assume microseconds), and an empty directory must give a clear
    message instead of a bare IndexError."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from delta_lake_spark.catalog import _events_ts_unit

    # plain INT64 ts — no declared unit
    raw = tmp_path / "raw.parquet"
    pq.write_table(pa.table({"ts": pa.array([1, 2], type=pa.int64())}), raw)
    with pytest.raises(TypeError, match="timestamp logical type"):
        _events_ts_unit(str(raw))

    # empty directory
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no \\*.parquet files"):
        _events_ts_unit(str(empty))

    # missing file
    with pytest.raises(FileNotFoundError):
        _events_ts_unit(str(tmp_path / "nope.parquet"))

    # happy path still sniffs declared units, and regeneration invalidates
    good = tmp_path / "good.parquet"
    ts_us = pa.array([1, 2], type=pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts_us}), good)
    assert _events_ts_unit(str(good)) == "us"
    import os
    import time

    ts_ns = pa.array([1, 2], type=pa.timestamp("ns"))
    pq.write_table(pa.table({"ts": ts_ns}), good)
    os.utime(good, (time.time() + 5, time.time() + 5))  # force mtime change
    assert _events_ts_unit(str(good)) == "ns"


def test_orc_roundtrip_with_partitioning_and_pushdown(spark, tmp_path):
    """ORC source/sink (beyond-reference format): round-trip fidelity,
    Hive-style partition recovery, and filters reaching the ORC scan."""
    from delta_lake_spark.io import read_orc, write_orc

    df = spark.range(100).withColumn("part", F.pmod("id", F.lit(4))).withColumn(
        "val", (F.col("id") * 2).cast("double")
    )
    p = str(tmp_path / "orc")
    write_orc(df, p, partition_by=["part"])
    back = read_orc(spark, p)
    assert back.count() == 100
    assert sorted(tuple(r) for r in back.select("id", "part", "val").collect()) == \
        sorted(tuple(r) for r in df.select("id", "part", "val").collect())
    plan_df = back.filter(F.col("part") == 2).filter(F.col("id") > 10)
    import contextlib, io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan or "part#" in plan
    assert plan_df.count() == back.filter("part = 2 AND id > 10").count()
