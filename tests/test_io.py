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
