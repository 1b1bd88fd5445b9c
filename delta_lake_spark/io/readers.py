"""Source readers (SURVEY.md §2.1 S1-S6).

The reference mixes schema *inference* at Bronze (CSV header inference →
all strings, deltalake.ipynb:112-116) with explicit casts at Silver; this
module makes both modes first-class and adds the ingest boundary helpers
(pandas/rows → DataFrame) the reference uses for API-fetched and
driver-generated data (S5/S6, deltalake.ipynb:1532, :296-300).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1. Parquet is self-describing; Catalyst prunes columns and pushes
    predicates into the scan automatically."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """S2. Explicit ``schema`` is the scale path: schema inference costs an
    extra full pass over the data (the reference eats this at Bronze;
    deltalake.ipynb:534,544).  ``infer=True`` opts into the reference's
    behavior for exploratory use."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines source (not in the reference; rounds out the format
    surface next to the corpus' JSON-in-string ``events.props``)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def from_pandas(spark: SparkSession, pdf: Any, schema: StructType | None = None) -> DataFrame:
    """S5 ingest boundary (external API → pandas → Spark,
    deltalake.ipynb:1532).  Arrow-accelerated by session config."""
    return spark.createDataFrame(pdf, schema=schema)


def from_rows(spark: SparkSession, rows: list, schema: Any) -> DataFrame:
    """S6 driver-side row source (deltalake.ipynb:296-300).  Only for
    small dimension/seed data — this serializes through the driver."""
    return spark.createDataFrame(rows, schema=schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (beyond-reference source format; Spark built-in).  Like
    parquet, ORC is columnar and self-describing: column pruning and
    predicate pushdown reach the scan the same way."""
    return spark.read.orc(path)
