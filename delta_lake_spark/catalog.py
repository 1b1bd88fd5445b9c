"""Named access to the driver test corpus (TESTDATA.md).

Tables stand in for the reference's data model per FIXTURES.md §5:
``lineitem``/``orders`` ≈ transactions fact, ``customer``(+``nation``,
``region``) ≈ clients dim, ``events`` aggregated to day ≈ currency_rates
daily series, ``documents``/``embeddings`` feed the extension operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (SURVEY.md §2.1 S1).  Column pruning and predicate
    pushdown happen automatically once the caller selects/filters.

    events.ts is TIMESTAMP(NANOS) in the corpus, which Spark 4 refuses to
    read as a timestamp; read it as raw nanos (legacy conf) and convert to a
    microsecond timestamp column so downstream code sees TimestampType.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() builds a UTC-instant TimestampType whose
        # date/second projections are session-timezone-dependent; pin UTC so
        # results match the (timezone-naive) oracle under any host session.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_parallel(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Scan + hash-repartition to the session's parallelism.

    The corpus tables are single small parquet files, so a plain scan yields
    ONE input split and any expression-heavy map stage (regexp, shingling,
    hashing) runs single-threaded.  On a real cluster large tables arrive
    pre-split; this helper only matters for small-file inputs feeding heavy
    per-row compute — exactly the LLM-pipeline text operators.  Deterministic
    (hash partitioning on a key, not round-robin).
    """
    par = spark.sparkContext.defaultParallelism
    from pyspark.sql import functions as F

    return table(spark, sf_dir, name).repartition(par, F.col(key))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use
    (SURVEY.md §2.1 K8 analog for the test corpus)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
