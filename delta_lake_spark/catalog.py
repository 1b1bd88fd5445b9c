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


# events.ts is TIMESTAMP(NANOS) in the corpus, which Spark 4 refuses to read
# as a timestamp type.  An explicit BIGINT schema reads the raw INT64 nanos
# without any session conf (the physical parquet type is INT64 either way).
_EVENTS_RAW_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

# TIMESTAMP_NTZ epoch for wall-clock arithmetic (see epoch helpers below).
EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (SURVEY.md §2.1 S1).  Column pruning and predicate
    pushdown happen automatically once the caller selects/filters.

    events.ts becomes TIMESTAMP_NTZ (wall-clock, no zone): the corpus writes
    timezone-naive nanos and the DuckDB oracle reads them naive, so NTZ is
    the semantically matching Spark type — date/day projections are identical
    under ANY session timezone, with no session-conf mutation (a reader must
    never silently change semantics for the rest of the session).
    """
    if name == "events":
        from pyspark.sql import functions as F

        df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(f"{sf_dir}/{name}.parquet")
        # integer ns->us division (double division would round at 2^53)
        return df.withColumn(
            "ts",
            F.timestamp_add("MICROSECOND", F.expr("ts div 1000"), F.expr(EPOCH_NTZ)),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def epoch_seconds(col) -> "F.Column":  # noqa: F821 - Column via functions import
    """Floor epoch-seconds of a TIMESTAMP_NTZ as wall-clock UTC — the exact
    twin of DuckDB's second-boundary counting on naive timestamps, and
    timezone-independent by construction."""
    from pyspark.sql import functions as F

    return F.timestamp_diff("SECOND", F.expr(EPOCH_NTZ), col)


def epoch_micros(col) -> "F.Column":  # noqa: F821
    """Epoch-microseconds of a TIMESTAMP_NTZ (wall-clock UTC)."""
    from pyspark.sql import functions as F

    return F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ), col)


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
