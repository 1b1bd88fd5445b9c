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


# events.ts has shipped as TIMESTAMP(NANOS) in some corpus generations
# (which Spark 4 refuses to read as a timestamp type) and TIMESTAMP(MICROS,
# unadjusted) in others (which Spark 4 reads natively as TIMESTAMP_NTZ).
# The footer's logical-type timeUnit decides which path applies — sniffed
# once per (sf_dir) from file metadata, never assumed.
_EVENTS_RAW_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

_EVENTS_TS_UNIT_CACHE: dict[tuple[str, float], str] = {}


def _events_ts_unit(path: str) -> str:
    """Time unit ('ns'/'us'/'ms'/'s') of events.ts from the parquet footer —
    a driver-side metadata read of one column chunk, not a data scan.

    Cached per (path, footer mtime) so an in-session regeneration of the
    corpus invalidates the entry instead of serving a stale unit."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):  # directory-style parquet (engine-written)
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(
                f"events table directory {path!r} contains no *.parquet files"
            )
        probe = parts[0]
    if not os.path.exists(probe):
        raise FileNotFoundError(f"events table not found at {probe!r}")
    key = (path, os.path.getmtime(probe))
    unit = _EVENTS_TS_UNIT_CACHE.get(key)
    if unit is None:
        t = pq.ParquetFile(probe).schema_arrow.field("ts").type
        if not pa.types.is_timestamp(t):
            # A plain INT64 ts (no timestamp logical type) has no declared
            # unit; silently assuming 'us' would shift every events-derived
            # date by ~1000x for a raw-nanos corpus. Fail loudly instead.
            raise TypeError(
                f"events.ts in {probe!r} has parquet/Arrow type {t} — expected"
                " a timestamp logical type carrying a time unit. Regenerate"
                " the corpus or declare the unit explicitly."
            )
        unit = t.unit
        _EVENTS_TS_UNIT_CACHE[key] = unit  # stale-mtime entries just linger
    return unit

# TIMESTAMP_NTZ epoch for wall-clock arithmetic (see epoch helpers below).
EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


_SCAN_CACHE: dict[tuple[int, str, str, str, float], DataFrame] = {}


def _scan_cached(spark: SparkSession, kind: str, sf_dir: str, name: str, build) -> DataFrame:
    """Memoize resolved scans per (session, dir, table, file mtime).

    DataFrames are immutable logical plans, so handing the same object back
    is safe — and it removes a ~100 ms JVM schema-resolution round-trip from
    EVERY query build (the corpus queries touch 1-6 tables each).  The mtime
    key invalidates entries when a corpus file is regenerated in-session
    (bench scale corpora); execution always re-lists data files anyway, the
    cache only pins schema + the events ts-unit conversion.
    """
    import os

    fpath = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.path.getmtime(fpath)
    except OSError:
        mtime = -1.0
    key = (id(spark), kind, sf_dir, name, mtime)
    df = _SCAN_CACHE.get(key)
    if df is None:
        df = build()
        _SCAN_CACHE[key] = df
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (SURVEY.md §2.1 S1).  Column pruning and predicate
    pushdown happen automatically once the caller selects/filters.

    events.ts becomes TIMESTAMP_NTZ (wall-clock, no zone): the corpus writes
    timezone-naive nanos and the DuckDB oracle reads them naive, so NTZ is
    the semantically matching Spark type — date/day projections are identical
    under ANY session timezone, with no session-conf mutation (a reader must
    never silently change semantics for the rest of the session).
    """
    return _scan_cached(spark, "plain", sf_dir, name, lambda: _table_uncached(spark, sf_dir, name))


def _table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F

        fpath = f"{sf_dir}/{name}.parquet"
        # Raw INT64 read for every unit: immune to session confs that
        # would otherwise decide the timestamp class (inferTimestampNTZ,
        # timezone) — wall-clock NTZ semantics by construction.
        to_us = {
            # integer ns->us division (double division would round at 2^53)
            "ns": F.expr("ts div 1000"),
            "us": F.col("ts"),
            "ms": F.col("ts") * 1000,
            "s": F.col("ts") * 1_000_000,
        }[_events_ts_unit(fpath)]
        df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(fpath)
        return df.withColumn(
            "ts", F.timestamp_add("MICROSECOND", to_us, F.expr(EPOCH_NTZ))
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


# ---------------------------------------------------------------------------
# Batch event-time validity rule (engine-wide, r9).
#
# THE RULE: a row participates in an event-TIME-ORDERED kernel (as-of
# matching, funnel stage minima, attribution lookbacks, point-in-time
# timelines, rate series) only if its timestamp is non-NULL and strictly
# after the epoch.  A NULL event time cannot be placed on any timeline —
# engines only disagree on where to sort it (Spark NULLS FIRST would
# forward-fill it into real history; DuckDB ASOF never matches a NULL key).
# A zero/negative timestamp is the classic zero-initialized parse-failure
# sentinel in crawl data.  This is the same rule the streaming layer
# (streaming/streams.as_event_time — Spark's initial watermark IS epoch 0,
# so pre-epoch rows are dropped as late data nondeterministically) and SCD2
# (tables/scd.py — NULL-ts change rows are unplaceable) already enforce;
# batch kernels apply it via ``valid_event_time`` and their DuckDB oracles
# apply the IDENTICAL predicate via ``VALID_EVENT_TS_SQL``, so parity holds
# on any input.  Kernels that aggregate by VALUE only (counts, sums,
# grouped stats) do NOT apply it — a NULL-ts row still happened.
# ---------------------------------------------------------------------------
VALID_EVENT_TS_SQL = "(ts IS NOT NULL AND ts > TIMESTAMP '1970-01-01 00:00:00')"


def valid_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Engine half of the event-time validity rule (see VALID_EVENT_TS_SQL).

    ``ts_col`` is TIMESTAMP_NTZ wall-clock (``table()``'s events contract),
    so the epoch comparison is a naive-to-naive compare — timezone-invariant
    by construction, matching the DuckDB predicate exactly.
    """
    from pyspark.sql import functions as F

    return df.filter(
        F.col(ts_col).isNotNull() & (F.col(ts_col) > F.expr(EPOCH_NTZ))
    )


def table_parallel(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Scan + hash-repartition to the session's parallelism.

    The corpus tables are single small parquet files, so a plain scan yields
    ONE input split and any expression-heavy map stage (regexp, shingling,
    hashing) runs single-threaded.  On a real cluster large tables arrive
    pre-split; this helper only matters for small-file inputs feeding heavy
    per-row compute — exactly the LLM-pipeline text operators.  Deterministic
    (hash partitioning on a key, not round-robin).
    """
    def build() -> DataFrame:
        par = spark.sparkContext.defaultParallelism
        from pyspark.sql import functions as F

        return table(spark, sf_dir, name).repartition(par, F.col(key))

    return _scan_cached(spark, f"par-{key}", sf_dir, name, build)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql use
    (SURVEY.md §2.1 K8 analog for the test corpus)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
