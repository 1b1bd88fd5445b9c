"""Time-series operator inventory (SURVEY.md §2.5): date spine, forward fill,
lag deltas, as-of join — over the events table (the corpus stand-in for the
reference's daily currency_rates series, FIXTURES.md §5).

Determinism: the daily "rate" is MAX(value) per day — max of doubles is
order-independent, unlike sum/avg, so forward-filled values are bit-identical
between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_spark.catalog import (
    VALID_EVENT_TS_SQL,
    epoch_seconds,
    table,
    valid_event_time,
)
from delta_lake_spark.ops.windows import asof_join, date_spine, diff_cols, gap_fill
from delta_lake_spark.queries.registry import register


def _sparse_daily_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rate series with gaps (mirrors currency_rates' weekend gaps,
    FIXTURES.md §3): only days where some event value exceeded 480.

    Rate-domain gate (degenerate suite r8, same policy as
    pipeline/marts.daily_rates): a rate is positive and bounded — the upper
    bound (< 1e6) excludes crawl-quality garbage values (1e154) that would
    overflow the exact-integer rate kernels (q65's milli-rate fold) in both
    engines.  Applied identically in _SPARSE_RATES_SQL.

    Event-time validity gate (r9, catalog.VALID_EVENT_TS_SQL): a rate is a
    point on a timeline — a NULL-ts "rate" would otherwise become a
    NULL-date row that Spark's NULLS-FIRST forward-fill smears into every
    earlier date while DuckDB's ASOF never matches it (the r8 planted row
    99015, value 900, proved the divergence in q19).
    """
    e = valid_event_time(table(spark, sf_dir, "events"))
    return (
        e.filter((F.col("value") > 480) & (F.col("value") < 1e6))
        .groupBy(F.to_date("ts").alias("rate_date"))
        .agg(F.max("value").alias("rate"))
    )


_SPARSE_RATES_SQL = f"""
  SELECT CAST(ts AS DATE) AS rate_date, MAX(value) AS rate
  FROM events WHERE value > 480 AND value < 1e6 AND {VALID_EVENT_TS_SQL}
  GROUP BY 1
"""

# Measurement-domain gate for the exact-integer event-value kernels (q62
# PSI buckets, q69 TWAP milli-quantization): |value| <= 1e12 keeps every
# milli-scaled value (and its duration-weighted products) inside BIGINT in
# both engines; a 1e154 crawl-garbage value otherwise overflows Spark's
# ANSI cast and DuckDB's INT64 conversion identically-fatally but with
# different errors.  ABS(NaN) <= bound is false in both engines, so NaN
# rows are excluded symmetrically too.  Same discipline as the vector
# family's embedding-validity gate (queries/vector.py).
_VALUE_DOMAIN = 1e12
_VALUE_DOMAIN_SQL = f"ABS(value) <= {_VALUE_DOMAIN}"


def _valid_value(df: DataFrame) -> DataFrame:
    return df.filter(F.abs(F.col("value")) <= F.lit(_VALUE_DOMAIN))


# ---------------------------------------------------------------------------
# q09 — date spine + forward fill (reference W3+W1+J5 —
# deltalake.ipynb:1011-1025: spine join then last(ignorenulls))
# ---------------------------------------------------------------------------
@register(
    "q09_date_spine_ffill",
    oracle=f"""
WITH rates AS ({_SPARSE_RATES_SQL}),
bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events),
spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date FROM bounds
)
SELECT s.date,
       LAST_VALUE(r.rate IGNORE NULLS) OVER (
         ORDER BY s.date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rate
FROM spine s LEFT JOIN rates r ON s.date = r.rate_date
ORDER BY s.date
""",
)
def q09_date_spine_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    spine = date_spine(e, "d", alias="date")
    rates = _sparse_daily_rates(spark, sf_dir)
    joined = spine.join(rates, spine.date == rates.rate_date, "left").select("date", "rate")
    return gap_fill(joined, ["rate"], order_by=["date"]).orderBy("date")


# ---------------------------------------------------------------------------
# q10 — lag delta over the filled series (reference W2 —
# deltalake.ipynb:1027-1032: rate - lag(rate) ordered by date)
# ---------------------------------------------------------------------------
@register(
    "q10_rate_changes",
    oracle=f"""
WITH rates AS ({_SPARSE_RATES_SQL})
SELECT rate_date AS date, rate,
       rate - LAG(rate, 1) OVER (ORDER BY rate_date) AS rate_change
FROM rates
ORDER BY date
""",
)
def q10_rate_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = _sparse_daily_rates(spark, sf_dir).withColumnRenamed("rate_date", "date")
    return diff_cols(rates, ["rate"], order_by=["date"], suffix="_change").orderBy("date")


# ---------------------------------------------------------------------------
# q19 — as-of join: each event matched to the most recent sparse rate at or
# before its date (engine operator; oracle = DuckDB native ASOF LEFT JOIN)
# ---------------------------------------------------------------------------
@register(
    "q19_asof_event_rates",
    oracle=f"""
WITH rates AS ({_SPARSE_RATES_SQL})
SELECT e.event_id, CAST(e.ts AS DATE) AS event_date,
       r.rate_date AS rate_date_asof, r.rate
FROM (SELECT event_id, ts FROM events WHERE event_id % 20 = 0) e
ASOF LEFT JOIN rates r ON CAST(e.ts AS DATE) >= r.rate_date
ORDER BY e.event_id
""",
)
def q19_asof_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 20 == 0)
        .select("event_id", F.to_date("ts").alias("event_date"))
    )
    rates = _sparse_daily_rates(spark, sf_dir).withColumnRenamed("rate_date", "event_date")
    out = asof_join(e, rates, on="event_date", right_cols=["rate"])
    return out.select(
        "event_id", "event_date", F.col("event_date_asof").alias("rate_date_asof"), "rate"
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q20 — gap-fill invariant view: spine row count and coverage
# (reference golden invariant: count == datediff(max,min)+1, FIXTURES.md §3)
# ---------------------------------------------------------------------------
@register(
    "q20_spine_invariants",
    oracle="""
WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events)
SELECT (hi - lo + 1)::BIGINT AS expected_days,
       date_diff('day', lo, hi) + 1 AS datediff_days,
       lo AS min_date, hi AS max_date
FROM bounds
""",
)
def q20_spine_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.agg(
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1).cast("long").alias("expected_days"),
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1).cast("long").alias("datediff_days"),
        F.min(F.to_date("ts")).alias("min_date"),
        F.max(F.to_date("ts")).alias("max_date"),
    )


# ---------------------------------------------------------------------------
# q23 — sessionization-lite: per-user event ordering with lag + time deltas
# (engine extension exercising lag over partitioned windows at fact scale)
# ---------------------------------------------------------------------------
@register(
    "q23_user_event_gaps",
    oracle="""
SELECT user_id,
       COUNT(*)                         AS n_events,
       MAX(gap_s)                       AS max_gap_s,
       CAST(SUM(CASE WHEN gap_s > 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_day_gaps
FROM (
  SELECT user_id,
         date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
  FROM events
) t
GROUP BY user_id
ORDER BY user_id
""",
)
def q23_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # floor-epoch-second difference == DuckDB date_diff('second', ...)
    # boundary counting; ts is TIMESTAMP_NTZ so this is tz-independent
    gap = epoch_seconds(F.col("ts")) - F.lag(epoch_seconds(F.col("ts"))).over(w)
    return (
        e.select("user_id", "event_id", "ts")
        .withColumn("gap_s", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum(F.when(F.col("gap_s") > 86400, 1).otherwise(0)).alias("n_day_gaps"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q27 — batch sessionization: gap-based sessions via lag + running sum
# windows (the batch twin of streaming.stateful.sessionize; integer-only
# durations keep it oracle-exact)
# ---------------------------------------------------------------------------
_Q27_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN {epoch_us}(ts) - LAG({epoch_us}(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
per_sess AS (
  SELECT user_id, sess_id, COUNT(*) AS n_events,
         {epoch_us}(MAX(ts)) - {epoch_us}(MIN(ts)) AS dur_us
  FROM sess GROUP BY user_id, sess_id
)
SELECT user_id,
       COUNT(*)                                        AS n_sessions,
       CAST(SUM(n_events) AS BIGINT)                   AS total_events,
       CAST(MAX(n_events) AS BIGINT)                   AS max_session_events,
       CAST(FLOOR(SUM(dur_us) / COUNT(*) / 1000000.0) AS BIGINT) AS avg_session_s
FROM per_sess
GROUP BY user_id
ORDER BY user_id
"""


@register("q27_user_sessions", oracle=_Q27_SQL.format(epoch_us="epoch_us"))
def q27_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ, register_views

    register_views(spark, sf_dir)
    # SQL scalar UDF (pure-SQL body, stays in codegen): wall-clock epoch-us
    # of a TIMESTAMP_NTZ — the exact twin of DuckDB's epoch_us on naive ts,
    # timezone-independent (events.ts is NTZ, see catalog.table).
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us_wall(t TIMESTAMP_NTZ) "
        f"RETURNS BIGINT RETURN timestampdiff(MICROSECOND, {EPOCH_NTZ}, t)"
    )
    return spark.sql(_Q27_SQL.format(epoch_us="epoch_us_wall"))


# ---------------------------------------------------------------------------
# q34 — binned range join (point-in-interval without a cartesian plan):
# shipments landing inside the 7-day window after each 1995 urgent order.
# The DuckDB oracle states the declarative non-equi form; the Spark plan
# goes through ops.range_join.binned_range_join — bin the date axis, explode
# intervals into overlapped bins, equi-join on bin, re-check exactly —
# so the physical join is a partitioned hash join, not a BNLJ (asserted in
# tests/test_plans.py).
# ---------------------------------------------------------------------------
@register(
    "q34_shipments_after_urgent_orders",
    oracle="""
WITH i AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE)                  AS win_start,
         CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS win_end
  FROM orders
  WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
)
SELECT i.o_orderkey,
       COUNT(*) AS n_shipments,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM i JOIN lineitem l
  ON CAST(l.l_shipdate AS DATE) BETWEEN i.win_start AND i.win_end
GROUP BY i.o_orderkey
ORDER BY i.o_orderkey
""",
)
def q34_shipments_after_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.ops.range_join import binned_range_join

    intervals = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1995)
        )
        .select(
            "o_orderkey",
            F.unix_date(F.to_date("o_orderdate")).alias("win_start"),
            (F.unix_date(F.to_date("o_orderdate")) + 7).alias("win_end"),
        )
    )
    points = table(spark, sf_dir, "lineitem").select(
        F.unix_date(F.to_date("l_shipdate")).alias("ship_day"), "l_quantity"
    )
    # bin width = interval length (8 days inclusive): each interval lands in
    # at most 2 bins, each bin holds ~8 days of shipments.
    joined = binned_range_join(points, intervals, "ship_day", "win_start", "win_end", 8)
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_shipments"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q45 — weekly retention cohorts over the event stream: users are cohorted by
# the Monday of their first event week; each later active week contributes to
# that cohort's retention row.  The classic product-analytics triangle matrix,
# in pure integer/date math (NTZ weeks, basis-point integer division) so the
# oracle is hash-exact.
#
# Scale shape: (user, week) activity dedups with one user-keyed shuffle, the
# cohort min reuses the same key, and everything after the cohort join
# aggregates on (cohort_week, weeks_since) — a group count bounded by
# weeks^2/2 regardless of corpus size.  Cohort sizes join back via AQE
# broadcast (weeks-count rows).
# ---------------------------------------------------------------------------
@register(
    "q45_retention_cohorts",
    oracle="""
WITH ua AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ua GROUP BY user_id),
sizes AS (SELECT cohort_week, COUNT(*) AS cohort_n FROM cohort GROUP BY cohort_week),
act AS (
  SELECT c.cohort_week,
         CAST((ua.wk - c.cohort_week) // 7 AS BIGINT) AS weeks_since,
         COUNT(*) AS n_active
  FROM ua JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT act.cohort_week, act.weeks_since, act.n_active, sizes.cohort_n,
       (act.n_active * 10000) // sizes.cohort_n AS retention_bp
FROM act JOIN sizes USING (cohort_week)
ORDER BY cohort_week, weeks_since
""",
)
def q45_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ua = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    cohort = ua.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_n"))
    act = (
        ua.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(wk, cohort_week) AS BIGINT) div 7").alias(
                "weeks_since"
            ),
        )
        .agg(F.count("*").alias("n_active"))
    )
    return (
        act.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "n_active",
            "cohort_n",
            F.expr("(n_active * 10000) div cohort_n").alias("retention_bp"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


# ---------------------------------------------------------------------------
# q58 — ordered funnel analysis (view -> click -> purchase): for each user,
# the first view, the first click strictly after it, and the first purchase
# strictly after that; reported as per-step user counts plus the exact
# integer sum of seconds-from-first-view for converting users.
#
# Plan shape (the 100-TB funnel idiom): the three "first event after the
# previous step" timestamps are CHAINED unpartitioned-frame window minima
# over the SAME partitioning (user_id), so Catalyst plans ONE Exchange and
# evaluates all three steps inside it — no self-joins, no per-step shuffle.
# The per-user frame then collapses through an ordinary partial-aggregated
# groupBy, and the 1-row global summary unpivots shuffle-free via stack().
# ---------------------------------------------------------------------------
@register(
    "q58_conversion_funnel",
    oracle=f"""
WITH ev AS (
  -- event-time validity gate (catalog.VALID_EVENT_TS_SQL): funnel stages
  -- are MIN-over-time — a NULL-ts view would found a user's funnel at an
  -- unplaceable instant (engines disagree on whether it enters the minima)
  SELECT user_id, event_type, ts FROM events WHERE {VALID_EVENT_TS_SQL}
),
s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT step, users, sum_secs FROM (
  SELECT 1 AS ord, 'view' AS step,
         (SELECT COUNT(*) FROM s1) AS users,
         CAST(0 AS BIGINT) AS sum_secs
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM s2),
         (SELECT CAST(COALESCE(SUM(date_diff('second', s1.t1, s2.t2)), 0) AS BIGINT)
          FROM s2 JOIN s1 ON s2.user_id = s1.user_id)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3),
         (SELECT CAST(COALESCE(SUM(date_diff('second', s1.t1, s3.t3)), 0) AS BIGINT)
          FROM s3 JOIN s1 ON s3.user_id = s1.user_id)
) t ORDER BY ord
""",
)
def q58_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = valid_event_time(table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    stepped = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    stepped = stepped.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        stepped.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3"))
    )
    # floor-epoch-second differences match DuckDB date_diff('second', ...)
    s2_secs = epoch_seconds(F.col("t2")) - epoch_seconds(F.col("t1"))
    s3_secs = epoch_seconds(F.col("t3")) - epoch_seconds(F.col("t1"))
    summary = per_user.agg(
        F.count("t1").alias("u1"),
        F.count("t2").alias("u2"),
        F.count("t3").alias("u3"),
        F.coalesce(
            F.sum(F.when(F.col("t2").isNotNull(), s2_secs)), F.lit(0)
        ).alias("sec2"),
        F.coalesce(
            F.sum(F.when(F.col("t3").isNotNull(), s3_secs)), F.lit(0)
        ).alias("sec3"),
    )
    return summary.selectExpr(
        "stack(3, 'view', u1, CAST(0 AS BIGINT),"
        " 'click', u2, sec2, 'purchase', u3, sec3)"
        " AS (step, users, sum_secs)"
    )


# ---------------------------------------------------------------------------
# q59 — daily OHLC bars: per (event_type, day) the opening value (first by
# ts), high, low, close (last by ts), and tick count — the classic
# market-data resample (the reference's currency-rate domain, FIXTURES §3).
#
# Plan shape: BOTH row_number windows (asc for open, desc for close) share
# the (event_type, day) partitioning, so Catalyst plans ONE Exchange; the
# final groupBy reuses it.  Ties on ts break by event_id, so open/close are
# engine-independent.
# ---------------------------------------------------------------------------
@register(
    "q59_daily_ohlc",
    oracle="""
SELECT event_type, d, open, high, low, close, n_ticks FROM (
  SELECT event_type, CAST(ts AS DATE) AS d,
         FIRST_VALUE(value) OVER (
           PARTITION BY event_type, CAST(ts AS DATE)
           ORDER BY ts, event_id) AS open,
         MAX(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS high,
         MIN(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS low,
         FIRST_VALUE(value) OVER (
           PARTITION BY event_type, CAST(ts AS DATE)
           ORDER BY ts DESC, event_id DESC) AS close,
         COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS n_ticks,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, CAST(ts AS DATE)
           ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn = 1
ORDER BY event_type, d
""",
)
def q59_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type", "d")
    asc = w.orderBy("ts", "event_id")
    desc = w.orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("open", F.first("value").over(asc))
        .withColumn("high", F.max("value").over(w))
        .withColumn("low", F.min("value").over(w))
        .withColumn("close", F.first("value").over(desc))
        .withColumn("n_ticks", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(asc))
        .filter(F.col("rn") == 1)
        .select("event_type", "d", "open", "high", "low", "close", "n_ticks")
        .orderBy("event_type", "d")
    )


# ---------------------------------------------------------------------------
# q61 — event transition matrix (behavioral Markov counts): for each user's
# time-ordered event stream, count (previous event_type -> event_type)
# transitions corpus-wide and report each transition's share of its source
# state's outgoing edges (integer basis points — engine-exact).
#
# Plan shape: ONE lag window over user_id ordering feeds a partial-
# aggregated groupBy — the canonical clickstream-analytics shape; nothing
# quadratic, state space bounded by (#event_types)^2.
# ---------------------------------------------------------------------------
@register(
    "q61_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         -- NULLS FIRST: engine-wide null-ordering convention (r8)
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
           AS prev_type
  FROM events
),
cnt AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       CAST((n * 10000) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS share_bp
FROM cnt
ORDER BY prev_type, event_type
""",
)
def q61_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n"))
    share = Window.partitionBy("prev_type")
    return (
        cnt.withColumn(
            "share_bp",
            F.expr("n * 10000 div SUM(n) OVER (PARTITION BY prev_type)"),
        )
        .select("prev_type", "event_type", "n", "share_bp")
        .orderBy("prev_type", "event_type")
    )


# ---------------------------------------------------------------------------
# q62 — feature drift monitoring (PSI): Population Stability Index of the
# `value` distribution per event_type, first half of the corpus window
# (reference) vs the second (current) — the standard production check that
# a feature's distribution hasn't shifted under a trained model.  Counts
# are exact integers over a FIXED bucket grid (materialized spine, so
# empty buckets participate via add-one smoothing); the PSI double is
# computed from those exact counts with an identical expression in both
# engines and rounded to 6 dp.
#
# Plan shape: one partial-aggregated groupBy over the fact, joined to a
# literal 10-bucket spine — no window, no second scan; PSI per feature is
# a 10-term fold.  At 100 TB this is one shuffle of (type, window, bucket)
# triples.
# ---------------------------------------------------------------------------
_Q62_SPLIT = "2024-01-16"
_Q62_BUCKETS = 10


@register(
    "q62_feature_drift",
    oracle=f"""
WITH counts AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_Q62_SPLIT} 00:00:00' THEN 'ref' ELSE 'cur' END AS win,
         LEAST(CAST(FLOOR(value / 50) AS BIGINT), {_Q62_BUCKETS - 1}) AS b,
         COUNT(*) AS n
  FROM events WHERE {_VALUE_DOMAIN_SQL} GROUP BY 1, 2, 3
),
spine AS (
  SELECT t.event_type, gs.b
  FROM (SELECT DISTINCT event_type FROM events WHERE {_VALUE_DOMAIN_SQL}) t
  CROSS JOIN (SELECT UNNEST(generate_series(0, {_Q62_BUCKETS - 1})) AS b) gs
),
filled AS (
  SELECT s.event_type, s.b,
         COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur
  FROM spine s
  LEFT JOIN counts r ON r.event_type = s.event_type AND r.b = s.b AND r.win = 'ref'
  LEFT JOIN counts c ON c.event_type = s.event_type AND c.b = s.b AND c.win = 'cur'
),
totals AS (
  SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
  FROM filled GROUP BY event_type
),
terms AS (
  SELECT f.event_type, t.t_ref, t.t_cur,
         (CAST(f.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + {_Q62_BUCKETS} AS DOUBLE)
          - CAST(f.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + {_Q62_BUCKETS} AS DOUBLE))
         * LN((CAST(f.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + {_Q62_BUCKETS} AS DOUBLE))
              / (CAST(f.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + {_Q62_BUCKETS} AS DOUBLE)))
           AS term
  FROM filled f JOIN totals t USING (event_type)
)
SELECT event_type, CAST(MAX(t_ref) AS BIGINT) AS n_ref,
       CAST(MAX(t_cur) AS BIGINT) AS n_cur,
       ROUND(SUM(term), 6) AS psi
FROM terms GROUP BY event_type ORDER BY event_type
""",
)
def q62_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _valid_value(table(spark, sf_dir, "events"))
    b = F.least(
        F.floor(F.col("value") / 50).cast("long"), F.lit(_Q62_BUCKETS - 1)
    )
    win = F.when(F.col("ts") < _Q62_SPLIT, "ref").otherwise("cur")
    counts = (
        e.select("event_type", win.alias("win"), b.alias("b"))
        .groupBy("event_type", "win", "b")
        .agg(F.count("*").alias("n"))
    )
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(_Q62_BUCKETS).select(F.col("id").alias("b"))
        )
    )
    ref = counts.filter(F.col("win") == "ref").select(
        "event_type", "b", F.col("n").alias("n_ref")
    )
    cur = counts.filter(F.col("win") == "cur").select(
        "event_type", "b", F.col("n").alias("n_cur")
    )
    filled = (
        spine.join(ref, ["event_type", "b"], "left")
        .join(cur, ["event_type", "b"], "left")
        .fillna(0, ["n_ref", "n_cur"])
    )
    w = Window.partitionBy("event_type")
    p = (F.col("n_ref") + 1).cast("double") / (
        F.sum("n_ref").over(w) + _Q62_BUCKETS
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.sum("n_cur").over(w) + _Q62_BUCKETS
    ).cast("double")
    return (
        filled.withColumn("term", (p - q) * F.log(p / q))
        .groupBy("event_type")
        .agg(
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q63 — event co-occurrence lift (market-basket affinity over the event
# stream): for each unordered pair of event types, how many distinct users
# performed both, and the lift vs independence
# (P(a,b) / (P(a)P(b)) = n_ab * n_users / (n_a * n_b)), reported in exact
# integer milli-units so both engines agree bit-for-bit.
#
# Plan shape: the fact collapses FIRST to distinct (user, type) — one
# dedup shuffle, output bounded by users x type-vocabulary — then a
# user-keyed self-equi-join whose per-user fan-out is capped by the type
# vocabulary (never quadratic in events).  Type totals and the user count
# are broadcast (fixed-size dims, q29/q30 hint convention).
# ---------------------------------------------------------------------------
@register(
    "q63_event_cooccurrence",
    oracle="""
WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM u GROUP BY event_type
),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM u),
p AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM u a JOIN u b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.et_a, p.et_b, p.n_ab, ta.n_t AS n_a, tb.n_t AS n_b, nu.n_users,
       CAST((p.n_ab * nu.n_users * 1000) // (ta.n_t * tb.n_t) AS BIGINT)
         AS lift_milli
FROM p
CROSS JOIN nu
JOIN tot ta ON ta.event_type = p.et_a
JOIN tot tb ON tb.event_type = p.et_b
ORDER BY et_a, et_b
""",
)
def q63_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    u = e.select("user_id", "event_type").distinct()
    tot = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    nu = u.agg(F.count_distinct("user_id").alias("n_users"))
    pairs = (
        u.alias("a")
        .join(
            u.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("et_a"),
            F.col("b.event_type").alias("et_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(tot.select(F.col("event_type").alias("et_a"), F.col("n_t").alias("n_a"))),
            "et_a",
        )
        .join(
            F.broadcast(tot.select(F.col("event_type").alias("et_b"), F.col("n_t").alias("n_b"))),
            "et_b",
        )
        .crossJoin(F.broadcast(nu))
        .withColumn(
            "lift_milli",
            F.expr("CAST((n_ab * n_users * 1000) DIV (n_a * n_b) AS BIGINT)"),
        )
        .select("et_a", "et_b", "n_ab", "n_a", "n_b", "n_users", "lift_milli")
        .orderBy("et_a", "et_b")
    )


# ---------------------------------------------------------------------------
# q64 — linear gap interpolation over the date spine (the interpolation
# twin of q09's forward fill): missing days between two sparse rate
# anchors take the straight-line value; leading/trailing gaps extend the
# nearest anchor.  The double arithmetic is ONE identical IEEE expression
# in both engines over identical inputs (anchor = MAX, no accumulation
# order), floored to integer micro-units — so the result is hash-exact.
#
# Plan shape: like q09, the windows run over the DATE-level spine — one
# row per calendar day, bounded by the calendar and not by SF, so the
# global window input is metadata-sized (plan-lint allowlisted with the
# same justification as q10/q19).
# ---------------------------------------------------------------------------
@register(
    "q64_linear_interpolation",
    oracle=f"""
WITH rates AS ({_SPARSE_RATES_SQL}),
bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events),
spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date FROM bounds
),
j AS (
  SELECT s.date, r.rate, r.rate_date
  FROM spine s LEFT JOIN rates r ON s.date = r.rate_date
),
f AS (
  SELECT date,
         LAST_VALUE(rate IGNORE NULLS) OVER w_p      AS pv,
         LAST_VALUE(rate_date IGNORE NULLS) OVER w_p AS pd,
         FIRST_VALUE(rate IGNORE NULLS) OVER w_n      AS nv,
         FIRST_VALUE(rate_date IGNORE NULLS) OVER w_n AS nd
  FROM j
  WINDOW w_p AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_n AS (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT date,
       CAST(FLOOR((CASE WHEN pv IS NULL THEN nv
                        WHEN nv IS NULL THEN pv
                        WHEN pd = nd THEN pv
                        ELSE pv + (nv - pv) * (date - pd) / (nd - pd)
                   END) * 1000000) AS BIGINT) AS rate_micro
FROM f ORDER BY date
""",
)
def q64_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.ops.windows import date_spine

    e = table(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    spine = date_spine(e, "d", alias="date")
    rates = _sparse_daily_rates(spark, sf_dir)
    j = spine.join(rates, spine.date == rates.rate_date, "left").select(
        "date", "rate", "rate_date"
    )
    w_p = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    w_n = Window.orderBy("date").rowsBetween(0, Window.unboundedFollowing)
    f = j.select(
        "date",
        F.last("rate", ignorenulls=True).over(w_p).alias("pv"),
        F.last("rate_date", ignorenulls=True).over(w_p).alias("pd"),
        F.first("rate", ignorenulls=True).over(w_n).alias("nv"),
        F.first("rate_date", ignorenulls=True).over(w_n).alias("nd"),
    )
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("pd") == F.col("nd"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * F.datediff("date", "pd")
            / F.datediff("nd", "pd")
        )
    )
    return f.select(
        "date",
        F.floor(interp * 1_000_000).cast("long").alias("rate_micro"),
    ).orderBy("date")


# ---------------------------------------------------------------------------
# q65 — EWMA trend smoothing over the sparse rate series, exact-integer
# formulation.  EWMA is a recurrence (state_t = a*state_{t-1} + ...), which
# neither engine's windows express and which would be order-sensitive in
# floating point; instead the decay is truncated at 60 days and each
# anchor observation SCATTERS its weighted contribution forward to the
# days it influences:  ewma(d) = sum_i v_i * w_{d-d_i} / sum_i w_{d-d_i}
# with w_k = floor(0.9^k * 1e6) precomputed integer weights.  All sums are
# exact integers, the division is integer DIV — hash-exact across engines.
#
# Plan shape: contributions = anchors x 61 (calendar-bounded), one shuffle
# on the target day, spine join; per-row state never exists, so the plan
# parallelizes like any aggregate — the standard trick for turning a
# linear recurrence into a bounded convolution.
# ---------------------------------------------------------------------------
_Q65_SPAN = 60
_Q65_W = [int((0.9**k) * 1_000_000) for k in range(_Q65_SPAN + 1)]


@register(
    "q65_ewma_smoothing",
    oracle=f"""
WITH rates AS ({_SPARSE_RATES_SQL}),
wts AS (
  SELECT CAST(k AS BIGINT) AS k, ({_Q65_W})[CAST(k AS INTEGER) + 1] AS wt
  FROM (SELECT UNNEST(range(0, {_Q65_SPAN + 1})) AS k)
),
contrib AS (
  SELECT r.rate_date + CAST(w.k AS INTEGER) AS target,
         CAST(FLOOR(r.rate * 1000) AS BIGINT) * w.wt AS num,
         w.wt AS wt
  FROM rates r CROSS JOIN wts w
),
agg AS (
  SELECT target, CAST(SUM(num) AS BIGINT) AS num, CAST(SUM(wt) AS BIGINT) AS den
  FROM contrib GROUP BY target
),
bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events),
spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date FROM bounds
)
SELECT s.date, CAST((a.num * 1000) // a.den AS BIGINT) AS ewma_micro
FROM spine s JOIN agg a ON a.target = s.date
ORDER BY s.date
""",
)
def q65_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.ops.windows import date_spine

    e = table(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    spine = date_spine(e, "d", alias="date")
    rates = _sparse_daily_rates(spark, sf_dir).select(
        "rate_date",
        F.floor(F.col("rate") * 1000).cast("long").alias("rate_milli"),
    )
    contrib = rates.select(
        "rate_date",
        "rate_milli",
        F.posexplode(F.lit(_Q65_W)).alias("k", "wt"),
    ).select(
        F.expr("date_add(rate_date, CAST(k AS INT))").alias("target"),
        (F.col("rate_milli") * F.col("wt")).alias("num"),
        "wt",
    )
    agg = contrib.groupBy("target").agg(
        F.sum("num").alias("num"), F.sum("wt").alias("den")
    )
    return (
        spine.join(agg, spine.date == agg.target)
        .select(
            "date",
            F.expr("CAST((num * 1000) DIV den AS BIGINT)").alias("ewma_micro"),
        )
        .orderBy("date")
    )


# ---------------------------------------------------------------------------
# q67 — first-touch / last-touch revenue attribution: each purchase's value
# credits (a) the user's FIRST event ever and (b) the most recent
# NON-purchase event before it; purchases with no predecessor credit
# 'direct'.  The standard marketing-attribution pair, computed with two
# conditional window lookbacks over ONE user-keyed exchange — no
# self-joins, no per-model scans.  Values are decimal-summed (exact,
# order-independent); per-type credit counts are integers.
# ---------------------------------------------------------------------------
@register(
    "q67_touch_attribution",
    oracle=f"""
WITH seq AS (
  -- event-time validity gate (catalog.VALID_EVENT_TS_SQL): attribution
  -- lookbacks order by event time — a NULL-ts purchase has no "before"
  SELECT user_id, event_type, value, ts, event_id,
         FIRST_VALUE(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
  FROM events WHERE {VALID_EVENT_TS_SQL}
),
p AS (
  SELECT COALESCE(first_touch, 'direct') AS first_touch,
         COALESCE(last_touch, 'direct')  AS last_touch,
         CAST(value AS DECIMAL(18,2))    AS v
  FROM seq WHERE event_type = 'purchase'
),
ft AS (
  SELECT first_touch AS touch_type, COUNT(*) AS n, SUM(v) AS rev
  FROM p GROUP BY 1
),
lt AS (
  SELECT last_touch AS touch_type, COUNT(*) AS n, SUM(v) AS rev
  FROM p GROUP BY 1
)
SELECT COALESCE(ft.touch_type, lt.touch_type) AS touch_type,
       CAST(COALESCE(ft.n, 0) AS BIGINT)      AS first_touch_purchases,
       CAST(COALESCE(ft.rev, 0) AS DOUBLE) AS first_touch_revenue,
       CAST(COALESCE(lt.n, 0) AS BIGINT)      AS last_touch_purchases,
       CAST(COALESCE(lt.rev, 0) AS DOUBLE) AS last_touch_revenue
FROM ft FULL OUTER JOIN lt ON ft.touch_type = lt.touch_type
ORDER BY touch_type
""",
)
def q67_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = valid_event_time(table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "event_type",
        "value",
        F.first("event_type").over(w).alias("first_touch"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("last_touch"),
    )
    p = seq.filter(F.col("event_type") == "purchase").select(
        F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
        F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    ft = p.groupBy(F.col("first_touch").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("ft_n"), F.sum("v").alias("ft_rev")
    )
    lt = p.groupBy(F.col("last_touch").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("lt_n"), F.sum("v").alias("lt_rev")
    )
    return (
        ft.join(lt, "touch_type", "full_outer")
        .select(
            "touch_type",
            F.coalesce("ft_n", F.lit(0)).cast("long").alias("first_touch_purchases"),
            F.coalesce("ft_rev", F.lit(0)).cast("decimal(18,2)").cast("double").alias("first_touch_revenue"),
            F.coalesce("lt_n", F.lit(0)).cast("long").alias("last_touch_purchases"),
            F.coalesce("lt_rev", F.lit(0)).cast("decimal(18,2)").cast("double").alias("last_touch_revenue"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# q68 — peak concurrent sessions per day: the interval-overlap counting
# operator (sweep line).  Sessions come from the same 30-min-gap
# sessionization as q27; each session becomes a [start,end] microsecond
# interval, clipped per day, and the day's peak is the max of the running
# (+1 at start / -1 at end) sum.  Scale shape: the sweep is PARTITIONED BY
# DAY — no global total order.  A session spanning k days contributes k
# clipped rows (bounded by session length), so the explode is linear; the
# per-day window is the only ordered pass.  Tie rule: at an identical
# microsecond, starts sort before ends (delta DESC), so touching sessions
# count as concurrent; the per-day MAX of the running sum is invariant to
# ordering within identical (t, delta) groups, making the result
# deterministic across engines.
# ---------------------------------------------------------------------------
_DAY_US = 86_400_000_000


@register(
    "q68_peak_concurrency",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
intervals AS (
  SELECT user_id, sess_id, MIN(ts_us) AS s_us, MAX(ts_us) AS e_us
  FROM sess GROUP BY user_id, sess_id
),
days AS (
  SELECT s_us, e_us,
         unnest(generate_series(s_us // {_DAY_US}, e_us // {_DAY_US})) AS day_idx
  FROM intervals
),
clip AS (
  SELECT day_idx,
         GREATEST(s_us, day_idx * {_DAY_US})        AS cs,
         LEAST(e_us, (day_idx + 1) * {_DAY_US} - 1) AS ce
  FROM days
),
deltas AS (
  SELECT day_idx, cs AS t, 1 AS delta FROM clip
  UNION ALL
  SELECT day_idx, ce AS t, -1 AS delta FROM clip
),
run AS (
  SELECT day_idx, delta,
         SUM(delta) OVER (PARTITION BY day_idx ORDER BY t, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM deltas
)
SELECT CAST(day_idx AS BIGINT)                                   AS day_idx,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(MAX(running) AS BIGINT)                               AS peak_concurrent
FROM run GROUP BY day_idx ORDER BY day_idx
""",
)
def q68_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us")
    )
    days = intervals.select(
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us DIV {_DAY_US}"), F.expr(f"e_us DIV {_DAY_US}")
            )
        ).alias("day_idx"),
    )
    clip = days.select(
        "day_idx",
        F.greatest(F.col("s_us"), F.col("day_idx") * F.lit(_DAY_US)).alias("cs"),
        F.least(
            F.col("e_us"), (F.col("day_idx") + 1) * F.lit(_DAY_US) - 1
        ).alias("ce"),
    )
    # both endpoints in ONE pass (a unionAll of two selects would re-run
    # the whole sessionization chain once per branch)
    deltas = clip.select(
        "day_idx",
        F.explode(
            F.array(
                F.struct(F.col("cs").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("ce").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("_x"),
    ).select("day_idx", F.col("_x.t").alias("t"), F.col("_x.delta").alias("delta"))
    wd = (
        Window.partitionBy("day_idx")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = deltas.withColumn("running", F.sum("delta").over(wd))
    return (
        run.groupBy("day_idx")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sessions"),
            F.max("running").cast("bigint").alias("peak_concurrent"),
        )
        .select(F.col("day_idx").cast("bigint").alias("day_idx"), "n_sessions", "peak_concurrent")
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# q69 — time-weighted average (TWAP) of the event value per user-day: each
# reading holds until the next one in the same user-day (last one holds to
# day end), weights are exact microsecond gaps, the value is floored to
# integer milli-units, and the weighted mean is one integer floor-division
# — hash-exact across engines (all values here are non-negative, so
# Spark's truncating DIV and DuckDB's flooring // agree).  The canonical
# irregular-sampling aggregate for sensor/market data; one user-partitioned
# window + one agg, no global order, no driver collect.
# ---------------------------------------------------------------------------
@register(
    "q69_twap",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) // {_DAY_US} AS day_idx,
         CAST(FLOOR(value * 1000) AS BIGINT) AS val_milli
  FROM events WHERE {_VALUE_DOMAIN_SQL}
),
n AS (
  SELECT user_id, day_idx, val_milli,
         COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id, day_idx
                                    ORDER BY ts_us, event_id),
                  (day_idx + 1) * {_DAY_US}) - ts_us AS wt_us
  FROM e
)
SELECT user_id,
       CAST(day_idx AS BIGINT)                              AS day_idx,
       CAST(COUNT(*) AS BIGINT)                             AS n_events,
       CAST(SUM(val_milli * wt_us) // SUM(wt_us) AS BIGINT) AS twap_milli
FROM n GROUP BY user_id, day_idx ORDER BY user_id, day_idx
""",
)
def q69_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = (
        _valid_value(table(spark, sf_dir, "events"))
        .select(
            "user_id",
            "event_id",
            "value",
            F.timestamp_diff(
                "MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")
            ).alias("ts_us"),
        )
        .withColumn("day_idx", F.expr(f"ts_us DIV {_DAY_US}"))
        .withColumn("val_milli", F.floor(F.col("value") * 1000).cast("bigint"))
    )
    w = Window.partitionBy("user_id", "day_idx").orderBy("ts_us", "event_id")
    n = e.withColumn(
        "wt_us",
        F.coalesce(
            F.lead("ts_us").over(w), (F.col("day_idx") + 1) * F.lit(_DAY_US)
        )
        - F.col("ts_us"),
    )
    return (
        n.groupBy("user_id", "day_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("val_milli") * F.col("wt_us")).alias("_numer"),
            F.sum("wt_us").alias("_denom"),
        )
        .select(
            "user_id",
            F.col("day_idx").cast("bigint").alias("day_idx"),
            "n_events",
            F.expr("CAST(_numer DIV _denom AS BIGINT)").alias("twap_milli"),
        )
        .orderBy("user_id", "day_idx")
    )


# ---------------------------------------------------------------------------
# q71 — SCD Type-2 history reconstruction from a change stream: the purchase
# events are a per-user attribute feed (tier = floor(value/100)); collapsing
# consecutive equal tiers and chaining effective ranges yields the classic
# slowly-changing-dimension shape (version, effective_from, effective_to,
# is_current).  Two windows over ONE user-keyed exchange (lag collapse, then
# lead chaining + row_number share the same partitioning, so Catalyst plans a
# single shuffle); microsecond-integer ranges are hash-exact across engines.
# The batch/query twin of tables/scd.py's incremental scd2_apply (which
# MERGEs the same semantics into a managed table); reference has no SCD
# surface — warehouse-standard extension (Kimball type-2 dimension).
# ---------------------------------------------------------------------------
@register(
    "q71_scd2_tier_history",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value / 100.0) AS BIGINT) AS tier
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id, ts_us, tier, LAG(tier) OVER w AS prev_tier
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
chg AS (
  SELECT user_id, event_id, ts_us, tier FROM c
  WHERE prev_tier IS NULL OR prev_tier <> tier
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
       tier,
       ts_us AS eff_from_us,
       LEAD(ts_us) OVER w2 AS eff_to_us,
       (LEAD(ts_us) OVER w2 IS NULL) AS is_current
FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, version
""",
)
def q71_scd2_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.timestamp_diff(
                "MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")
            ).alias("ts_us"),
            F.floor(F.col("value") / F.lit(100.0)).cast("bigint").alias("tier"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = (
        e.withColumn("prev_tier", F.lag("tier").over(w))
        .filter(F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier")))
        .drop("prev_tier")
    )
    return (
        chg.select(
            "user_id",
            F.row_number().over(w).cast("bigint").alias("version"),
            "tier",
            F.col("ts_us").alias("eff_from_us"),
            F.lead("ts_us").over(w).alias("eff_to_us"),
            F.lead("ts_us").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# q74 — point-in-time attribute enrichment (the consumption side of q71's
# SCD2 chain): every click event is attributed to the user's tier AS OF the
# click instant (tier = last purchase-derived value at ts <= click ts, the
# half-open [eff_from, eff_to) convention).  Implemented WITHOUT a range
# join: changes and clicks union into one stream and a single user-keyed
# window forward-fills the tier (last_value IGNORE NULLS) — one shuffle
# total, the scalable shape for temporal enrichment (an interval join would
# shuffle both sides AND fan out per-range probes; q19/q34 cover that
# family).  Ties at the same microsecond resolve change-first, matching
# q71's "new version valid at its own eff_from".  Value sums in exact
# integer milli-units.
# ---------------------------------------------------------------------------
@register(
    "q74_pit_tier_enrichment",
    oracle=f"""
WITH s AS (
  -- measurement-domain gate: see _VALUE_DOMAIN (r8; an inf click value
  -- otherwise overflows the milli-quantization cast in both engines)
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_change,
         CASE WHEN event_type = 'purchase'
              THEN CAST(FLOOR(value / 100.0) AS BIGINT) END AS tier,
         CASE WHEN event_type = 'click'
              THEN CAST(FLOOR(value * 1000) AS BIGINT) END AS val_milli
  -- event-time validity gate (catalog.VALID_EVENT_TS_SQL): a NULL-ts
  -- purchase would open a tier version at an unplaceable instant
  FROM events WHERE event_type IN ('purchase', 'click') AND {_VALUE_DOMAIN_SQL}
    AND {VALID_EVENT_TS_SQL}
),
f AS (
  SELECT user_id, is_change, val_milli,
         LAST_VALUE(tier IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, is_change DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tier_at
  FROM s
)
SELECT tier_at,
       CAST(COUNT(*) AS BIGINT)        AS n_clicks,
       CAST(SUM(val_milli) AS BIGINT)  AS total_value_milli
FROM f WHERE is_change = 0
GROUP BY tier_at ORDER BY tier_at NULLS FIRST
""",
)
def q74_pit_tier_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = (
        _valid_value(valid_event_time(table(spark, sf_dir, "events")))
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "event_id",
            F.timestamp_diff(
                "MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")
            ).alias("t"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
                "is_change"
            ),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") / F.lit(100.0)).cast("bigint"),
            ).alias("tier"),
            F.when(
                F.col("event_type") == "click",
                F.floor(F.col("value") * 1000).cast("bigint"),
            ).alias("val_milli"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_change").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = e.withColumn("tier_at", F.last("tier", ignorenulls=True).over(w))
    return (
        f.filter(F.col("is_change") == 0)
        .groupBy("tier_at")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            F.sum("val_milli").cast("bigint").alias("total_value_milli"),
        )
        .orderBy(F.col("tier_at").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q76 — running DISTINCT user count per event type by day (cumulative
# audience reach).  COUNT(DISTINCT) OVER a running frame is unsupported in
# Spark (and blows memory where engines do allow it); the scalable rewrite
# is first-occurrence flagging: row_number()==1 per (type, user) marks each
# user's first day, then a running SUM of daily first-appearances gives the
# exact cumulative distinct count — two window passes over ONE (type-keyed)
# exchange, state O(1) per row instead of O(distinct set).  The oracle uses
# the identical rewrite (DuckDB also rejects DISTINCT in running windows).
# ---------------------------------------------------------------------------
@register(
    "q76_running_distinct_users",
    oracle="""
WITH firsts AS (
  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY event_type, user_id
),
daily AS (
  SELECT event_type, first_day AS day, COUNT(*) AS new_users
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, day,
       CAST(new_users AS BIGINT) AS new_users,
       -- NULLS FIRST: engine-wide null-ordering convention (r8) — an
       -- all-NULL-timestamp cohort sorts before every dated cohort
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day NULLS FIRST
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_distinct_users
FROM daily ORDER BY event_type, day
""",
)
def q76_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = firsts.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily.select(
            "event_type",
            "day",
            F.col("new_users").cast("bigint").alias("new_users"),
            F.sum("new_users").over(w).cast("bigint").alias(
                "cumulative_distinct_users"
            ),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q77 — top in-session event-type trigrams (path mining: "what do users do
# in sequence?").  Sessionize by the 30-minute gap rule (q27's sessions),
# order within session, then each event contributes the trigram of itself
# and the next two events in the SAME session — lead() windows over one
# user-keyed exchange, no self-joins (the naive 3-way sequence join is
# quadratic on hot users).  The path-mining complement of q61's pairwise
# transition matrix.  Top-20 with a trigram tie-break.
# ---------------------------------------------------------------------------
@register(
    "q77_top_event_trigrams",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
tri AS (
  SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
                   || '>' || LEAD(event_type, 2) OVER w2 AS trigram
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, sess_id ORDER BY ts_us, event_id)
)
SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n
FROM tri WHERE trigram IS NOT NULL
GROUP BY trigram ORDER BY n DESC, trigram LIMIT 20
""",
)
def q77_top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")).alias(
            "ts_us"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        e.withColumn(
            "new_sess",
            F.when(
                F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1
            ).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    w2 = Window.partitionBy("user_id", "sess_id").orderBy("ts_us", "event_id")
    tri = sess.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w2),
            F.lead("event_type", 2).over(w2),
        ).alias("trigram"),
        F.lead("event_type", 2).over(w2).alias("_third"),
    ).filter(F.col("_third").isNotNull())
    return (
        tri.groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q78 — longest consecutive-active-day streak per user (gaps-and-islands).
#
# The classic sessionization-by-calendar pattern the reference's window
# inventory (W1-W3) stops short of: distinct active days -> row_number ->
# anchor = day - row_number (constant within a consecutive run) -> group.
# One exchange on user_id (distinct + window + agg all share the key);
# per-user state is a row counter, so skew costs sort-of-partition, not
# memory.  All-integer output: hash-exact cross-engine.
# ---------------------------------------------------------------------------
@register(
    "q78_longest_daily_streak",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
runs AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
           AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, anchor, COUNT(*) AS len FROM runs GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT)  AS longest_streak,
       CAST(SUM(len) AS BIGINT)  AS active_days,
       CAST(COUNT(*) AS BIGINT)  AS n_streaks
FROM streaks GROUP BY user_id ORDER BY user_id
""",
)
def q78_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    runs = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = runs.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("longest_streak"),
            F.sum("len").cast("bigint").alias("active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q79 — ordered funnel conversion (view -> click -> purchase) with per-step
# time windows: first view, then first click within 3 days of it, then first
# purchase within 7 days of that click.  The funnel population (the 'view'
# step's denominator) is users with at least one funnel-step event — the
# filter runs before counting, in both engines.
#
# No self-joins: three conditional-min window passes over the SAME user
# partition — Catalyst plans one Exchange feeding sequential Window
# operators, so the funnel costs a single shuffle regardless of step count
# (the per-step self-join formulation shuffles once per step and explodes
# under skew).  Timestamps compare as exact microsecond integers;
# conversion rates are exact integer basis points (10000*n DIV prev), so
# the result is hash-identical cross-engine (no float division).
# ---------------------------------------------------------------------------
_FUNNEL_DAY_US = 86_400_000_000


@register(
    "q79_funnel_conversion",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
              OVER (PARTITION BY user_id) AS t_view
  FROM e
),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us >= t_view
                      AND ts_us <= t_view + 3 * {_FUNNEL_DAY_US}
                     THEN ts_us END)
              OVER (PARTITION BY user_id) AS t_click
  FROM s1
),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us >= t_click
                      AND ts_us <= t_click + 7 * {_FUNNEL_DAY_US}
                     THEN ts_us END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
),
per_user AS (
  SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
         MAX(t_purchase) AS t_purchase
  FROM s3 GROUP BY user_id
),
counts AS (
  SELECT COUNT(*) AS n_users,
         COUNT(t_view) AS n_view,
         COUNT(t_click) AS n_click,
         COUNT(t_purchase) AS n_purchase
  FROM per_user
)
SELECT step, users, conv_from_prev_bp, conv_from_first_bp FROM (
  SELECT 1 AS ord, 'view' AS step, CAST(n_view AS BIGINT) AS users,
         CAST(CASE WHEN n_users > 0 THEN (10000 * n_view) // n_users END AS BIGINT)
           AS conv_from_prev_bp,
         CAST(10000 AS BIGINT) AS conv_from_first_bp
  FROM counts
  UNION ALL
  SELECT 2, 'click', CAST(n_click AS BIGINT),
         CAST(CASE WHEN n_view > 0 THEN (10000 * n_click) // n_view END AS BIGINT),
         CAST(CASE WHEN n_view > 0 THEN (10000 * n_click) // n_view END AS BIGINT)
  FROM counts
  UNION ALL
  SELECT 3, 'purchase', CAST(n_purchase AS BIGINT),
         CAST(CASE WHEN n_click > 0 THEN (10000 * n_purchase) // n_click END AS BIGINT),
         CAST(CASE WHEN n_view > 0 THEN (10000 * n_purchase) // n_view END AS BIGINT)
  FROM counts
) ORDER BY ord
""",
)
def q79_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")).alias(
                "ts_us"
            ),
        )
    )
    wu = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(wu),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts_us") >= F.col("t_view"))
                & (F.col("ts_us") <= F.col("t_view") + 3 * _FUNNEL_DAY_US),
                F.col("ts_us"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_us") >= F.col("t_click"))
                & (F.col("ts_us") <= F.col("t_click") + 7 * _FUNNEL_DAY_US),
                F.col("ts_us"),
            )
        ).over(wu),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )

    # ONE stack over the single counts row — a union of three selects would
    # recompute the whole events pipeline (scan + shuffle) once per step
    def _bp(num: str, den: str) -> str:  # exact integer basis points
        return (f"CAST(CASE WHEN {den} > 0 THEN (10000 * {num}) div {den} END"
                f" AS BIGINT)")

    return (
        counts.select(
            F.expr(
                "stack(3,"
                f" 1, 'view', CAST(n_view AS BIGINT),"
                f" {_bp('n_view', 'n_users')}, CAST(10000 AS BIGINT),"
                f" 2, 'click', CAST(n_click AS BIGINT),"
                f" {_bp('n_click', 'n_view')}, {_bp('n_click', 'n_view')},"
                f" 3, 'purchase', CAST(n_purchase AS BIGINT),"
                f" {_bp('n_purchase', 'n_click')}, {_bp('n_purchase', 'n_view')}"
                ") as (ord, step, users, conv_from_prev_bp, conv_from_first_bp)"
            )
        )
        .orderBy("ord")
        .select("step", "users", "conv_from_prev_bp", "conv_from_first_bp")
    )


# ---------------------------------------------------------------------------
# q80 — session pattern matching (MATCH_RECOGNIZE analog).
#
# SQL-standard row pattern recognition (MATCH_RECOGNIZE) has no Spark
# implementation; the composition that replaces it at scale: sessionize ->
# per-session ordered event string (one letter per event) -> regex per
# pattern.  Each session's full history compresses to a short string BEFORE
# matching, so patterns evaluate on O(sessions) rows, not O(events), and
# the only shuffles are the user_id window + the (user, session) aggregate
# that share a prefix key.  Letters: v(iew) c(lick) p(urchase) s(ignup)
# e(rror).  Patterns: browse_to_buy = v.*c.*p (a view later followed by a
# click then a purchase), bounce = single-event session, error_riddled =
# >= 3 errors.  Output shares are exact integer basis points.
# ---------------------------------------------------------------------------
@register(
    "q80_session_pattern_match",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, substr(event_type, 1, 1) AS letter,
         epoch_us(ts) AS ts_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
strings AS (
  SELECT user_id, sess_id,
         string_agg(letter, '' ORDER BY ts_us, event_id) AS seq
  FROM sess GROUP BY user_id, sess_id
),
counts AS (
  SELECT COUNT(*) AS n_sessions,
         SUM(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END) AS n_buy,
         SUM(CASE WHEN length(seq) = 1 THEN 1 ELSE 0 END) AS n_bounce,
         SUM(CASE WHEN regexp_matches(seq, '(e.*){3}') THEN 1 ELSE 0 END) AS n_err
  FROM strings
)
SELECT pattern, n_sessions, matched, share_bp FROM (
  SELECT 1 AS ord, 'browse_to_buy' AS pattern, CAST(n_sessions AS BIGINT) AS n_sessions,
         CAST(n_buy AS BIGINT) AS matched,
         CAST((10000 * n_buy) // n_sessions AS BIGINT) AS share_bp FROM counts
  UNION ALL
  SELECT 2, 'bounce', CAST(n_sessions AS BIGINT), CAST(n_bounce AS BIGINT),
         CAST((10000 * n_bounce) // n_sessions AS BIGINT) FROM counts
  UNION ALL
  SELECT 3, 'error_riddled', CAST(n_sessions AS BIGINT), CAST(n_err AS BIGINT),
         CAST((10000 * n_err) // n_sessions AS BIGINT) FROM counts
) ORDER BY ord
""",
)
def q80_session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.substring("event_type", 1, 1).alias("letter"),
        F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")).alias(
            "ts_us"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = e.withColumn(
        "new_sess",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # ordered per-session string: sort_array over (ts_us, event_id, letter)
    # structs is deterministic and avoids relying on collect_list order
    strings = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts_us", "event_id", "letter"))
                    ),
                    lambda s: s["letter"],
                ),
                "",
            ).alias("seq")
        )
    )
    counts = strings.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("seq").rlike("v.*c.*p"), 1).otherwise(0)).alias("n_buy"),
        F.sum(F.when(F.length("seq") == 1, 1).otherwise(0)).alias("n_bounce"),
        F.sum(F.when(F.col("seq").rlike("(e.*){3}"), 1).otherwise(0)).alias("n_err"),
    )

    def _row(num: str) -> str:
        return f"CAST((10000 * {num}) div n_sessions AS BIGINT)"

    return (
        counts.select(
            F.expr(
                "stack(3,"
                f" 1, 'browse_to_buy', CAST(n_sessions AS BIGINT),"
                f" CAST(n_buy AS BIGINT), {_row('n_buy')},"
                f" 2, 'bounce', CAST(n_sessions AS BIGINT),"
                f" CAST(n_bounce AS BIGINT), {_row('n_bounce')},"
                f" 3, 'error_riddled', CAST(n_sessions AS BIGINT),"
                f" CAST(n_err AS BIGINT), {_row('n_err')}"
                ") as (ord, pattern, n_sessions, matched, share_bp)"
            )
        )
        .orderBy("ord")
        .select("pattern", "n_sessions", "matched", "share_bp")
    )


# ---------------------------------------------------------------------------
# q81 — A/B experiment readout (online-experimentation analytics): users
# are hash-assigned 50/50 to control/treatment (the s01 content-addressed
# bucket — assignment is a pure function of user_id, so it is stable
# across reruns and resharding, exactly how real experiment systems
# bucket), conversion = user had >= 1 purchase event; the readout is ONE
# row with per-arm user counts, converters, conversion rates in bp, and
# the relative lift as an exact integer cross-multiplication
# (conv_t/n_t)/(conv_c/n_c) in bp — no float division anywhere.  Revenue
# per user and arm is a decimal-exact sum floored to milli-units.
#
# Plan: one groupBy(user_id) collapses events to per-user flags (the only
# fact-sized shuffle), then a single global conditional aggregate — the
# readout never joins arms, so there is no skew surface.
# ---------------------------------------------------------------------------
def _q81_oracle() -> str:
    from delta_lake_spark.functions.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("user_id", "ab")
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN {bucket} < 5000 THEN 'treatment' ELSE 'control' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS revenue
  FROM events
  GROUP BY user_id
),
raw AS (
  SELECT
    SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS n_c,
    SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS n_t,
    SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END) AS conv_c,
    SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END) AS conv_t,
    SUM(CASE WHEN arm = 'control' THEN revenue ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev_c,
    SUM(CASE WHEN arm = 'treatment' THEN revenue ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev_t
  FROM per_user
)
SELECT CAST(n_c AS BIGINT) AS n_control,
       CAST(n_t AS BIGINT) AS n_treatment,
       CAST(conv_c AS BIGINT) AS conv_control,
       CAST(conv_t AS BIGINT) AS conv_treatment,
       CAST((conv_c * 10000) // n_c AS BIGINT) AS conv_control_bp,
       CAST((conv_t * 10000) // n_t AS BIGINT) AS conv_treatment_bp,
       CAST((conv_t * n_c * 10000) // (n_t * conv_c) AS BIGINT) AS lift_bp,
       CAST(FLOOR(rev_c * 1000 / n_c) AS BIGINT) AS rev_milli_control,
       CAST(FLOOR(rev_t * 1000 / n_t) AS BIGINT) AS rev_milli_treatment
FROM raw
"""


@register("q81_ab_experiment_readout", oracle=_q81_oracle())
def q81_ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.sampling import hash_bucket

    e = table(spark, sf_dir, "events")
    arm = F.when(hash_bucket("user_id", "ab") < 5000, "treatment").otherwise(
        "control"
    )
    dec0 = F.lit(0).cast("decimal(18,2)")
    per_user = e.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(dec0)
        ).alias("revenue"),
    )
    raw = per_user.agg(
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0)).alias("n_t"),
        F.sum(
            F.when(F.col("arm") == "control", F.col("converted")).otherwise(0)
        ).alias("conv_c"),
        F.sum(
            F.when(F.col("arm") == "treatment", F.col("converted")).otherwise(0)
        ).alias("conv_t"),
        F.sum(
            F.when(F.col("arm") == "control", F.col("revenue")).otherwise(dec0)
        ).alias("rev_c"),
        F.sum(
            F.when(F.col("arm") == "treatment", F.col("revenue")).otherwise(dec0)
        ).alias("rev_t"),
    )
    return raw.selectExpr(
        "CAST(n_c AS BIGINT) AS n_control",
        "CAST(n_t AS BIGINT) AS n_treatment",
        "CAST(conv_c AS BIGINT) AS conv_control",
        "CAST(conv_t AS BIGINT) AS conv_treatment",
        "CAST((conv_c * 10000) div n_c AS BIGINT) AS conv_control_bp",
        "CAST((conv_t * 10000) div n_t AS BIGINT) AS conv_treatment_bp",
        "CAST((conv_t * n_c * 10000) div (n_t * conv_c) AS BIGINT) AS lift_bp",
        "CAST(FLOOR(rev_c * 1000 / n_c) AS BIGINT) AS rev_milli_control",
        "CAST(FLOOR(rev_t * 1000 / n_t) AS BIGINT) AS rev_milli_treatment",
    )


# ---------------------------------------------------------------------------
# q82 — per-user activity coverage via INTERVAL UNION (coalescing overlapping
# intervals): each event projects a [ts, ts+5min) activity interval; islands
# of transitively-overlapping intervals merge; output is per-user island
# count + total covered time.  The classic interval-coalescing operator
# (downtime/coverage/billing-dedup) that q68's sweep-line counts complements:
# q68 counts concurrent intervals, q82 merges them.
#
# Shape: ONE user-keyed exchange shared by both window passes (island
# detection = running MAX of interval end over preceding rows; island id =
# running sum of new-island flags) and the final per-island aggregate.
# Nothing global, nothing quadratic; microsecond integers end to end.
# Determinism: BOTH window passes (flag + island-id running sum) order by
# the same unique key (s_us, event_id) in Spark and the oracle alike —
# ordering the running sum by the non-unique (s_us, e_us) would let a
# tie-group whose flag was computed under the event_id order split across
# islands in an engine-arbitrary way (ADVICE r4, medium).
# ---------------------------------------------------------------------------
_PAD_US = 300_000_000  # 5-minute activity padding per event


@register(
    "q82_interval_union_coverage",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS s_us, epoch_us(ts) + {_PAD_US} AS e_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s_us, e_us,
         CASE WHEN s_us > MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM e
),
islands AS (
  SELECT user_id, s_us, e_us,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
),
merged AS (
  SELECT user_id, island_id, MIN(s_us) AS cs, MAX(e_us) AS ce, COUNT(*) AS n_ev
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)      AS n_islands,
       CAST(SUM(ce - cs) AS BIGINT)  AS covered_us,
       CAST(SUM(n_ev) AS BIGINT)     AS n_events
FROM merged GROUP BY user_id ORDER BY user_id
""",
)
def q82_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ), F.col("ts")).alias("s_us"),
    ).withColumn("e_us", F.col("s_us") + F.lit(_PAD_US))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.withColumn(
        "new_island",
        F.when(F.col("s_us") > F.max("e_us").over(w_prev), 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s_us").alias("cs"),
        F.max("e_us").alias("ce"),
        F.count("*").alias("n_ev"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum(F.col("ce") - F.col("cs")).cast("bigint").alias("covered_us"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q83 — robust outlier detection per event type: median / MAD (median
# absolute deviation) fences instead of mean/stddev — the
# production-monitoring robust statistic (3-MAD rule) that survives the very
# outliers it hunts.  All comparisons are EXACT integers: values become
# cents, medians live in DOUBLED cent units (interpolated medians of
# integers are exact halves, so 2x median is integer — both engines
# interpolate identically at p=0.5), and the fence test cross-multiplies
# (2*dev2 > 3*mad2  <=>  |v - med| > 3*MAD) so no division ever happens.
#
# Shape: two type-keyed aggregates (median, then MAD of deviations — MAD is
# inherently two-pass) with the bounded per-type medians broadcast back;
# event_type arity is fixed, so both joins stay BroadcastHashJoin at any SF.
# ---------------------------------------------------------------------------
@register(
    "q83_mad_outliers",
    oracle=f"""
WITH e AS (
  -- measurement-domain gate: see _VALUE_DOMAIN (r8)
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
  WHERE {_VALUE_DOMAIN_SQL}
),
med AS (
  SELECT event_type, CAST(2 * quantile_cont(c, 0.5) AS BIGINT) AS med2
  FROM e GROUP BY event_type
),
dev AS (
  SELECT e.event_type, ABS(2 * c - med2) AS dev2, med2
  FROM e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad2
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT)                                   AS n,
       MIN(d.med2)                                                AS med_2c,
       MIN(m.mad2)                                                AS mad_2c,
       CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * m.mad2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST((SUM(CASE WHEN 2 * d.dev2 > 3 * m.mad2 THEN 1 ELSE 0 END) * 10000) // COUNT(*) AS BIGINT) AS outlier_bp
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
""",
)
def q83_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _valid_value(table(spark, sf_dir, "events")).select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    med = e.groupBy("event_type").agg(
        (2 * F.percentile("c", F.lit(0.5))).cast("bigint").alias("med2")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("c") - F.col("med2")).alias("dev2"), "med2"
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.percentile("dev2", F.lit(0.5))).cast("bigint").alias("mad2")
    )
    out = F.when(2 * F.col("dev2") > 3 * F.col("mad2"), 1).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("med2").alias("med_2c"),
            F.min("mad2").alias("mad_2c"),
            F.sum(out).cast("bigint").alias("n_outliers"),
            F.expr(
                "CAST((SUM(CASE WHEN 2 * dev2 > 3 * mad2 THEN 1 ELSE 0 END) * 10000)"
                " div COUNT(*) AS BIGINT)"
            ).alias("outlier_bp"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q86 — seasonal (day-of-week) volume deviation: per (event_type, weekday),
# the weekly event-count baseline and how many weeks deviated more than 50%
# from it — the seasonality-aware volume monitor (a Monday dip is normal,
# a 60%-down Monday is an incident), complementing q62's distribution drift
# and q83's value outliers.  Weekday and week index derive from the integer
# epoch-day (day 0 = Thursday, so (day+3) keys Monday-start weeks) — no
# engine date-function variance.  Anomaly test is cross-multiplied exact
# integers: |w*n_weeks - total| * 2 > total  <=>  |w - avg| > avg/2.
#
# Shape: one (type, dow, week)-keyed count, a (type, dow) re-aggregate of
# it, and a same-key join back — the q84 re-aggregation pattern; output
# arity is bounded (types x 7).
# ---------------------------------------------------------------------------
@register(
    "q86_seasonal_deviation",
    oracle=f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // {_DAY_US} + 3) % 7  AS dow,
         (epoch_us(ts) // {_DAY_US} + 3) // 7 AS week
  FROM events
),
wk AS (
  SELECT event_type, dow, week, COUNT(*) AS w
  FROM e GROUP BY event_type, dow, week
),
base AS (
  SELECT event_type, dow, COUNT(*) AS n_weeks, SUM(w) AS total
  FROM wk GROUP BY event_type, dow
)
SELECT b.event_type,
       CAST(b.dow AS BIGINT)     AS dow,
       CAST(b.n_weeks AS BIGINT) AS n_weeks,
       CAST(b.total AS BIGINT)   AS total_events,
       CAST((b.total * 1000) // b.n_weeks AS BIGINT) AS avg_weekly_milli,
       CAST(SUM(CASE WHEN ABS(wk.w * b.n_weeks - b.total) * 2 > b.total
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_weeks
FROM wk JOIN base b USING (event_type, dow)
GROUP BY b.event_type, b.dow, b.n_weeks, b.total
ORDER BY b.event_type, dow
""",
)
def q86_seasonal_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"(timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts) div {_DAY_US} + 3) % 7").alias("dow"),
        F.expr(f"(timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts) div {_DAY_US} + 3) div 7").alias("week"),
    )
    wk = e.groupBy("event_type", "dow", "week").agg(F.count("*").alias("w"))
    base = wk.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_weeks"), F.sum("w").alias("total")
    )
    anom = F.when(
        F.abs(F.col("w") * F.col("n_weeks") - F.col("total")) * 2 > F.col("total"), 1
    ).otherwise(0)
    return (
        wk.join(base, ["event_type", "dow"])
        .groupBy("event_type", "dow", "n_weeks", "total")
        .agg(F.sum(anom).cast("bigint").alias("n_anomalous_weeks"))
        .select(
            "event_type",
            F.col("dow").cast("bigint").alias("dow"),
            F.col("n_weeks").cast("bigint").alias("n_weeks"),
            F.col("total").cast("bigint").alias("total_events"),
            F.expr("CAST((total * 1000) div n_weeks AS BIGINT)").alias(
                "avg_weekly_milli"
            ),
            "n_anomalous_weeks",
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# q87 — rolling 7-day distinct active users (DAU / WAU / stickiness): the
# sliding-window COUNT(DISTINCT) no engine supports natively at scale.
# q76's first-occurrence trick only works for RUNNING (unbounded) frames;
# for a sliding frame the exact rewrite is coverage explode: each distinct
# (user, day) contributes the user to the 7 report days it covers, a second
# distinct collapses multi-active users within a window, and a plain count
# per report day is exact.  Fan-out is a CONSTANT x7 of the deduped
# (user, day) set — linear, partition-friendly, no per-day subqueries.
# DAU rides along as a max-flag of the offset-0 row, and DAU/WAU basis
# points give the classic stickiness ratio.
#
# Report days clip to the observed [min_day, max_day] range (broadcast
# 1-row scalar), so every reported window is fully inside the data.
# ---------------------------------------------------------------------------
@register(
    "q87_rolling_active_users",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day_idx FROM events
),
bounds AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM ud),
cover AS (
  SELECT DISTINCT user_id, r AS report_day,
         MAX(CASE WHEN r = day_idx THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, r) AS is_today
  FROM ud, bounds, LATERAL unnest(generate_series(day_idx, day_idx + 6)) AS t(r)
  WHERE r BETWEEN lo AND hi
)
SELECT CAST(report_day AS BIGINT) AS day_idx,
       CAST(SUM(is_today) AS BIGINT) AS dau,
       CAST(COUNT(*) AS BIGINT)      AS wau,
       CAST((SUM(is_today) * 10000) // COUNT(*) AS BIGINT) AS stickiness_bp
FROM cover
GROUP BY report_day
ORDER BY day_idx
""",
)
def q87_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.catalog import EPOCH_NTZ

    ud = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts) div {_DAY_US}"
            ).alias("day_idx"),
        )
        .distinct()
    )
    bounds = ud.agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
    cover = (
        ud.select(
            "user_id",
            "day_idx",
            F.explode(
                F.sequence(F.col("day_idx"), F.col("day_idx") + 6)
            ).alias("report_day"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("report_day").between(F.col("lo"), F.col("hi")))
        .groupBy("user_id", "report_day")
        .agg(
            F.max(
                F.when(F.col("report_day") == F.col("day_idx"), 1).otherwise(0)
            ).alias("is_today")
        )
    )
    return (
        cover.groupBy("report_day")
        .agg(
            F.sum("is_today").cast("bigint").alias("dau"),
            F.count("*").cast("bigint").alias("wau"),
            F.expr("CAST((SUM(is_today) * 10000) div COUNT(*) AS BIGINT)").alias(
                "stickiness_bp"
            ),
        )
        .select(F.col("report_day").cast("bigint").alias("day_idx"), "dau", "wau", "stickiness_bp")
        .orderBy("day_idx")
    )
