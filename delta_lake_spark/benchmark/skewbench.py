"""Skewed-corpus benchmark section (VERDICT r3 task 6): measure
``ops.skew.salted_join`` / ``two_phase_agg`` against plain plans on a
zipf-skewed replication of the events table.

Corpus (generated once, cached under ``benchdata/skew``):

- ``events_skew`` — the sf0.1 events table replicated ``copies`` times
  (real payloads), with ``user_id`` re-drawn from a power-law ("zipf-ish")
  distribution over ``n_users``: ``floor(n_users * pow(rand(seed), 8))``.
  The exponent concentrates ~25% of ALL rows on user 0 — one shuffle
  partition carrying a quarter of the fact table, the classic straggler.
- ``users`` — a ``n_users``-row dimension with a sha256 payload (~25 MB
  materialized), past the default broadcast threshold: the regime where a
  skewed shuffle join actually happens at cluster scale.  Sizing matters:
  salting replicates the dimension ``n_salts`` times, so the demo holds
  the realistic shape fact >> dim (5M facts vs 300K users) — with a dim
  comparable to the fact, replication cost swamps the straggler win and
  plain SMJ is the right plan.

Measurements (all under ``autoBroadcastJoinThreshold=-1`` to pin the
shuffle-join regime; restored afterwards):

- ``join_plain_aqe``      — sort-merge join, AQE skew-split ON (Spark's
  own mitigation; kept honest — at local scale it often competes well).
- ``join_plain_noskewfix``— the same join with AQE skew handling OFF: the
  pre-AQE regime, and what any non-SMJ skewed shuffle still suffers.
- ``join_salted``         — ``salted_join`` (8 salts), AQE skew OFF:
  the explicit mitigation must beat the unmitigated plan on its own.
- ``agg_plain`` vs ``agg_two_phase`` — groupBy(user_id) sum/count.  Spark's
  hash aggregate already partial-combines per map task, so plain is
  expected to hold up; reported regardless so the trade-off is measured,
  not guessed.

Every timed variant's result is reduced to the same checksum aggregate and
compared: a mitigation that changes the answer is a bug, not a win.
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.ops.skew import (
    heavy_hitters,
    hot_key_salted_join,
    salted_join,
    two_phase_agg,
)

_SEED = 42


def _generate(
    spark: SparkSession,
    base_dir: str,
    data_dir: str,
    copies: int,
    n_users: int,
    exponent: int = 16,
) -> dict[str, Any]:
    marker = os.path.join(data_dir, "_SKEW_OK")
    meta = {"copies": copies, "n_users": n_users, "exponent": exponent}
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == repr(sorted(meta.items())):
                return {"generated": False, **meta}
    t0 = time.perf_counter()
    os.makedirs(data_dir, exist_ok=True)

    ev = table(spark, base_dir, "events")
    wide = ev.crossJoin(spark.range(copies).withColumnRenamed("id", "_copy"))
    # power-law user id: P(user 0) = (1/n_users)^(1/exponent) — ~45% of all
    # rows land on user 0 at exponent 16 / 300K users, a decisive straggler.
    # rand(seed) over a fixed repartition count keeps the draw deterministic.
    skewed = (
        wide.repartition(32, "event_id", "_copy")
        .withColumn(
            "user_id",
            F.floor(
                F.lit(n_users) * F.pow(F.rand(_SEED), F.lit(exponent))
            ).cast("long"),
        )
        .withColumn(
            "event_id",
            F.col("event_id") + F.col("_copy") * F.lit(10_000_000),
        )
        .drop("_copy")
    )
    skewed.write.mode("overwrite").parquet(os.path.join(data_dir, "events_skew.parquet"))

    users = (
        spark.range(0, n_users, 1, 32)
        .withColumnRenamed("id", "user_id")
        .withColumn("segment", F.concat(F.lit("seg_"), F.pmod("user_id", F.lit(40))))
        .withColumn("signup_tag", F.sha2(F.col("user_id").cast("string"), 256))
    )
    users.write.mode("overwrite").parquet(os.path.join(data_dir, "users.parquet"))

    with open(marker, "w") as fh:
        fh.write(repr(sorted(meta.items())))
    return {"generated": True, "generate_sec": round(time.perf_counter() - t0, 3), **meta}


def _checksum(df: DataFrame) -> tuple:
    """Order-independent exact reduction of a joined/aggregated result."""
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def _timed(fn, runs: int = 2) -> tuple[float, Any]:
    """Best-of-``runs`` wall time (the warm figure every other bench section
    reports) plus the result of the last run."""
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), out


def run_skew_bench(
    spark: SparkSession,
    base_dir: str,
    data_dir: str,
    copies: int = 50,
    n_users: int = 300_000,
) -> dict[str, Any]:
    out: dict[str, Any] = _generate(spark, base_dir, data_dir, copies, n_users)

    ev = spark.read.parquet(os.path.join(data_dir, "events_skew.parquet"))
    users = spark.read.parquet(os.path.join(data_dir, "users.parquet"))
    # warm the page cache / parquet footers so variant order doesn't bias
    ev.count(), users.count()

    hot = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).first()
    )
    n_rows = ev.count()
    out["fact_rows"] = n_rows
    out["hot_key_share"] = round(hot["count"] / n_rows, 4)

    def join_plain() -> DataFrame:
        return ev.join(users, "user_id").select(
            "user_id", "event_type", "value", "segment"
        )

    def join_salted() -> DataFrame:
        return salted_join(ev, users, ["user_id"]).select(
            "user_id", "event_type", "value", "segment"
        )

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    try:
        # pin the skewed-shuffle regime: at 100 TB this dim does not
        # broadcast, locally it would — measuring a broadcast join would
        # benchmark nothing
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_aqe, sum_aqe = _timed(lambda: _checksum(join_plain()))

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_plain, sum_plain = _timed(lambda: _checksum(join_plain()))
        t_salt, sum_salt = _timed(lambda: _checksum(join_salted()))

        # heavy-hitter-only salting: detection (sampled) timed separately —
        # at scale it's amortized across runs on a drifting key distribution
        t0 = time.perf_counter()
        hot = heavy_hitters(ev, ["user_id"], min_share=0.01, sample_fraction=0.01)
        out["hot_detect_sec"] = round(time.perf_counter() - t0, 3)
        out["hot_detected_keys"] = len(hot)

        def join_hot_salted() -> DataFrame:
            return hot_key_salted_join(
                ev, users, ["user_id"], hot_keys=hot, n_salts=16
            ).select("user_id", "event_type", "value", "segment")

        t_hot, sum_hot = _timed(lambda: _checksum(join_hot_salted()))

        out["join_plain_aqe_sec"] = t_aqe
        out["join_plain_noskewfix_sec"] = t_plain
        out["join_salted_sec"] = t_salt
        out["join_hot_salted_sec"] = t_hot
        out["join_results_match"] = sum_aqe == sum_plain == sum_salt == sum_hot
        out["join_salted_speedup_vs_noskewfix"] = (
            round(t_plain / t_salt, 2) if t_salt else None
        )
        out["join_hot_salted_speedup_vs_noskewfix"] = (
            round(t_plain / t_hot, 2) if t_hot else None
        )

        # decimal sums: exact and order-independent, so plain and two-phase
        # results can be compared bit-for-bit (double sums would differ by
        # accumulation order, which is what the salt changes)
        ev_dec = ev.withColumn("value_dec", F.col("value").cast("decimal(18,6)"))
        aggs = {"total_value": ("value_dec", "sum"), "n_events": ("value_dec", "count")}

        def agg_plain() -> DataFrame:
            return ev_dec.groupBy("user_id").agg(
                F.sum("value_dec").alias("total_value"),
                F.count("value_dec").alias("n_events"),
            )

        t_ap, sum_ap = _timed(lambda: _checksum(agg_plain()))
        t_a2, sum_a2 = _timed(
            lambda: _checksum(two_phase_agg(ev_dec, ["user_id"], aggs, n_salts=16))
        )
        out["agg_plain_sec"] = t_ap
        out["agg_two_phase_sec"] = t_a2
        out["agg_results_match"] = sum_ap == sum_a2
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    return out
