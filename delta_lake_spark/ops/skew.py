"""Skew-mitigation utilities for joins and aggregations at scale.

AQE's skew-join handling (enabled in session.py) splits oversized shuffle
partitions automatically, but only for sort-merge joins after stats are
known; these utilities give explicit control for the cases AQE can't fix:

- ``salted_join``: hot-key equi-join. The skewed (large) side gets a random
  salt in [0, n); the small side is replicated n times with every salt
  value, so one hot key spreads over n shuffle partitions.  Replication
  multiplies the small side by n — use for dim-like right sides that are
  too big to broadcast outright but far smaller than the fact side.
- ``two_phase_agg``: hot-group aggregation. Partial-aggregate on
  (key, salt) first, then re-aggregate on key: the hot group's rows combine
  in n parallel tasks before the final (tiny) shuffle.  Spark's hash
  aggregate already does map-side partial combine; the explicit salt helps
  when a single group overwhelms even one reducer's combine buffer.

Both are pure DataFrame transforms — deterministic results, randomized
placement only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Result is identical to ``large.join(small, on, how)`` for row content
    (inner/left); only the shuffle placement changes.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    salted_large = large.withColumn("_salt", salt)
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = salted_large.join(replicated_small, [*on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Salted two-phase aggregation.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    sum/count/min/max (the re-aggregatable functions; avg must be expressed
    as sum+count by the caller).
    """
    partial_exprs, final_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(out))
            final_exprs.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"non-re-aggregatable fn: {fn}")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def heavy_hitters(
    df: DataFrame,
    on: Sequence[str],
    min_share: float = 0.01,
    top_k: int = 64,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> list[tuple]:
    """Key tuples holding more than ``min_share`` of the rows (capped at
    ``top_k``).  With ``sample_fraction`` the scan runs on a Bernoulli
    sample — at 100-TB scale a 1e-3 sample still sees every key above a
    0.1% share thousands of times, so detection stays reliable while the
    pass costs a fraction of a full scan."""
    src = df.sample(sample_fraction, seed=seed) if sample_fraction else df
    src = src.select(*on).persist()
    try:
        total = src.count()
        if total == 0:
            return []
        rows = (
            src.groupBy(*on)
            .count()
            .filter(F.col("count") > min_share * total)
            .orderBy(F.desc("count"), *on)
            .limit(top_k)
            .collect()
        )
    finally:
        src.unpersist()
    return [tuple(r[k] for k in on) for r in rows]


def hot_key_salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    hot_keys: Sequence[tuple] | None = None,
    n_salts: int = 16,
    how: str = "inner",
    **detect_kwargs,
) -> DataFrame:
    """Heavy-hitter-only salted join — the shape :func:`salted_join` should
    take at scale.  Salting EVERY key replicates the whole small side
    ``n_salts`` times (the replication can cost more than the straggler it
    removes, measured in BENCH skew sections); here only rows whose key is
    a detected heavy hitter are salted, so:

    - the large side takes ONE pass (a broadcast flag join, no re-scan),
    - the small side replicates only its hot-key rows (O(n_salts * hot)),
    - the long tail shuffles exactly as a plain join would.

    ``hot_keys`` (tuples matching ``on``) can be passed explicitly — e.g.
    from yesterday's :func:`heavy_hitters` run on a slowly-drifting key
    distribution; otherwise detection runs on ``large`` with
    ``detect_kwargs``.  With no hot keys the plan degenerates to the plain
    join plus a metadata-sized broadcast.  inner/left only (the salt must
    not invent or drop null-side rows)."""
    if how not in ("inner", "left"):
        raise ValueError(f"hot_key_salted_join supports inner/left, got {how!r}")
    spark = large.sparkSession
    if hot_keys is None:
        hot_keys = heavy_hitters(large, on, **detect_kwargs)
    schema = large.select(*on).schema
    if hot_keys:
        hot_df = spark.createDataFrame([tuple(k) for k in hot_keys], schema)
    else:
        hot_df = spark.createDataFrame([], schema)
    hot_df = hot_df.withColumn("_hot", F.lit(1))

    salt = F.when(
        F.col("_hot").isNotNull(),
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    ).otherwise(F.lit(0))
    salted_large = (
        large.join(F.broadcast(hot_df), list(on), "left")
        .withColumn("_salt", salt)
        .drop("_hot")
    )
    fanout = F.when(
        F.col("_hot").isNotNull(),
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"),
    ).otherwise(F.array(F.lit(0).cast("int")))
    replicated_small = (
        small.join(F.broadcast(hot_df), list(on), "left")
        .withColumn("_salt", F.explode(fanout))
        .drop("_hot")
    )
    return salted_large.join(replicated_small, [*on, "_salt"], how).drop("_salt")
