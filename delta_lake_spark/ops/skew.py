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
