"""Registry for the driver contract (queries() / oracle_sql()).

Determinism rules for oracle-checked queries (the driver hash-compares values
between Spark and DuckDB):

- Money/measure sums: cast to ``decimal(18,2)`` *before* aggregating in BOTH
  engines.  Decimal sums are exact, so the result is independent of partition
  / accumulation order.  Raw ``sum(double)`` is NOT reproducible across
  engines (floating-point addition is not associative).
- Averages: ``round(cast(sum_dec as double) / count, N)`` in both engines.
  The decimal sum is exact, the double division is IEEE-deterministic, and
  rounding a bit-identical double gives bit-identical results.
- Tie-breaks: every ORDER BY ... LIMIT includes a unique key so the selected
  row set is deterministic.
- Window frames: ordering columns always include a unique tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
