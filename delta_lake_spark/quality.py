"""Data-quality gates (SURVEY.md §7: schema asserts, reconciliation counts).

The reference checks correctness manually (printSchema/show/count eyeballing,
SURVEY.md §5); this module turns those practices into enforced invariants.
Every check is a distributed aggregate returning a scalar — nothing large
crosses to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class QualityError(AssertionError):
    """A data-quality invariant failed."""


def assert_schema(df: DataFrame, expected: StructType, ignore_nullability: bool = True) -> None:
    """Schema gate (the reference's printSchema eyeball, enforced)."""
    got, want = df.schema, expected
    if ignore_nullability:
        strip = lambda s: [(f.name, f.dataType.simpleString()) for f in s.fields]  # noqa: E731
        got, want = strip(got), strip(want)
    if got != want:
        raise QualityError(f"schema mismatch:\n  got:  {got}\n  want: {want}")


def assert_count_equals(df: DataFrame, other: DataFrame | int, label: str = "") -> None:
    """Row-count reconciliation (silver.py:181-188 cross-engine counts)."""
    n = df.count()
    m = other if isinstance(other, int) else other.count()
    if n != m:
        raise QualityError(f"count mismatch {label}: {n} != {m}")


def assert_unique(df: DataFrame, keys: list[str]) -> None:
    """Key uniqueness — precondition for MERGE sources (Delta requires at
    most one source row per key; so does ManagedTable.merge)."""
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1)
    first = dup.limit(1).collect()
    if first:
        raise QualityError(f"duplicate keys on {keys}: e.g. {tuple(first[0])}")


def assert_no_nulls(df: DataFrame, cols: list[str]) -> None:
    conds = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    row = df.agg(*conds).first()
    bad = {c: row[c] for c in cols if row[c]}
    if bad:
        raise QualityError(f"null values present: {bad}")


def assert_invariant(df: DataFrame, cond: Column, label: str = "invariant") -> None:
    """Every row must satisfy ``cond`` (e.g. the is_suspicious flag
    definition, SURVEY.md §5 golden invariant 3)."""
    n_bad = df.filter(~cond).count()
    if n_bad:
        raise QualityError(f"{label}: {n_bad} rows violate")


def reconcile_sums(
    df_a: DataFrame, df_b: DataFrame, col: str, decimals: int = 2
) -> None:
    """Measure reconciliation between two pipeline stages: exact decimal
    sums (order-independent) must match."""
    dec = f"decimal(30,{decimals})"
    a = df_a.agg(F.sum(F.col(col).cast(dec))).first()[0]
    b = df_b.agg(F.sum(F.col(col).cast(dec))).first()[0]
    if a != b:
        raise QualityError(f"sum({col}) mismatch: {a} != {b}")
