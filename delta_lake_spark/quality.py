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
    definition, SURVEY.md §5 golden invariant 3).  A NULL predicate result
    counts as a violation — the invariant must provably hold."""
    n_bad = df.filter(~F.coalesce(cond, F.lit(False))).count()
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


def split_by_expectations(
    df: DataFrame, expectations: dict[str, Column | str]
) -> tuple[DataFrame, DataFrame]:
    """Expectations with quarantine (the DLT ``expect_or_drop`` pattern):
    rows satisfying EVERY expectation flow on; violating rows come back as
    a second frame tagged ``_failed_expectations`` (array of rule names)
    for a quarantine sink — at pipeline scale, failing the whole job on one
    bad row (assert_invariant) is often the wrong tradeoff vs routing bad
    rows aside and reconciling counts.

    NULL predicate results count as violations (an expectation must
    provably hold).  One predicate evaluation per rule per row, all
    JVM-side; the split is two complementary filters over the same scan —
    with the input persisted by the caller, one pass each.
    """
    checks = {
        name: F.coalesce(cond if isinstance(cond, Column) else F.expr(cond), F.lit(False))
        for name, cond in expectations.items()
    }
    all_ok = F.lit(True)
    for c in checks.values():
        all_ok = all_ok & c
    failed = F.filter(
        F.array(
            *[F.when(~c, F.lit(name)).otherwise(F.lit(None)) for name, c in checks.items()]
        ),
        lambda x: x.isNotNull(),
    )
    good = df.filter(all_ok)
    bad = df.filter(~all_ok).withColumn("_failed_expectations", failed)
    return good, bad


def expect_or_quarantine(
    df: DataFrame,
    expectations: dict[str, Column | str],
    quarantine,
) -> DataFrame:
    """Route rows failing ``expectations`` into the ``quarantine`` managed
    table (appended, with the ``_failed_expectations`` tag) and return the
    clean rows for the caller's sink.  The returned frame must be consumed
    AFTER this call returns (the quarantine append already ran)."""
    good, bad = split_by_expectations(df, expectations)
    if bad.limit(1).count():
        from delta_lake_spark.tables import ManagedTable

        if not ManagedTable.is_managed_table(quarantine.path):
            quarantine.write(bad)
        else:
            quarantine.write(bad, mode="append")
    return good


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One-pass column profiler (ANALYZE-style table statistics): one output
    row per column with null count, distinct count, and min/max.

    All statistics come from a SINGLE wide aggregate over one scan — at
    100 TB the profile costs one pass regardless of column count — then a
    ``stack`` unpivot (rows = columns, metadata-sized).  Numeric columns
    report ``min_num``/``max_num`` (doubles); everything else reports
    ``min_str``/``max_str`` (strings) — split so timestamps/strings never
    ride a lossy double cast.

    ``exact_distinct=False`` (default) uses HLL++ ``approx_count_distinct``
    — the scale-sane choice (exact distinct per column adds an Expand of
    the input per column).  Flip it on for oracle-grade exactness on
    small/medium tables.
    """
    from pyspark.sql.types import NumericType

    names = cols or df.columns
    types = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}
    distinct_fn = F.count_distinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    nd_aggs = []
    for c in names:
        numeric = isinstance(fields[c], NumericType)
        nd_aggs.append(distinct_fn(F.col(c)).alias(f"__nd_{c}"))
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
            (F.min(c).cast("double") if numeric else F.lit(None).cast("double")).alias(f"__minn_{c}"),
            (F.max(c).cast("double") if numeric else F.lit(None).cast("double")).alias(f"__maxn_{c}"),
            (F.lit(None).cast("string") if numeric else F.min(c).cast("string")).alias(f"__mins_{c}"),
            (F.lit(None).cast("string") if numeric else F.max(c).cast("string")).alias(f"__maxs_{c}"),
        ]
    if exact_distinct:
        # exact multi-distinct plans as an Expand (xN columns); FUSING it
        # with the plain aggs makes every expanded row evaluate the whole
        # wide buffer — measured ~7x slower than the two aggregates run
        # separately.  Two column-pruned passes + a 1-row-x-1-row join win.
        wide = df.agg(*aggs).join(F.broadcast(df.agg(*nd_aggs)))
    else:
        wide = df.agg(*aggs, *nd_aggs)

    stack_args = []
    for c in names:
        stack_args += [
            f"'{c}'", f"'{types[c]}'", f"`__nulls_{c}`", f"`__nd_{c}`",
            f"`__minn_{c}`", f"`__maxn_{c}`", f"`__mins_{c}`", f"`__maxs_{c}`",
        ]
    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(names)}, {', '.join(stack_args)}) AS "
            "(column_name, data_type, n_nulls, n_distinct, "
            "min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "column_name", "data_type", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    ).orderBy("column_name")
