"""Window-based composite operators.

Re-expresses the reference's time-series patterns (SURVEY.md §2.5) as
reusable, partition-aware utilities:

- ``date_spine``   — W3: explode(sequence(min,max,interval 1 day))
  (deltalake.ipynb:1011-1015).
- ``gap_fill``     — W1: forward fill via last(ignorenulls) over an
  unbounded-preceding row frame (deltalake.ipynb:1017-1025).
- ``diff_cols``    — W2: day-over-day deltas via lag (deltalake.ipynb:1027-1032).
- ``asof_join``    — not in the reference; standard lakehouse operator added
  per SURVEY.md §2.3 note.  Implemented as union + forward-fill (a single
  sort-based window pass per key group), NOT a broadcast loop — scales to
  arbitrarily large event sides.

Scale note: the reference's windows are global (no partitionBy) which
single-threads at 100 TB.  Every utility here takes ``partition_by``; global
use is allowed only for provably small inputs (e.g. daily series).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def date_spine(df: DataFrame, date_col: str, alias: str = "date") -> DataFrame:
    """One row per calendar day between min and max of ``date_col``.

    Mirrors deltalake.ipynb:1011-1015 but stays fully declarative (no collect
    of the bounds — the min/max aggregate feeds sequence() directly).
    """
    return (
        df.agg(F.min(date_col).alias("_lo"), F.max(date_col).alias("_hi"))
        .select(F.explode(F.sequence("_lo", "_hi", F.expr("interval 1 day"))).alias(alias))
    )


def _frame(order_by: Sequence[str | Column], partition_by: Sequence[str | Column]):
    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return w


def gap_fill(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
) -> DataFrame:
    """Forward-fill nulls in ``cols`` (reference W1).  Leading nulls stay null."""
    w = _frame(order_by, partition_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def diff_cols(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    suffix: str = "_change",
) -> DataFrame:
    """Value minus previous value per ``order_by`` (reference W2); null first row."""
    w = _frame(order_by, partition_by)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.col(c) - F.lag(c, 1).over(w))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, the most recent right row with
    ``right.on <= left.on`` (within equal ``by`` keys if given).

    Implementation (scales without a range-join explosion): tag and union the
    two sides, sort within each key group by (on, tag), forward-fill the right
    side's payload, keep left rows.  One shuffle + one window pass; with
    ``by`` keys the window is partitioned and parallel.  Without ``by`` the
    window is global — only use for provably small series (documented
    single-partition hazard, as with the reference's global windows).

    NULL-key semantics (r9, matches DuckDB ``ASOF LEFT JOIN`` and the engine
    event-time validity rule, catalog.VALID_EVENT_TS_SQL): a right row with a
    NULL ``on`` key is DROPPED — under the union+ffill layout it would sort
    NULLS FIRST and forward-fill its payload into every subsequent left row,
    whereas no inequality comparison against NULL can ever be true.  A left
    row with a NULL key keeps its row with NULL payload (left-join contract):
    it sorts before every surviving right row, so the fill finds nothing.
    """
    rc = list(right_cols or [c for c in right.columns if c != on and c not in by])
    right = right.filter(F.col(on).isNotNull())
    lcols = left.columns
    lt = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rc],
        F.lit(None).cast(right.schema[on].dataType).alias(f"_r_{on}"),
    )

    def _rt_col(name: str) -> Column:
        # right rows carry their own on/by values; every other left column is null
        if name == on or name in by:
            return right[name].alias(name)
        return F.lit(None).cast(left.schema[name].dataType).alias(name)

    rt = right.select(
        *[_rt_col(c) for c in lcols],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in rc],
        F.col(on).alias(f"_r_{on}"),
    )
    unioned = lt.unionByName(rt)
    w = (
        _frame([F.col(on), F.col("_is_left")], [F.col(b) for b in by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in rc + [on]:
        filled = filled.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    for c in rc:
        out = out.withColumnRenamed(f"_r_{c}", c if c not in lcols else f"{c}{suffix}")
    return out.withColumnRenamed(f"_r_{on}", f"{on}{suffix}")
