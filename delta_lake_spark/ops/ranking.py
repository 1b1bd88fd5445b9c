"""Distributed global ranking: row_number / ntile over the WHOLE frame
without the single-partition funnel.

``Window.orderBy(...)`` with no partitionBy routes every row through one task
(Exchange SinglePartition) — the plan shape :mod:`ops.plan_audit` flags as
``global_funnel``.  For a global rank over a scaling input the classic
distributed form is:

1. range-repartition on the order key (each partition holds a contiguous,
   sorted-by-boundary key range; parallel),
2. count rows per partition (P rows to the driver — metadata-sized),
3. prefix-sum the counts into per-partition offsets, broadcast them back,
4. rank WITHIN each partition and add the offset.

Correctness requires a UNIQUE order key (include a tie-break column): range
partitioning guarantees partition i's keys sort before partition i+1's, so
``offset + local rank`` is the exact global rank.

The ranged frame is persisted before the count: ``repartitionByRange`` samples
its boundaries per execution, so the count job and the ranking job MUST see
the same physical partitioning.  Callers should ``unpersist`` the result when
done (or let it age out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_gr_pid"
_OFF = "_gr_offset"


def _global_row_number_with_total(
    df: DataFrame,
    order_by: list[str | Column],
    *,
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Core of :func:`global_row_number`; also returns the exact total row
    count, which the per-partition count collect already produced — callers
    needing N (ntile bucket math) get it without a second count job."""
    spark = df.sparkSession
    if num_partitions is None:
        # defaultParallelism (cores), not shuffle.partitions (2x cores): the
        # range exchange + offset collect + broadcast join sequence is
        # scheduling-bound (the q73 lesson — halving tiny-task count there
        # measured 3x); P still scales with the cluster, which is all the
        # prefix-sum construction needs
        num_partitions = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r[_PID], r["n"])
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off = spark.createDataFrame(offsets, f"{_PID} int, {_OFF} long")
    w = Window.partitionBy(_PID).orderBy(*cols)
    ranked = (
        ranged.join(F.broadcast(off), _PID)
        .withColumn(out_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_by: list[str | Column],
    *,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_by)`` computed with
    P-way parallelism.  ``order_by`` must be a unique key (add a tie-break);
    ascending order only (wrap a column in ``F.desc`` is NOT supported —
    negate or invert the column instead, keeping range partitioning valid)."""
    ranked, _ = _global_row_number_with_total(
        df, order_by, out_col=out_col, num_partitions=num_partitions
    )
    return ranked


def global_ntile(
    df: DataFrame,
    n: int,
    order_by: list[str | Column],
    *,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``NTILE(n) OVER (ORDER BY order_by)`` (SQL semantics:
    the first ``N % n`` buckets get ``N // n + 1`` rows, the rest ``N // n``)
    via :func:`global_row_number` — no single-partition stage."""
    rn = "_gr_rn"
    # total rides out of the offset collect global_row_number already does —
    # the previous separate count job + 1-row broadcast join were pure
    # per-query overhead (p03 stage audit, r6)
    ranked, total = _global_row_number_with_total(
        df, order_by, out_col=rn, num_partitions=num_partitions
    )
    # NTILE bucket math on exact integers (Python ints -> literals, same
    # values the SQL-side computation produced):
    #   base_sz = N // n; rem = N % n; cut = rem * (base_sz + 1)
    #   rn <= cut  -> bucket = (rn - 1) / (base_sz + 1) + 1
    #   rn >  cut  -> bucket = rem + (rn - 1 - cut) / base_sz + 1
    base_sz = total // n
    rem = total % n
    cut = rem * (base_sz + 1)
    r0 = F.col(rn) - 1
    if base_sz == 0:
        # fewer rows than buckets: every row is alone in bucket rn
        bucket = F.col(rn)
    else:
        bucket = F.when(
            F.col(rn) <= cut, F.floor(r0 / (base_sz + 1)) + 1
        ).otherwise(rem + F.floor((r0 - cut) / base_sz) + 1)
    return ranked.withColumn(out_col, bucket.cast("int")).drop(rn)


def global_cumsum(
    df: DataFrame,
    value: str | Column,
    order_by: list[str | Column],
    *,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running ``SUM(value) OVER (ORDER BY order_by ROWS
    UNBOUNDED PRECEDING)`` with P-way parallelism — the cumulative-sum twin
    of :func:`global_row_number` (range partition on the order key,
    per-partition window sum, broadcast per-partition value offsets).
    ``order_by`` must be a unique key; ascending only.  ``value`` must be
    integral/decimal for the result to be order-independent (the offsets
    are exact partial sums)."""
    spark = df.sparkSession
    if num_partitions is None:
        # defaultParallelism (cores), not shuffle.partitions (2x cores): the
        # range exchange + offset collect + broadcast join sequence is
        # scheduling-bound (the q73 lesson — halving tiny-task count there
        # measured 3x); P still scales with the cluster, which is all the
        # prefix-sum construction needs
        num_partitions = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    val = F.col(value) if isinstance(value, str) else value
    ranged = (
        df.withColumn("_gc_v", val)
        .repartitionByRange(num_partitions, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    sums = sorted(
        (r[_PID], r["s"])
        for r in ranged.groupBy(_PID)
        .agg(F.sum("_gc_v").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s or 0)
    off = spark.createDataFrame(offsets, f"{_PID} int, {_OFF} long")
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(off), _PID)
        .withColumn(out_col, F.sum("_gc_v").over(w) + F.col(_OFF))
        .drop(_PID, _OFF, "_gc_v")
    )
