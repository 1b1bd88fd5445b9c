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

Step 4 (r9, guide §2.4 "remove shuffles outright"): the local rank used to be
``row_number() OVER (PARTITION BY spark_partition_id() ORDER BY keys)`` — but
that Window's required clustering on the partition id is NOT satisfied by the
range partitioning, so Catalyst inserted a SECOND full-data exchange
(``hashpartitioning(_gr_pid)``) before every window: each ranked frame was
shuffled twice.  The local rank is now read off ``monotonically_increasing_id``
evaluated above an explicit ``sortWithinPartitions``: the function's
documented layout puts the record number within the partition in the lower
33 bits, so ``mono & (2^33-1)`` IS the 0-based local row index in sorted
order (deterministic under retry for the same reason the window form was —
the sort order is total given unique keys).  The per-partition offsets then
attach as a literal array lookup (no join), so one range exchange is the
ONLY data movement.  The 33-bit layout caps partitions at ~8.6e9 rows —
far above any sane partition size (a guard asserts it anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_gr_pid"
_OFF = "_gr_offset"
_LOC = "_gr_loc"
_LOC_MASK = (1 << 33) - 1  # monotonically_increasing_id: low 33 bits = record#


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
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        # local 0-based row index in sorted order (module docstring): this
        # projection sits ABOVE the sort and is nondeterministic-flagged, so
        # Catalyst will not reorder it below the sort; persist() pins the
        # evaluated values for every consumer job.
        .withColumn(
            _LOC, F.monotonically_increasing_id().bitwiseAND(F.lit(_LOC_MASK))
        )
        .persist()
    )
    counts = sorted(
        (r[_PID], r["n"])
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("n")).collect()
    )
    by_pid = dict(counts)
    assert all(n <= _LOC_MASK for _, n in counts), "partition exceeds 2^33 rows"
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += by_pid.get(pid, 0)
    # literal array lookup instead of a broadcast join + window: zero extra
    # exchanges, zero extra jobs (element_at is 1-based; pid is 0-based)
    off_arr = F.array(*[F.lit(o).cast("long") for o in offsets])
    ranked = (
        ranged.withColumn(
            out_col, F.element_at(off_arr, F.col(_PID) + 1) + F.col(_LOC) + 1
        )
        .drop(_PID, _LOC)
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


def global_row_number_grouped(
    df: DataFrame,
    group_col: str,
    order_by: list[str | Column],
    *,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Per-group exact ``row_number() OVER (PARTITION BY group ORDER BY
    order_by)`` for ALL groups through ONE range exchange (guide §2.4: two
    operations keyed the same way share one exchange).

    Running :func:`global_row_number` once per group costs k range
    shuffles, k boundary-sampling jobs and k count-collect jobs for k
    groups — and when the calls are chained on one frame (q93's three RFM
    scores, r8 bench) the logical plan nests k deep, so every later job
    replans the whole stack.  This fused form range-partitions ONCE on
    ``(group, *order_by)`` — group-contiguity makes per-group offsets
    well-defined — counts rows per (partition, group) in ONE job
    (metadata-sized: P x #groups rows), prefix-sums per group in partition
    order, and ranks within (partition, group).

    ``order_by`` must be unique per group (add a tie-break).  ``group_col``
    is intended for small bounded tags (dimension ids, period flags);
    NULL group values are handled (null-safe join, NULLS-FIRST grouping).

    Returns ``(ranked_df, totals)`` where ``totals`` maps each group value
    to its exact row count — callers needing per-group N (quintile math)
    get it without extra jobs.  Same persist/unpersist contract as
    :func:`global_row_number`.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranged = (
        df.repartitionByRange(num_partitions, F.col(group_col), *cols)
        .sortWithinPartitions(F.col(group_col), *cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(
            _LOC, F.monotonically_increasing_id().bitwiseAND(F.lit(_LOC_MASK))
        )
        .persist()
    )
    # ONE metadata job: per-(partition, group) row count AND the group's
    # first local index in that partition — rank = loc - start + offset + 1.
    stats = (
        ranged.groupBy(_PID, group_col)
        .agg(F.count("*").alias("n"), F.min(_LOC).alias("s"))
        .collect()
    )
    per_group: dict = {}
    for r in sorted(stats, key=lambda r: r[_PID]):
        per_group.setdefault(r[group_col], []).append((r[_PID], r["n"], r["s"]))
    rows, totals = [], {}
    for g, lst in per_group.items():
        acc = 0
        for pid, n, s in lst:
            rows.append((pid, g, acc, s))
            acc += n
        totals[g] = acc
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    off_schema = StructType(
        [
            StructField("_gr_p2", IntegerType(), False),
            StructField("_gr_g", df.schema[group_col].dataType, True),
            StructField(_OFF, LongType(), False),
            StructField("_gr_s", LongType(), False),
        ]
    )
    off = spark.createDataFrame(rows, off_schema)
    # broadcast attach (P x #groups rows): BroadcastHashJoin leaves the probe
    # side's partitioning intact — no extra exchange, no window.
    ranked = (
        ranged.join(
            F.broadcast(off),
            (F.col(_PID) == F.col("_gr_p2"))
            & F.col(group_col).eqNullSafe(F.col("_gr_g")),
        )
        .withColumn(
            out_col, F.col(_LOC) - F.col("_gr_s") + F.col(_OFF) + 1
        )
        .drop(_PID, _LOC, _OFF, "_gr_p2", "_gr_g", "_gr_s")
    )
    return ranked, totals


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
    sums = dict(
        (r[_PID], r["s"])
        for r in ranged.groupBy(_PID)
        .agg(F.sum("_gc_v").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += int(sums.get(pid) or 0)
    # literal array lookup instead of a broadcast join (r9): the partial-sum
    # offsets attach as a projection; the running-sum window (and its
    # clustering exchange) is the one piece a prefix sum genuinely needs.
    off_arr = F.array(*[F.lit(o).cast("long") for o in offsets])
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn(
            out_col,
            F.sum("_gc_v").over(w) + F.element_at(off_arr, F.col(_PID) + 1),
        )
        .drop(_PID, "_gc_v")
    )
