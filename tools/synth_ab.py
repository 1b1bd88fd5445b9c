#!/usr/bin/env python
"""Synthetic-scale interleaved A/B harness (guide §1; VERDICT r9: the
20M-row synthetic frame is the standard instrument for executor-side shape
decisions — the sf0.1 bench's sub-second queries cannot resolve them, and
sequential whole-bench samples carry 2-4x host-contention noise).

Both variants of a shape run WITHIN one session, strictly alternating
(A,B,A,B,...), cache cleared between reps, first pair discarded as warmup,
noop sink (computes every column, discards output — guide §1.4), and the
two variants' RESULTS are checksum-asserted identical before any timing is
trusted.

Subcommands:
  cumsum   — r9 window-form global_cumsum (hash(_gr_pid) exchange + window)
             vs the r10 map-form (one range exchange, Arrow prefix sum)
  basket   — q91/q105 item-frame shapes: plain distinct (hash(ok,pk), joins
             re-shuffle to hash(ok)) vs prefix-key pre-partition (one
             hash(ok) serves distinct + self-joins); --triples for the
             q105 three-way shape
  offsets  — literal-array vs broadcast-join offsets attach at rising
             partition counts (the _LITERAL_OFFSETS_MAX_PARTITIONS
             crossover evidence)

Usage:
  python tools/synth_ab.py cumsum --rows 20000000 --cycles 5
  python tools/synth_ab.py basket --rows 20000000 --cycles 5 [--triples]
  python tools/synth_ab.py offsets --rows 2000000 --parts 64,1024,4096,16384
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _checksum(df: DataFrame) -> tuple:
    """Order-independent exact fingerprint of a frame's full contents."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def _interleave(spark, variants: dict, cycles: int) -> None:
    """Alternate variants (dict name -> df builder), clearing the block
    cache between reps; assert identical checksums once, then time."""
    names = list(variants)
    sums = {}
    for name in names:
        sums[name] = _checksum(variants[name]())
        spark.catalog.clearCache()
    ref = sums[names[0]]
    for name, s in sums.items():
        assert s == ref, f"variant results differ: {names[0]}={ref} {name}={s}"
    print(f"# results identical across variants: rows={ref[0]}", flush=True)
    reps: dict[str, list[float]] = {n: [] for n in names}
    for cycle in range(cycles + 1):  # +1: first cycle is discarded warmup
        for name in names:
            spark.sparkContext.setJobDescription(f"synth_ab:{name}:{cycle}")
            dt = _noop(variants[name]())
            spark.catalog.clearCache()
            if cycle > 0:
                reps[name].append(dt)
            print(f"# cycle {cycle} {name}: {dt:.3f}s", flush=True)
    for name in names:
        print(
            f"{name}: median {statistics.median(reps[name]):.3f}s "
            f"reps {[round(r, 3) for r in reps[name]]}",
            flush=True,
        )


# ---------------------------------------------------------------------------
# cumsum: old (r9) window form vs new (r10) map form
# ---------------------------------------------------------------------------
def _cumsum_window_form(df, value, order_by, out_col, num_partitions):
    """The r9 implementation, verbatim shape: range partition + collected
    literal offsets + SUM OVER (PARTITION BY _gr_pid) — whose clustering
    requirement re-inserts Exchange hashpartitioning(_gr_pid)."""
    cols = [F.col(c) for c in order_by]
    ranged = (
        df.withColumn("_gc_v", F.col(value))
        .repartitionByRange(num_partitions, *cols)
        .withColumn("_ab_pid", F.spark_partition_id())
        .persist()
    )
    sums = dict(
        (r["_ab_pid"], r["s"])
        for r in ranged.groupBy("_ab_pid").agg(F.sum("_gc_v").alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += int(sums.get(pid) or 0)
    off_arr = F.array(*[F.lit(o).cast("long") for o in offsets])
    w = (
        Window.partitionBy("_ab_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn(
            out_col,
            F.sum("_gc_v").over(w) + F.element_at(off_arr, F.col("_ab_pid") + 1),
        )
        .drop("_ab_pid", "_gc_v")
    )


def _cumsum_arrow_form(df, value, order_by, out_col, num_partitions):
    """mapInArrow prefix sum: untouched columns pass through as Arrow
    buffers (no pandas materialization), the running sum is one
    pyarrow.compute.cumulative_sum per batch."""
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    cols = [F.col(c) for c in order_by]
    ranged = (
        df.withColumn("_gc_v", F.col(value).cast("long"))
        .repartitionByRange(num_partitions, *cols)
        .withColumn("_ab_pid", F.spark_partition_id())
        .persist()
    )
    sums = dict(
        (r["_ab_pid"], r["s"])
        for r in ranged.groupBy("_ab_pid").agg(F.sum("_gc_v").alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += int(sums.get(pid) or 0)
    out_fields = [
        f for f in ranged.schema.fields if f.name not in ("_ab_pid", "_gc_v")
    ]
    out_names = [f.name for f in out_fields]
    out_schema = StructType(out_fields + [StructField(out_col, LongType(), True)])

    def _prefix(batches):
        import pyarrow.compute as pc

        run = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            if run is None:
                run = offsets[batch.column(names.index("_ab_pid"))[0].as_py()]
            v = pc.fill_null(batch.column(names.index("_gc_v")), 0)
            c = pc.add(pc.cumulative_sum(v), run)
            run = c[-1].as_py()
            arrays = [batch.column(names.index(n)) for n in out_names] + [
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=out_names + [out_col])

    return ranged.sortWithinPartitions(*cols).mapInArrow(_prefix, out_schema)


def run_cumsum(spark, args) -> None:
    from delta_lake_spark.ops.ranking import global_cumsum

    def frame():
        return spark.range(args.rows).select(
            F.xxhash64("id").alias("k"),
            F.col("id").alias("id"),
            (F.col("id") % 1000).alias("v"),
        )

    parts = spark.sparkContext.defaultParallelism
    _interleave(
        spark,
        {
            "window_form_r9": lambda: _cumsum_window_form(
                frame(), "v", ["k", "id"], "cs", parts
            ),
            "map_form_r10": lambda: global_cumsum(
                frame(), "v", ["k", "id"], out_col="cs", num_partitions=parts
            ),
            "arrow_form": lambda: _cumsum_arrow_form(
                frame(), "v", ["k", "id"], "cs", parts
            ),
        },
        args.cycles,
    )


# ---------------------------------------------------------------------------
# basket: q91/q105 item-frame shapes
# ---------------------------------------------------------------------------
def _basket_frame(spark, rows: int):
    n_orders = max(rows // 5, 1)
    return spark.range(rows).select(
        (F.col("id") % n_orders).alias("l_orderkey"),
        F.pmod(F.xxhash64("id"), F.lit(200_000)).alias("l_partkey"),
    )


def _q91_tail(items: DataFrame) -> DataFrame:
    n_orders = items.select(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    part_counts = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_orders"))
        .filter(F.col("pair_orders") >= 2)
    )
    ca = part_counts.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    cb = part_counts.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            "pair_orders",
            F.expr("CAST((10000 * pair_orders) div n AS BIGINT)").alias("support_bp"),
            F.expr("CAST((1000 * pair_orders * n) div (c_a * c_b) AS BIGINT)").alias(
                "lift_milli"
            ),
        )
        .orderBy(F.desc("lift_milli"), "part_a", "part_b")
        .limit(20)
    )


def _q105_tail(items: DataFrame) -> DataFrame:
    n_orders = items.select(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    a, b, c = items.alias("a"), items.alias("b"), items.alias("c")
    triples = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .join(
            c,
            (F.col("b.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
            F.col("c.l_partkey").alias("part_c"),
        )
        .agg(F.count("*").alias("basket_orders"))
        .filter(F.col("basket_orders") >= 2)
    )
    return (
        triples.crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "part_c",
            "basket_orders",
            F.expr("CAST((10000 * basket_orders) div n AS BIGINT)").alias(
                "support_bp"
            ),
        )
        .orderBy(F.desc("basket_orders"), "part_a", "part_b", "part_c")
        .limit(20)
    )


def run_basket(spark, args) -> None:
    tail = _q105_tail if args.triples else _q91_tail

    def plain():
        items = _basket_frame(spark, args.rows).distinct()
        return tail(items)

    def prefix():
        items = (
            _basket_frame(spark, args.rows)
            .repartition(F.col("l_orderkey"))
            .distinct()
        )
        return tail(items)

    _interleave(
        spark,
        {"plain_distinct_r8": plain, "prefix_partition_r9": prefix},
        args.cycles,
    )


# ---------------------------------------------------------------------------
# offsets: literal array vs broadcast join at rising partition counts
# ---------------------------------------------------------------------------
def run_offsets(spark, args) -> None:
    from delta_lake_spark.ops import ranking

    def frame():
        return spark.range(args.rows).select(
            F.xxhash64("id").alias("k"), F.col("id").alias("id")
        )

    for p in [int(x) for x in args.parts.split(",")]:
        times: dict[str, list[float]] = {"literal": [], "bcast_join": []}
        for rep in range(args.cycles + 1):  # interleaved; first pair warmup
            for name, thresh in (("literal", 10**9), ("bcast_join", 0)):
                ranking._LITERAL_OFFSETS_MAX_PARTITIONS = thresh
                spark.sparkContext.setJobDescription(f"offsets:{name}:P{p}")
                dt = _noop(
                    ranking.global_row_number(
                        frame(), ["k", "id"], num_partitions=p
                    )
                )
                spark.catalog.clearCache()
                if rep > 0:
                    times[name].append(dt)
        for name, reps in times.items():
            print(
                f"P={p} {name}: median {statistics.median(reps):.3f}s "
                f"reps {[round(t, 3) for t in reps]}",
                flush=True,
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("cumsum", "basket", "offsets"):
        sp = sub.add_parser(name)
        sp.add_argument("--rows", type=int, default=20_000_000)
        sp.add_argument("--cycles", type=int, default=5)
        if name == "basket":
            sp.add_argument("--triples", action="store_true")
        if name == "offsets":
            sp.add_argument("--parts", default="64,1024,2048,4096,16384")

    args = ap.parse_args()
    from delta_lake_spark.session import get_spark

    spark = get_spark(app_name=f"synth_ab_{args.cmd}")
    spark.range(1).count()
    {"cumsum": run_cumsum, "basket": run_basket, "offsets": run_offsets}[
        args.cmd
    ](spark, args)
    spark.stop()


if __name__ == "__main__":
    main()
