#!/usr/bin/env python
"""A/B harness for q73 PageRank's LARGE-graph (non-broadcast) shape at
sf10x — the 100 TB path (VERDICT r9 item 4: the src-partitioned loop was
4x slower than broadcast at the 2M-vertex boundary; close the gap so the
shape the engine actually uses past _PR_BCAST_MAX_VERTICES is not a cliff).

Replicates q73's 10-round integer loop over the real sf10x co-purchase
graph (generated/cached under benchdata/sf10x) with selectable shapes:

  bcast          — dst-partitioned edge layout, rank table broadcast into
                   the contrib join (the small-graph shape; reference)
  src_r9         — src-partitioned layout, plain join (the r9 large shape:
                   SMJ sorts the edge side EVERY round)
  src_shj        — src-partitioned layout + SHUFFLE_HASH hint on the
                   vertex side: streams the cached edge partitions with no
                   per-round sort
  src_sorted     — src-partitioned layout persisted SORTED by src, plain
                   join: the cached outputOrdering satisfies the SMJ's
                   edge-side sort once instead of per round

Final rank checksums are asserted identical across shapes.  Run on an
idle box:  python tools/graph_ab.py --shapes bcast,src_r9,src_shj
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_PR_TOTAL = 1_000_000_000_000
_PR_ITERS = 10


def pagerank(spark, sf_dir: str, shape: str) -> tuple:
    """q73's exact-integer loop, shape-forced.  Returns (build_s, loop_s,
    checksum) where checksum covers the full final rank vector."""
    from delta_lake_spark.ops.lineage import pin, unpin
    from delta_lake_spark.queries.tpch_gap import _copurchase_edges

    t0 = time.perf_counter()
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    P = spark.sparkContext.defaultParallelism
    part_key = "dst" if shape == "bcast" else "src"
    direct = sym.repartition(P, part_key)
    if shape == "src_sorted":
        direct = direct.sortWithinPartitions("src")
    direct = direct.persist()
    adj = None
    if shape == "src_adj":
        # vertex-keyed adjacency arrays: the per-round join probes V rows
        # instead of E; the E-sized (dst, val) stream is regenerated
        # in-task by explode, feeding the same partial aggregation
        adj = (
            direct.groupBy("src")
            .agg(F.collect_list("dst").alias("dsts"))
            .persist()
        )
        adj.count()
        direct.unpersist()
    deg = (
        (adj.select("src", F.size("dsts").alias("_d")) if adj is not None
         else direct.groupBy(F.col("src")).agg(F.count(F.lit(1)).alias("_d")))
        .select(F.col("src").alias("p"), F.col("_d").alias("d"))
        .persist()
    )
    n = deg.count()
    init = _PR_TOTAL // n
    base = (15 * init) // 100
    ranks = pin(deg.select("p", "d", F.lit(init).cast("bigint").alias("r")))
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(_PR_ITERS):
        vals = ranks.select("p", F.expr("r DIV d").alias("val"))
        if shape == "bcast":
            rhs = F.broadcast(vals)
        elif shape == "src_shj":
            rhs = vals.hint("shuffle_hash")
        else:
            rhs = vals
        if shape == "src_adj":
            contrib = (
                adj.join(rhs, F.col("src") == F.col("p"))
                .select(F.explode("dsts").alias("cp"), "val")
                .groupBy("cp")
                .agg(F.sum("val").alias("s"))
            )
        else:
            contrib = (
                direct.join(rhs, direct["src"] == rhs["p"] if shape == "bcast" else F.col("src") == F.col("p"))
                .groupBy(F.col("dst").alias("cp"))
                .agg(F.sum("val").alias("s"))
            )
        nxt = pin(
            deg.join(contrib, deg["p"] == contrib["cp"], "left").select(
                "p",
                "d",
                (F.lit(base) + F.expr("85 * COALESCE(s, 0) DIV 100"))
                .cast("bigint")
                .alias("r"),
            )
        )
        unpin(ranks)
        ranks = nxt
    loop_s = time.perf_counter() - t0

    row = ranks.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("p", "r").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    checksum = (row["n"], str(row["h"]))
    unpin(ranks)
    direct.unpersist()
    if adj is not None:
        adj.unpersist()
    deg.unpersist()
    edges.unpersist()
    return build_s, loop_s, checksum


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="bcast,src_r9,src_shj")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument(
        "--sf-dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchdata",
            "sf10x",
        ),
    )
    args = ap.parse_args()

    from delta_lake_spark.session import get_spark

    spark = get_spark(app_name="graph_ab")
    spark.range(1).count()
    sums = {}
    for rep in range(args.reps):
        for shape in args.shapes.split(","):
            spark.sparkContext.setJobDescription(f"pagerank:{shape}:{rep}")
            build_s, loop_s, ck = pagerank(spark, args.sf_dir, shape)
            spark.catalog.clearCache()
            sums.setdefault(shape, ck)
            assert sums[shape] == ck
            print(
                f"rep {rep} {shape}: build {build_s:.1f}s loop {loop_s:.1f}s "
                f"checksum {ck}",
                flush=True,
            )
    ref = next(iter(sums.values()))
    for shape, ck in sums.items():
        assert ck == ref, f"rank vectors differ: {shape}"
    print(f"# all shapes identical: {ref}")
    spark.stop()


if __name__ == "__main__":
    main()
