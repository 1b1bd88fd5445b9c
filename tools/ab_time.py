#!/usr/bin/env python
"""A/B timer for individual registered queries (guide §1.4 methodology).

Times each named query with the noop sink (computes every column, discards
output) over N warm repetitions after one cold pass, printing per-rep and
median seconds.  Use on an idle box; alternate A/B variants across runs.

Usage:
  python tools/ab_time.py --reps 5 q93_rfm_segments t27_quality_rank_correlation
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from delta_lake_spark.session import get_spark
    from delta_lake_spark.queries import QUERIES

    spark = get_spark(app_name="ab_time")
    spark.range(1).count()

    def run(name: str) -> float:
        df = QUERIES[name](spark, args.sf_dir)
        t0 = time.perf_counter()
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return time.perf_counter() - t0

    for name in args.names:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        cold = run(name)
        reps = [run(name) for _ in range(args.reps)]
        print(
            f"{name}: cold {cold:.3f}s warm median {statistics.median(reps):.3f}s "
            f"min {min(reps):.3f}s reps {[round(r, 3) for r in reps]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
