#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
  python tools/capture_plans.py --tag r09 --suffix before q01_pricing_summary ...
  python tools/capture_plans.py --tag r09 --suffix before --all-headline

Explain is driver-only (no job runs), so this is safe to run alongside other
work; the artifacts are the judge-checkable evidence for plan claims
(guide §7.2).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary", "q02_client_stats", "q03_daily_metrics",
    "q04_fraud_analysis", "q30_local_supplier_volume",
    "q11_top3_orders_per_customer", "q23_user_event_gaps",
    "q09_date_spine_ffill", "q19_asof_event_rates", "t01_dedup_exact",
    "t04_langid_confusion", "t05_winnow_fingerprints",
    "d06_minhash_lsh_pairs", "v01_cosine_topk", "v04_bucketed_ann",
    "m02_frame_features",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.names)
    if args.all_headline:
        names = HEADLINE + [n for n in names if n not in HEADLINE]

    from delta_lake_spark.session import get_spark
    from delta_lake_spark.queries import QUERIES

    spark = get_spark(app_name="plan_capture")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        plan = buf.getvalue()
        # count real Exchange operators only: a bare substring count also
        # matches ReusedExchange nodes and inflates the evidence (ADVICE r9)
        n_exch = plan.count("Exchange") - plan.count("ReusedExchange")
        joins = [w for w in ("BroadcastHashJoin", "SortMergeJoin",
                             "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                             "CartesianProduct") if w in plan]
        py = [w for w in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                          "MapInPandas") if w in plan]
        print(f"{name}: exchanges={n_exch} joins={joins} python={py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
