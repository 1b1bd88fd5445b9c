"""Solo BENCH_SCALE100.json refresh: the 6 heaviest queries at sf0.1 and at
the 100-copy FK-consistent corpus (benchdata/sf10x), warm min-of-2, with
host-load telemetry. Run on an idle box (the caller gates on load_1m)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_spark.session import get_spark  # noqa: E402


def _load():
    with open("/proc/loadavg") as fh:
        p = fh.read().split()
    busy = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                st = fh.read().split()
            if (int(st[13]) + int(st[14])) / os.sysconf("SC_CLK_TCK") > 5:
                busy += 1
        except OSError:
            continue
    return {
        "load_1m": float(p[0]),
        "load_5m": float(p[1]),
        "load_15m": float(p[2]),
        "cpus": os.cpu_count(),
        "sibling_busy_procs": busy,
    }


HEAVY = [
    "q30_local_supplier_volume",
    "d06_minhash_lsh_pairs",
    "t04_langid_confusion",
    "q04_fraud_analysis",
    "q11_top3_orders_per_customer",
    "p05_forgetting_pipeline",
    # r8 (VERDICT r7 task 4): the iterative graph pair — per-round shuffle
    # growth and lineage are the classic 100x failure shapes, so they need
    # standing scale evidence, not a one-off.
    "q73_copurchase_pagerank",
    "d10_dedup_clusters",
]


def main() -> None:
    from delta_lake_spark.queries import QUERIES

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf10x = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))) or ".",
        "benchdata",
        "sf10x",
    )
    start = _load()
    spark = get_spark(app_name="scale100_refresh", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def warm(name: str, d: str) -> float:
        q = QUERIES[name]
        q(spark, d).count()  # cold pass
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            q(spark, d).count()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    ref, sc = {}, {}
    for name in HEAVY:
        ref[name] = warm(name, sf01)
        print(f"# sf0.1 {name}: {ref[name]:.3f}s", file=sys.stderr)
    for name in HEAVY:
        sc[name] = warm(name, sf10x)
        print(f"# sf10x {name}: {sc[name]:.3f}s", file=sys.stderr)
    payload = {
        "sf01_warm_baseline": ref,
        "scale_100x": {
            "copies": 100,
            "queries": sc,
            "total_warm": round(sum(sc.values()), 3),
            "ratio_vs_sf0.1": {n: round(sc[n] / ref[n], 2) for n in sc},
        },
        "host_load_start": start,
        "host_load_end": _load(),
    }
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
