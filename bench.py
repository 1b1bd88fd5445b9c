#!/usr/bin/env python
"""Benchmark the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set mirrors the reference's timed workload (BASELINE.md: the
Gold-mart build over the fact table + scan suite) plus one representative of
each extension family (text, dedup, vector, time series).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",      # grouped multi-agg scan (A1/A3)
    "q02_client_stats",         # broadcast dim join + multi-key agg (gold mart 1)
    "q03_daily_metrics",        # expr join + when-ladder + conditional aggs (gold mart 2)
    "q04_fraud_analysis",       # filter + 3-way join + 2-key agg (gold mart 3)
    "q30_local_supplier_volume",  # 6-way join through the dim chain
    "q11_top3_orders_per_customer",  # partitioned ranking window
    "q23_user_event_gaps",      # partitioned lag window at fact scale
    "q09_date_spine_ffill",     # spine + forward fill
    "q19_asof_event_rates",     # as-of join
    "t01_dedup_exact",          # hash-groupBy dedup
    "t04_langid_confusion",     # text analysis (regexp-heavy)
    "t05_winnow_fingerprints",  # rolling-hash winnowing fingerprints
    "d06_minhash_lsh_pairs",    # MinHash+LSH near-dup
    "v01_cosine_topk",          # brute-force vector top-k
    "v04_bucketed_ann",         # bucketed (IVF-style) ANN scale path
    "m02_frame_features",       # mapInPandas multimodal decode stub
]

# Round-2+ operator families, timed separately (headline stays comparable)
EXTENSIONS = [
    "q34_shipments_after_urgent_orders",  # binned range join
    "t07_repetition_stats",               # Gopher repetition filters
    "t08_pii_scan",                       # PII regexp scan
    "t09_token_budget_packing",           # sequence packing
    "s01_hash_split_sample",              # content-addressed sampling
    "d12_simhash_near_pairs",             # SimHash banded near-dup
    "v07_ann_recall",                     # ANN recall metric
    "q38_monthly_rollup_from_daily",      # rollup reuse
    "v08_quantized_ann",                  # int8 scalar-quantized ANN (r4)
    "q39_exact_percentile_outliers",      # exact percentile + IQR fences (r4)
    "v09_kmeans_clusters",                # distributed spherical k-means (r4)
    "t12_tfidf_top_terms",                # TF-IDF inverted-index ranking (r4)
    "q45_retention_cohorts",              # weekly retention triangle (r4)
    "d15_semantic_dedup",                 # SemDeDup cluster-scoped dedup (r4)
    "s06_cluster_balanced_sample",        # cluster-balanced sampling (r4)
    "v10_cluster_quality",                # cluster-quality report (r4)
    "q48_nation_trade_volume",            # TPC-H Q7 dual-role dim join (r4)
    "q49_order_count_distribution",       # TPC-H Q13 outer-join distribution (r4)
    "q51_large_orders",                   # TPC-H Q18 having-then-join-back (r4)
    "q52_disjunctive_revenue",            # TPC-H Q19 OR'd join predicates (r4)
    "q53_sole_return_suppliers",          # TPC-H Q21 multi-EXISTS rewrite (r4)
    "q22_balance_quartiles",              # funnel-free global ntile (r4 rewrite)
    "q56_product_profit",                 # TPC-H Q9 star-join profit (r4)
    "q57_min_cost_supplier",              # TPC-H Q2 argmin join (r4)
    "q55_table_profile",                  # one-pass column profiler (r4)
    "q82_interval_union_coverage",        # interval-coalescing islands (r4)
    "q83_mad_outliers",                   # median/MAD robust fences (r4)
    "t24_boilerplate_ngrams",             # per-source template mining (r4)
    "s13_dsir_importance",                # DSIR hashed-ngram importance (r4)
    "v17_kmeans_exact",                   # exact-integer Euclidean Lloyd (r4)
    "d21_semantic_dedup_survivors",       # SemDeDup paper keep-rule (r4)
    "t25_classifier_auc",                 # exact midrank AUC (r4)
    "t26_langid_kappa",                   # Cohen's kappa agreement (r4)
    "q84_dominant_part_suppliers",        # TPC-H Q20 fraction threshold (r4)
    "q85_rich_inactive_customers",        # TPC-H Q22 scalar anti-join (r4)
    "q86_seasonal_deviation",             # day-of-week volume anomalies (r4)
    "q87_rolling_active_users",           # sliding distinct DAU/WAU (r4)
    "v18_pq_ann",                         # product-quantization ADC ANN (r4)
    "q88_full_coverage_customers",        # relational division (r4)
    "p04_mixture_materialization",        # DoReMi plan application (r4)
    "q89_revenue_gini",                   # exact-integer Gini (r4)
    "d22_cross_source_dup_matrix",        # dup provenance matrix (r4)
    "t27_quality_rank_correlation",       # exact Spearman calibration (r4)
    "q90_ship_latency_slo",               # exact latency percentiles (r4)
    "q91_market_basket_lift",             # intra-order pair association (r4)
    "q92_retention_cohorts",              # monthly cohort matrix (r4)
    "q93_rfm_segments",                   # funnel-free RFM quintiles (r4)
    "q94_repurchase_intervals",           # inter-purchase-time bands (r4)
    "t28_lexical_diversity",              # type-token ratio per source (r4)
    "s14_neyman_allocation",              # minimum-variance allocation (r4)
    "v19_pq_shortlist_rerank",            # PQ shortlist + exact rerank (r4)
    "v20_range_search",                   # exact radius retrieval (r4)
    "q95_supplier_hhi",                   # HHI market concentration (r4)
    "q96_pareto_customers",               # 80/20 head count (r4)
    "m07_chunk_dedup_report",             # CAS chunk dedup report (r4)
    "q97_segment_migration",              # quintile migration matrix (r4)
    "q98_new_vs_returning",               # acquisition vs retention (r4)
    "q99_value_bands",                    # power-of-two value histogram (r4)
    "q100_order_splitting",               # same-week structuring screen (r4)
    "t29_tokenizer_fertility",            # subword fertility metric (r4)
    "q102_priority_segment_chi2",         # chi-square independence (r4)
    "q103_benford_screen",                # leading-digit audit screen (r4)
    "q104_order_cadence",                 # subscription-cadence detection (r4)
    "q105_frequent_triples",              # Apriori level-3 itemsets (r4)
    "s15_kfold_assignment",               # leakage-safe CV folds (r4)
    "v21_ivfpq_ann",                      # IVF-PQ bucket-scoped ADC (r5)
    "s16_annealed_mixture_schedule",      # epoch-annealed mixture (r5)
]


_SECTION_SECS: dict[str, float] = {}
_SECTION_LOAD: dict[str, dict] = {}
_SECTION_T0 = [0.0]


def _section(name: str | None) -> None:
    """Record wall time of the previous section and start a new one.
    Also snapshots /proc/loadavg at every section boundary (VERDICT r9
    item 7: one start/end pair cannot localize WHEN contention hit a
    15-minute run; the per-section trace can)."""
    now = time.perf_counter()
    if _SECTION_T0[0]:
        prev = _SECTION_T0[1] if len(_SECTION_T0) > 1 else None
        if prev:
            _SECTION_SECS[prev] = round(
                _SECTION_SECS.get(prev, 0.0) + now - _SECTION_T0[0], 1)
            _SECTION_LOAD[prev] = _read_loadavg()
            print(f"## section {prev}: {_SECTION_SECS[prev]}s", file=sys.stderr)
    del _SECTION_T0[:]
    _SECTION_T0.extend([now, name] if name else [now])


def _read_loadavg() -> dict:
    try:
        with open("/proc/loadavg") as fh:
            la = fh.read().split()
        return {
            "load_1m": float(la[0]),
            "load_5m": float(la[1]),
            "load_15m": float(la[2]),
        }
    except OSError:
        return {}


def _idle_gate() -> dict:
    """Wait (bounded) for the host to go idle before timing anything.

    The r6/r7 history shows contended captures keep happening when the
    capture is launched alongside sibling processes — the committed
    idle-box numbers and the driver-run numbers then diverge by pure host
    load.  So every capture self-gates (VERDICT r7 task 5): poll
    /proc/loadavg until BOTH load_1m AND load_5m are below
    SPARK_GRAFT_BENCH_MAX_LOAD (default 2.0) or
    SPARK_GRAFT_BENCH_IDLE_WAIT seconds (default 600) elapse, then
    proceed regardless and RECORD the outcome — a bounded wait can't stall
    the driver, and a timed-out gate is visible in the payload instead of
    masquerading as a clean capture.  Disable with
    SPARK_GRAFT_BENCH_IDLE_GATE=0.

    Gating on load_5m too is the r9 fix (VERDICT r8 task 3): the r8
    capture passed a load_1m-only gate at 0.26 yet ran 30% slower than
    r7's idle capture — siblings had JUST gone quiet (load_5m 4.76, nine
    busy sibling procs) and resumed mid-run.  load_5m is the signal that
    actually predicts a contended run; it decays slowly, hence the longer
    default wait budget.
    """
    gate: dict = {"enabled": os.environ.get(
        "SPARK_GRAFT_BENCH_IDLE_GATE", "1") != "0"}
    if not gate["enabled"]:
        return gate
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT", "600"))
    gate.update(max_load=max_load, max_wait_s=max_wait)
    t0 = time.perf_counter()
    while True:
        la = _read_loadavg()
        waited = round(time.perf_counter() - t0, 1)
        if not la or (la["load_1m"] < max_load and la["load_5m"] < max_load):
            gate.update(outcome="idle", waited_s=waited, **la)
            return gate
        if waited >= max_wait:
            gate.update(outcome="timeout_proceeding_contended",
                        waited_s=waited, **la)
            return gate
        print(
            f"# idle gate: load_1m {la['load_1m']:.2f} / load_5m "
            f"{la['load_5m']:.2f} >= {max_load}, "
            f"waiting ({waited:.0f}/{max_wait:.0f}s)...",
            file=sys.stderr,
        )
        time.sleep(10)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idle_gate = _idle_gate()
    from delta_lake_spark.session import get_spark
    from delta_lake_spark.queries import QUERIES

    spark = get_spark(app_name="delta_lake_spark_bench")
    # warm the JVM + parquet footers so per-query times reflect execution
    spark.range(1).count()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Pre-run load snapshot, taken BEFORE the headline section: until r7
    # host_load_start was measured after ~1 min of 32-thread bench work, so
    # it recorded the bench's OWN load and an idle-box launch still read
    # 9-12 (the r6/r7 "contended capture" confusion).  /proc/loadavg is
    # read here, when the only Spark activity so far is session init.
    pre_run_load = _read_loadavg()
    # Two passes per query; report the warm (best) time as the headline —
    # mirrors the reference's methodology (inputs cached before timing,
    # BASELINE.md) — and the cold first-pass total for completeness.
    _section("headline")
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        times[name] = round(min(cold[name], time.perf_counter() - t0), 3)
        print(
            f"# {name}: warm {times[name]:.3f}s / cold {cold[name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 3)
    # NOTE on key order: the headline keys (metric/value/queries) are added
    # LAST, after every auxiliary section — the driver snapshot records a
    # bounded tail of the output, and the tail of one long JSON line is its
    # final keys (VERDICT r3 task 10: the r3 capture truncated the headline).
    def _host_load() -> dict:
        """Contention fingerprint (VERDICT r4 task 7): a contended driver
        capture (r4: 9.21 s vs 6.60 s solo) should be machine-detectable
        from the payload itself.  Records the 1/5/15-min load averages,
        core count, and how many OTHER live processes are burning CPU."""
        out: dict = {}
        try:
            la1, la5, la15 = os.getloadavg()
            out.update(load_1m=round(la1, 2), load_5m=round(la5, 2),
                       load_15m=round(la15, 2), cpus=os.cpu_count())
        except OSError:
            pass
        try:
            me = os.getpid()
            ppid: dict[int, int] = {}
            busy: list[int] = []
            kthreads = 0
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                try:
                    with open(f"/proc/{pid}/stat") as fh:
                        f = fh.read().rsplit(")", 1)[1].split()
                    ppid[int(pid)] = int(f[1])
                    # utime+stime > 5s of accumulated CPU marks a real worker
                    if (int(f[11]) + int(f[12])) / os.sysconf("SC_CLK_TCK") > 5:
                        # kernel threads (kthreadd descendants / empty
                        # cmdline) are NOT contention: on a long-uptime box
                        # every migration/N thread has accumulated >5s, and
                        # they inflated the census by one per core — the r9
                        # capture's "36 busy siblings" on an idle box was
                        # exactly this artifact (32 migration/N + rcu +
                        # kcompactd + kdamond), machine-verified this round
                        with open(f"/proc/{pid}/cmdline", "rb") as ch:
                            if not ch.read():
                                kthreads += 1
                                continue
                        busy.append(int(pid))
                except (OSError, IndexError, ValueError):
                    continue

            def _mine(pid: int) -> bool:
                # the bench's own JVM + pyspark workers are descendants of
                # this process — only count TRUE siblings as contention
                seen = 0
                while pid > 1 and seen < 64:
                    if pid == me:
                        return True
                    pid = ppid.get(pid, 1)
                    seen += 1
                return False

            out["sibling_busy_procs"] = sum(1 for p in busy if not _mine(p))
            out["kernel_threads_excluded"] = kthreads
        except OSError:
            pass
        return out

    payload = {
        "cold_total": round(sum(cold.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # pre-run loadavg (true launch-time state) + the sibling census
        # from _host_load (the census is load-independent, so taking it
        # post-headline is fine; the LOAD numbers must be pre-run)
        "host_load_start": {**_host_load(), **pre_run_load},
        "idle_gate": idle_gate,
    }

    # Extension-family timings (round-2+ operators) — reported separately so
    # the headline total stays comparable across BENCH_r{N} rounds.  Added to
    # the payload at the END (tail-visibility note above).
    _section("extensions")
    ext: dict[str, float] = {}
    for name in EXTENSIONS:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        ext[name] = round(min(first, time.perf_counter() - t0), 3)

    # Bucketed-storage section (VERDICT r2 task 6): q30's lineitem⋈orders
    # edge on bucketed tables — reports the one-time bucket-write cost next
    # to the warm bucketed query so the break-even vs the headline q30 is
    # visible.  Disable with SPARK_GRAFT_BUCKETED=0.
    _section("bucketed")
    if os.environ.get("SPARK_GRAFT_BUCKETED", "1") != "0":
        try:
            from delta_lake_spark.benchmark.bucketed import run_bucketed_q30

            payload["bucketed"] = run_bucketed_q30(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "bucketed"),
            )
            payload["bucketed"]["q30_headline"] = times.get("q30_local_supplier_volume")
        except Exception as exc:
            payload["bucketed"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Scale-up section (VERDICT r2 task 4): the same headline queries on a
    # deterministic 10x replication of sf0.1 ("sf1x", FK-consistent offset
    # keys, permuted doc text — see benchmark/scaleup.py), with per-query
    # scaling ratios vs this run's sf0.1 warm times.  Generated once and
    # cached under benchdata/sf1x.  Disable with SPARK_GRAFT_SCALE=0.
    _section("scale_sf1x")
    if os.environ.get("SPARK_GRAFT_SCALE", "1") != "0":
        try:
            from delta_lake_spark.benchmark.scaleup import generate_scaled_corpus

            sf1x_dir = os.environ.get(
                "SPARK_GRAFT_SCALE_DIR",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "sf1x"),
            )
            gen = generate_scaled_corpus(spark, sf_dir, sf1x_dir, copies=10)
            sc_times: dict[str, float] = {}
            for name in HEADLINE:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf1x_dir).count()
                first = time.perf_counter() - t0
                t0 = time.perf_counter()
                QUERIES[name](spark, sf1x_dir).count()
                sc_times[name] = round(min(first, time.perf_counter() - t0), 3)
                print(f"# sf1x {name}: warm {sc_times[name]:.3f}s", file=sys.stderr)
            payload["scale_sf1x"] = {
                **gen,
                "queries": sc_times,
                "total_warm": round(sum(sc_times.values()), 3),
                "ratio_vs_sf0.1": {
                    n: round(sc_times[n] / times[n], 2)
                    for n in sc_times
                    if times.get(n)
                },
            }
        except Exception as exc:
            payload["scale_sf1x"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Skewed-corpus section (VERDICT r3 task 6): salted join / two-phase agg
    # vs plain plans on a power-law-skewed 50x events replication (~20% of
    # rows on one key), results checksum-verified identical.  Disable with
    # SPARK_GRAFT_SKEW=0.
    _section("skew")
    if os.environ.get("SPARK_GRAFT_SKEW", "1") != "0":
        try:
            from delta_lake_spark.benchmark.skewbench import run_skew_bench

            payload["skew"] = run_skew_bench(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "skew"),
            )
        except Exception as exc:
            payload["skew"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Vector-index section (r4): the maintained partitioned ANN index vs a
    # brute-force exact scan — build cost, probe latency at nprobe=1/5, and
    # measured recall@10.  Disable with SPARK_GRAFT_VECTOR=0.
    _section("vector_index")
    if os.environ.get("SPARK_GRAFT_VECTOR", "1") != "0":
        try:
            from delta_lake_spark.benchmark.vector_bench import run_vector_index

            payload["vector_index"] = run_vector_index(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "vector_index"),
            )
        except Exception as exc:
            payload["vector_index"] = {"error": f"{type(exc).__name__}: {exc}"}

    # 100x-shape section (VERDICT r3 task 8): the 5 heaviest headline
    # queries on a 100-copy FK-consistent corpus (~60M lineitem rows, ~1.5GB
    # parquet — the single-node memory/disk ceiling is far above this, so no
    # honesty caveat needed at this size).  Ratios vs this run's sf0.1 warm
    # times; <=~100x time for 100x data = no superlinear blowup.
    #
    # OPT-IN (SPARK_GRAFT_SCALE100=1): this section alone costs ~290s wall
    # (cold first passes at 60M rows), which pushed the full bench past the
    # driver's 10-minute capture budget.  The measured result is committed
    # as BENCH_SCALE100.json (solo run, same methodology, per-query ratios)
    # so the evidence stays in-repo without re-paying the cost every round.
    _section("scale_100x")
    # isolate the heavy scale sections from earlier sections' persisted
    # frames (measurement hygiene: cached signature/scored frames from the
    # query sections otherwise compete for executor memory here)
    spark.catalog.clearCache()
    if os.environ.get("SPARK_GRAFT_SCALE100", "0") == "1":
        try:
            from delta_lake_spark.benchmark.scaleup import generate_scaled_corpus

            sf10x_dir = os.environ.get(
                "SPARK_GRAFT_SCALE100_DIR",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "sf10x"),
            )
            gen100 = generate_scaled_corpus(spark, sf_dir, sf10x_dir, copies=100)
            heavy = [
                "q30_local_supplier_volume",
                "d06_minhash_lsh_pairs",
                "t04_langid_confusion",
                "q04_fraud_analysis",
                "q11_top3_orders_per_customer",
                "p05_forgetting_pipeline",  # r6: LSH + CC expansion at 100x
            ]
            sc100: dict[str, float] = {}
            # non-headline heavy entries need their own sf0.1 reference for
            # the ratio (headline ones reuse the times{} measurements)
            ref01 = dict(times)
            for name in heavy:
                if name not in ref01:
                    QUERIES[name](spark, sf_dir).count()
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).count()
                    ref01[name] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
                QUERIES[name](spark, sf10x_dir).count()
                first = time.perf_counter() - t0
                t0 = time.perf_counter()
                QUERIES[name](spark, sf10x_dir).count()
                sc100[name] = round(min(first, time.perf_counter() - t0), 3)
                print(f"# sf10x {name}: warm {sc100[name]:.3f}s", file=sys.stderr)
            payload["scale_100x"] = {
                **gen100,
                "queries": sc100,
                "total_warm": round(sum(sc100.values()), 3),
                "ratio_vs_sf0.1": {
                    n: round(sc100[n] / ref01[n], 2) for n in sc100 if ref01.get(n)
                },
            }
        except Exception as exc:
            payload["scale_100x"] = {"error": f"{type(exc).__name__}: {exc}"}
    else:
        payload["scale_100x"] = {
            "skipped": "opt-in (SPARK_GRAFT_SCALE100=1) — measured solo, "
                       "committed as BENCH_SCALE100.json"
        }

    # Reference-scale section (BASELINE.md is timed at 10-11M fact rows, not
    # sf0.1): the same marts + scan suite at the reference's own row count.
    # Data is generated once (seeded) and cached under benchdata/; repeat
    # runs only pay the timed segments.  Disable with SPARK_GRAFT_10M=0.
    _section("ref10m")
    spark.catalog.clearCache()
    if os.environ.get("SPARK_GRAFT_10M", "1") != "0":
        try:
            from delta_lake_spark.benchmark import run_ref10m

            payload["ref10m"] = run_ref10m(
                spark,
                os.environ.get(
                    "SPARK_GRAFT_10M_DIR",
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchdata", "ref10m"),
                ),
                num_records=int(os.environ.get("SPARK_GRAFT_10M_ROWS", 10_000_000)),
            )
        except Exception as exc:  # keep the headline line parseable
            payload["ref10m"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Round-4 additions timed separately so extensions_total_warm stays
    # comparable across BENCH_r{N} rounds.
    # Deletion-vector section: merge-on-read vs copy-on-write DELETE on a
    # lineitem-backed managed table — write cost, read rent, purge cost,
    # checksum-identical results.  Disable with SPARK_GRAFT_DV=0.
    _section("deletion_vectors")
    if os.environ.get("SPARK_GRAFT_DV", "1") != "0":
        try:
            from delta_lake_spark.benchmark.dvbench import run_dv_bench

            payload["deletion_vectors"] = run_dv_bench(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "dv"),
            )
        except Exception as exc:
            payload["deletion_vectors"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Incremental-clustering section: liquid-style maintenance pass after a
    # 5% append vs a forced full re-cluster, plus the data-skipping proof
    # that survives the incremental pass.  Disable with SPARK_GRAFT_CLUSTER=0.
    _section("clustering")
    if os.environ.get("SPARK_GRAFT_CLUSTER", "1") != "0":
        try:
            from delta_lake_spark.benchmark.clusterbench import run_cluster_bench

            payload["clustering"] = run_cluster_bench(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "clustering"),
            )
        except Exception as exc:
            payload["clustering"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Incremental-view maintenance section: O(changed rows) refresh vs a
    # full re-aggregate, both result-verified (tables/matview.py,
    # tables/sketchview.py).  Disable with SPARK_GRAFT_INCVIEW=0.
    _section("incremental_views")
    if os.environ.get("SPARK_GRAFT_INCVIEW", "1") != "0":
        try:
            from delta_lake_spark.benchmark.incviews import run_incview_bench

            payload["incremental_views"] = run_incview_bench(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "incviews"),
            )
        except Exception as exc:
            payload["incremental_views"] = {"error": f"{type(exc).__name__}: {exc}"}

    _section("extensions_r4")
    ext_r4: dict[str, float] = {}
    for name in (
        "d13_contamination_scan",
        "t10_ngram_novelty",
        "s05_per_source_cap",
        "t11_char_distribution",
        "q44_balance_standing",
        "p01_curation_pipeline",
        "t13_bm25_search",
        "t14_chunk_inventory",
        "d16_duplicate_chunks",
        "t17_bpe_pair_counts",
        "q63_event_cooccurrence",
        "p02_packing_pipeline",
        "d17_duplicated_spans",
        "q64_linear_interpolation",
        "q65_ewma_smoothing",
        "v11_matryoshka_ann",
        "q66_variant_props",
        "t18_readability",
        "d18_containment_pairs",
        "q67_touch_attribution",
        "s08_curriculum_sample",
        "t19_collocations",
        "v12_ndcg_eval",
        "d19_edit_distance_rerank",
        "q68_peak_concurrency",
        "q69_twap",
        "t20_vocab_richness",
        "q70_distribution_ranks",
        "q71_scd2_tier_history",
        "s09_leakage_safe_split",
        "q76_running_distinct_users",
        "v13_filtered_ann",
        "q77_top_event_trigrams",
        "q78_longest_daily_streak",
        "q79_funnel_conversion",
        "s10_weighted_pps_sample",
        "t21_heavy_hitters",
        "q80_session_pattern_match",
        "d20_prefix_filter_jaccard",
        "t22_decontamination",
        "s11_epoch_shuffle",
        "v15_label_diversified_topk",
        "t23_bigram_lm_score",
        "v16_knn_graph",
        "p03_release_pipeline",
        "s12_mixture_plan",
        "q81_ab_experiment_readout",
        "t30_calibration_bins",      # r6: classifier reliability table
        "v22_rrf_hybrid_search",     # r6: BM25+cosine RRF fusion
        "s17_temperature_mixture",   # r6: alpha=0.5 mixture scaling
        "p05_forgetting_pipeline",   # r6: takedown + near-dup expansion
        "q106_k_anonymity",          # r6: governance release audit
        "t31_zipf_rank_bands",       # r6: corpus Zipf audit
        "v23_sq_recall",             # r6: int8-SQ recall audit
        "m08_media_header_audit",    # r6: oracle-checked byte decode
    ):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        ext_r4[name] = round(min(first, time.perf_counter() - t0), 3)
    payload["extensions_r4"] = ext_r4

    # Incremental-dedup-index section: per-batch ingest cost (flat) vs the
    # one-shot d09 rerun (grows with the corpus), results verified equal.
    # Disable with SPARK_GRAFT_DEDUPIDX=0.
    _section("incremental_dedup")
    if os.environ.get("SPARK_GRAFT_DEDUPIDX", "1") != "0":
        try:
            from delta_lake_spark.benchmark.dedupindexbench import (
                run_dedup_index_bench,
            )

            payload["incremental_dedup"] = run_dedup_index_bench(
                spark,
                sf_dir,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchdata", "dedupidx"),
            )
        except Exception as exc:
            payload["incremental_dedup"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Graph section: exact triangle census + exact-integer PageRank over the
    # part co-purchase graph.  Census-class analytics (each pass touches the
    # whole edge set; PageRank runs 10 full iterations) — timed at sf0.01
    # cold so the per-round bench stays fast, with the sf0.1 cost measured
    # once and quoted in COVERAGE.md (~21s / ~15s warm on local[32]).
    # Disable with SPARK_GRAFT_GRAPH=0.
    _section("graph_sf001")
    if os.environ.get("SPARK_GRAFT_GRAPH", "1") != "0":
        try:
            graph: dict[str, float] = {"sf": 0.01}
            for name in (
                "q72_triangle_census",
                "q73_copurchase_pagerank",
                "q101_clustering_coefficient",
                "d10_dedup_clusters",
            ):
                t0 = time.perf_counter()
                QUERIES[name](spark, "/root/testdata/sf0.01").count()
                graph[name] = round(time.perf_counter() - t0, 3)
            payload["graph_sf001"] = graph
        except Exception as exc:
            payload["graph_sf001"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Graph section at the HEADLINE scale (VERDICT r4 task 2: the honest
    # sf0.1 numbers, not just the sf0.01 fast row).  Census-class cost by
    # nature — ~45 s cold on local[32] — so it runs inside the per-round
    # bench with its own opt-out (SPARK_GRAFT_GRAPH_SF01=0).  Order matters:
    # q72 first pays the shared persisted co-purchase edge build +
    # orientation (queries/tpch_gap._copurchase_edges — plan-equal across
    # q72/q73/q101, so the session cache substitutes it for the rest).
    _section("graph_sf01")
    if (
        os.environ.get("SPARK_GRAFT_GRAPH", "1") != "0"
        and os.environ.get("SPARK_GRAFT_GRAPH_SF01", "1") != "0"
    ):
        try:
            spark.catalog.clearCache()
            graph01: dict[str, float] = {
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf
            }
            for name in (
                "q72_triangle_census",
                "q101_clustering_coefficient",
                "q73_copurchase_pagerank",
                "d10_dedup_clusters",
            ):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                graph01[name] = round(time.perf_counter() - t0, 3)
            payload["graph_sf01"] = graph01
        except Exception as exc:
            payload["graph_sf01"] = {"error": f"{type(exc).__name__}: {exc}"}

    _section(None)
    payload["section_secs"] = _SECTION_SECS
    payload["section_load"] = _SECTION_LOAD
    payload["extensions"] = ext
    payload["extensions_total_warm"] = round(sum(ext.values()), 3)
    payload["host_load_end"] = _host_load()
    payload["metric"] = "headline_total_warm"
    payload["unit"] = "sec"
    # The queries map ADDITIONALLY carries the extension queries the r9/r10
    # optimization rounds actually touched (VERDICT r9 item 7: PERF compares
    # only this map round-over-round, and the optimizer's targets live in
    # the extension sections it never compared per-query).  Same warm
    # methodology (min of two passes); `value` stays the 16-query headline
    # total so the metric's definition is unchanged — additions only.
    touched = {
        n: ext[n]
        for n in (
            "q22_balance_quartiles", "q39_exact_percentile_outliers",
            "q53_sole_return_suppliers", "q57_min_cost_supplier",
            "q91_market_basket_lift", "q93_rfm_segments",
            "q96_pareto_customers", "q97_segment_migration",
            "q105_frequent_triples", "t25_classifier_auc",
            "t27_quality_rank_correlation", "s13_dsir_importance",
        )
        if n in ext
    }
    for n in ("s11_epoch_shuffle", "p03_release_pipeline",
              "p05_forgetting_pipeline", "t13_bm25_search",
              "d20_prefix_filter_jaccard", "d15_semantic_dedup"):
        if n in ext_r4:
            touched[n] = ext_r4[n]
    payload["queries"] = {**times, **touched}
    payload["value"] = total

    # The driver snapshot keeps only a bounded tail (~2000 chars) of stdout
    # and parses the JSON it finds there.  The full payload is now ~7KB — a
    # mid-line tail of it is unparseable (this is what blanked r3's parsed
    # record).  So: write the FULL payload to bench_full.json next to this
    # script, and print a COMPACT line (headline contract keys + section
    # roll-ups, guaranteed < ~1900 bytes) as the LAST stdout line.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    with open(full_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload), file=sys.stderr)

    def _num(d, key):
        v = (d or {}).get(key) if isinstance(d, dict) else None
        return v if isinstance(v, (int, float)) else None

    compact = {
        "full_payload": "bench_full.json",
        "sf": payload["sf"],
        "cold_total": payload["cold_total"],
        "extensions_total_warm": payload["extensions_total_warm"],
        "extensions_r4_total_warm": round(sum(ext_r4.values()), 3),
        "d12_warm": ext.get("d12_simhash_near_pairs"),
        "ref10m_total": _num(payload.get("ref10m"), "total"),
        "ref10m_load": _num(payload.get("ref10m"), "load"),
        "scale_sf1x_total": _num(payload.get("scale_sf1x"), "total_warm"),
        "scale_100x_total": _num(payload.get("scale_100x"), "total_warm"),
        "skew_salted_speedup": _num(
            payload.get("skew"), "join_salted_speedup_vs_noskewfix"),
        "graph_sf01_total": (
            round(sum(v for k, v in payload["graph_sf01"].items()
                      if k != "sf" and isinstance(v, (int, float))), 3)
            if isinstance(payload.get("graph_sf01"), dict)
            and "error" not in payload.get("graph_sf01", {})
            else None
        ),
        "host_load": _num(payload.get("host_load_end"), "load_5m"),
        "sibling_busy_procs": _num(
            payload.get("host_load_end"), "sibling_busy_procs"),
        "section_secs": _SECTION_SECS,
        "metric": "headline_total_warm",
        "unit": "sec",
        "queries": payload["queries"],
        "value": total,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # belt-and-braces: drop roll-ups until it fits
        for k in ("section_secs", "extensions_r4_total_warm", "d12_warm",
                  "scale_sf1x_total", "scale_100x_total",
                  "skew_salted_speedup", "ref10m_load",
                  "graph_sf01_total", "sibling_busy_procs"):
            compact.pop(k, None)
            line = json.dumps(compact)
            if len(line) <= 1900:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
