"""Partition-count independence: the certification behind every oracle claim.

The DuckDB hash gate proves Spark == DuckDB at ONE parallelism profile; this
test proves the Spark side is invariant to the physical execution profile
itself.  Two separate-JVM sessions with deliberately different executor
thread counts, shuffle partition counts, and input-split sizes must produce
byte-identical canonical digests for a representative query slice — joins,
windows, sessionization, LSH dedup, vector top-k, text aggs, the new sweep
/ TWAP operators.  Any hidden order-dependence (float accumulation order,
unstable tie-breaks, partition-dependent sampling) shows up here even when
a single-profile oracle run happens to pass.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMOKE

# One representative per operator family.  Excluded by design: v05 (numpy
# float centroid math, documented parity-unsafe) and the Arrow/pandas
# rows-only stages (m02-m04) whose outputs embed batch shapes.
_NAMES = [
    "q01_pricing_summary",       # decimal multi-agg
    "q02_client_stats",          # broadcast join + 5-key agg
    "q11_top3_orders_per_customer",  # ranking window
    "q27_user_sessions",         # sessionization
    "q34_shipments_after_urgent_orders",  # binned range join
    "q41_grouping_sets",         # grouping sets + GROUPING()
    "q45_retention_cohorts",     # cohort windows
    "q58_conversion_funnel",     # staged conditional mins
    "q64_linear_interpolation",  # anchored gap interpolation
    "q65_ewma_smoothing",        # integer convolution
    "q67_touch_attribution",     # conditional window lookbacks
    "q68_peak_concurrency",      # day-partitioned sweep line
    "q69_twap",                  # interval-weighted mean
    "q70_distribution_ranks",    # percent_rank/cume_dist/nth_value
    "d06_minhash_lsh_pairs",     # LSH band join
    "d07_simhash",               # bitwise fold
    "d19_edit_distance_rerank",  # candidate-bounded Levenshtein
    "t09_token_budget_packing",  # windowed cumsum packer
    "t20_vocab_richness",        # token explode + two-level agg
    "v01_cosine_topk",           # exact vector top-k
    "v04_bucketed_ann",          # hyperplane-bucketed ANN
    "s01_hash_split_sample",     # content-addressed sampling
    "p02_packing_pipeline",      # composed chunk->dedup->pack pipeline
    "q71_scd2_tier_history",     # SCD2 collapse-chain windows (r4 tail)
    "q73_copurchase_pagerank",   # iterative integer fixpoint + localCheckpoint
    "q75_hierarchy_rollup",      # pointer-doubling ancestor flattening
    "s09_leakage_safe_split",    # fingerprint-keyed split
    "s11_epoch_shuffle",         # global positions via range-repartition
    "p03_release_pipeline",      # composed decontaminate->dedup->gate->shuffle
    "v16_knn_graph",             # LSH-bucketed kNN graph
    "q81_ab_experiment_readout", # hash-armed conditional aggregate
    "q82_interval_union_coverage",  # interval-union islands (r4 wave 16)
    "v17_kmeans_exact",          # integer Lloyd w/ bounded driver collects
    "d21_semantic_dedup_survivors",  # centroid-distance keep rule
    "t25_classifier_auc",        # global_cumsum (partition-count input)
    "q93_rfm_segments",          # 3x global_row_number (partition-count input)
    "v19_pq_shortlist_rerank",   # two-stage ADC shortlist + exact rerank
    "q53_sole_return_suppliers", # r5 rewrite: order-partitioned breadth window
    "q57_min_cost_supplier",     # r5 rewrite: part-partitioned argmin window
    "q101_clustering_coefficient",  # r6 rewrite: edge-iterator adjacency kernel
    "q72_triangle_census",       # r6 rewrite: array_intersect triangle count
]
# Round-8 re-run (after the degenerate-RELATIONAL hardening: try_divide /
# try_cast / try_parse_json symmetric NULL rules, the NULLS FIRST oracle
# convention, the _VALUE_DOMAIN event gate, q49's key collapse, q75's
# synthesized pointer universe, q93's chained rankings, q11's
# NULL-price-last sort struct, and the q60 DECIMAL(19,2) widening): the
# FULL 201-query registry diffed byte-identical between local[3]/3/128MB
# and local[8]/17/256KB at sf0.01, and the 201-query DuckDB hash sweep
# passed under both a plain UTC and an America/New_York driver session
# the same day (2026-08-16).
# Round-7 re-run (after the degenerate-input kernel hardening — guarded
# shingle/winnow/char-ngram sequences, the internal minhash graph gate,
# graph_docs in near_dedup, the q30 join-order rewrite, and the
# ops/lineage pin() refactor): the FULL 201-query registry diffed
# byte-identical between local[3]/3/128MB and local[8]/17/256KB at
# sf0.01, and the 201-query DuckDB hash sweep passed under an
# America/New_York plain driver session the same day.
# The eight r6 session-2 additions (t30 calibration bins, v22 RRF hybrid,
# s17 temperature mixture, p05 forgetting pipeline, q106 k-anonymity,
# t31 Zipf bands, v23 SQ recall, m08 media header audit) each passed the
# two-profile + NY-timezone sweep on landing, and the FULL 201-query
# registry was re-swept at session close (after the p03 localCheckpoint
# cut and the session-cached BM25 postings): zero digest diffs across
# local[3]/3/128MB, local[8]/17/256KB, and an America/New_York JVM.
# Earlier full run for the record: the 193-query registry passed the same
# sweep at round-6 session-1 close (sf0.01 — every digest
# byte-identical between local[3]/3-partition/128MB-split and
# local[8]/17-partition/256KB-split profiles, re-run after ALL r6 changes
# incl. the q11 bounded-agg rewrite, the q72/q101 edge-iterator kernel +
# per-order edge enumeration, session-cached kmeans assignments, the
# global_ntile literal-total and bigram vocab-count job cuts, and the p03
# tokenize-once frame; an America/New_York-JVM run of the same 193 diffed
# byte-identical against the UTC profile too; too slow for every suite
# run) — re-run it with:
# python tests/determinism_child.py <sf> local[3] 3 134217728 a.tsv
# $(python -c 'from delta_lake_spark.queries import ORACLE; print(*sorted(ORACLE))')
# and diff against a local[8]/17/262144 run.  Notably this covers the exact
# global ranking paths (s11/p03 positions) whose num_partitions input
# DIFFERS between the two profiles.

_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "determinism_child.py")


def _run_child(sf_dir: str, master: str, shuffle: str, max_bytes: str, out: str) -> dict[str, str]:
    subprocess.run(
        [sys.executable, _CHILD, sf_dir, master, shuffle, max_bytes, out, *_NAMES],
        check=True,
        timeout=900,
        env={**os.environ, "SPARK_LOCAL_IP": "127.0.0.1"},
    )
    digests = {}
    with open(out) as fh:
        for line in fh:
            name, dig = line.strip().split("\t")
            digests[name] = dig
    return digests


@pytest.mark.full  # 3-minute two-profile subprocess sweep: round-close tier
def test_results_invariant_across_parallelism_profiles(tmp_path):
    # profile A: few fat partitions; profile B: many thin ones + tiny splits
    a = _run_child(SF_SMOKE, "local[3]", "3", str(128 * 1024 * 1024), str(tmp_path / "a.tsv"))
    b = _run_child(SF_SMOKE, "local[8]", "17", str(256 * 1024), str(tmp_path / "b.tsv"))
    assert set(a) == set(_NAMES) and set(b) == set(_NAMES)
    diffs = [n for n in _NAMES if a[n] != b[n]]
    assert not diffs, f"partition-dependent results: {diffs}"
