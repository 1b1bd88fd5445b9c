"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are populated from the engine's registry
(delta_lake_spark.queries) — one entry per implemented operator cluster from
SURVEY.md §2 plus the LLM-pipeline extension operators (dedup, similarity,
text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the client_stats mart analog
    (broadcast dim join + multi-key agg, reference deltalake.ipynb:1273-1281)."""
    from delta_lake_spark.queries import QUERIES

    return QUERIES["q02_client_stats"](spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS ledger checks the FIRST 50 entries of queries();
# registration (import) order previously decided the window, which pushed the
# dedup/vector/multimodal/sampling extension families out of it in round 2.
# This explicit window curates which 50 face the driver.
#
# Recency ratchet (VERDICT r7 task 2, standing): the window holds the 50
# queries whose *latest* external certification is oldest — computed
# deterministically by `python tools/certified_ledger.py --stalest 50`
# (sort by latest certified round, ties by name).
# Round-9 rotation (VERDICT r8 task 4): v16_knn_graph (the single row whose
# freshest certification is still r4) plus the 49 oldest r5 rows, so after
# r9 the certification-freshness floor advances to r5.
# Every query below is green in the local all-oracle sweep
# (tests/test_oracle_parity.py replicates the driver's t2 gate exactly) and
# in the two-profile determinism + NY-timezone sweeps.
DRIVER_WINDOW = [
    "v16_knn_graph",
    "d13_contamination_scan",
    "d14_lsh_band_tuning",
    "d15_semantic_dedup",
    "d18_containment_pairs",
    "d22_cross_source_dup_matrix",
    "m07_chunk_dedup_report",
    "p02_packing_pipeline",
    "p04_mixture_materialization",
    "q100_order_splitting",
    "q101_clustering_coefficient",
    "q102_priority_segment_chi2",
    "q103_benford_screen",
    "q104_order_cadence",
    "q105_frequent_triples",
    "q39_exact_percentile_outliers",
    "q53_sole_return_suppliers",
    "q55_table_profile",
    "q84_dominant_part_suppliers",
    "q85_rich_inactive_customers",
    "q86_seasonal_deviation",
    "q87_rolling_active_users",
    "q88_full_coverage_customers",
    "q89_revenue_gini",
    "q90_ship_latency_slo",
    "q91_market_basket_lift",
    "q92_retention_cohorts",
    "q93_rfm_segments",
    "q94_repurchase_intervals",
    "q95_supplier_hhi",
    "q96_pareto_customers",
    "q97_segment_migration",
    "q98_new_vs_returning",
    "q99_value_bands",
    "s11_epoch_shuffle",
    "s12_mixture_plan",
    "s13_dsir_importance",
    "s14_neyman_allocation",
    "s15_kfold_assignment",
    "t23_bigram_lm_score",
    "t24_boilerplate_ngrams",
    "t25_classifier_auc",
    "t26_langid_kappa",
    "t27_quality_rank_correlation",
    "t28_lexical_diversity",
    "t29_tokenizer_fertility",
    "v10_cluster_quality",
    "v17_kmeans_exact",
    "v18_pq_ann",
    "v19_pq_shortlist_rerank",
]

def _curated(mapping: dict) -> dict:
    # Fail loudly if the window drifts from the registry: a silent drop would
    # shrink the curated head below 50 and let an uncurated tail query slide
    # into the driver's first-50 gate with no signal.
    missing = [k for k in DRIVER_WINDOW if k not in mapping]
    if missing:
        raise KeyError(
            f"DRIVER_WINDOW names absent from the query registry: {missing}"
        )
    if len(DRIVER_WINDOW) != 50 or len(set(DRIVER_WINDOW)) != 50:
        raise ValueError(
            f"DRIVER_WINDOW must hold exactly 50 unique names, got "
            f"{len(DRIVER_WINDOW)} ({len(set(DRIVER_WINDOW))} unique)"
        )
    head = {k: mapping[k] for k in DRIVER_WINDOW}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from delta_lake_spark.queries import QUERIES

    return _curated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from delta_lake_spark.queries import ORACLE

    return _curated(dict(ORACLE))
