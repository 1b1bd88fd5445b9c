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
# Round-7 rotation (VERDICT r6 task 2, the final certification close-out):
# Round-8 window (VERDICT r7 task 2 — the recency ratchet): the external
# certification program completed in round 7 (cumulative 201/201 oracle-backed
# queries hard-certified; see CERTIFIED.json). From this round on the window
# holds the 50 queries whose *latest* external certification is oldest —
# computed deterministically by `python tools/certified_ledger.py --stalest
# 50` (sort by latest certified round, ties by name). This round that is
# q01_pricing_summary (last certified r3; every other r3 row was re-certified
# in r7's tail) plus the 49 oldest r4 rows, so after r8 no query's external
# check is older than r4 and the histogram advances one round per round.
# Every query below is green in the local all-oracle sweep
# (tests/test_oracle_parity.py replicates the driver's t2 gate exactly) and
# in the two-profile determinism + NY-timezone sweeps.
DRIVER_WINDOW = [
    # dedup family
    "d06_minhash_lsh_pairs",
    "d10_dedup_clusters",
    "d17_duplicated_spans",
    "d20_prefix_filter_jaccard",
    "d21_semantic_dedup_survivors",
    # multimodal family
    "m01_payload_metadata",
    # pipeline family
    "p01_curation_pipeline",
    "p03_release_pipeline",
    # relational / time-series analytics
    "q01_pricing_summary",
    "q02_client_stats",
    "q03_daily_metrics",
    "q04_fraud_analysis",
    "q13_set_ops",
    "q18_rollup_flags",
    "q21_global_stats",
    "q22_balance_quartiles",
    "q24_cube_order_mix",
    "q25_rolling_7d_volume",
    "q26_exists_urgent_no_failed",
    "q31_returned_items",
    "q32_promo_revenue_share",
    "q33_activity_reconciliation",
    "q35_orders_above_customer_avg",
    "q36_unpivot_segment_metrics",
    "q37_top_supplier_revenue",
    "q38_monthly_rollup_from_daily",
    "q41_grouping_sets",
    "q42_right_join_order_coverage",
    "q43_coverage_matrix",
    "q46_market_share",
    "q49_order_count_distribution",
    "q57_min_cost_supplier",
    "q60_correlation_matrix",
    "q62_feature_drift",
    "q66_variant_props",
    "q68_peak_concurrency",
    "q71_scd2_tier_history",
    "q72_triangle_census",
    "q73_copurchase_pagerank",
    "q76_running_distinct_users",
    "q79_funnel_conversion",
    "q82_interval_union_coverage",
    "q83_mad_outliers",
    # sampling family
    "s01_hash_split_sample",
    "s09_leakage_safe_split",
    "s10_weighted_pps_sample",
    # text-analysis family
    "t01_dedup_exact",
    "t21_heavy_hitters",
    "t22_decontamination",
    # vector family
    "v02_embedding_near_dups",
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
