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
# Round-10 rotation (VERDICT r9 task 9): the next stalest-50 by the ledger
# (`python tools/certified_ledger.py --stalest 50` — sort by latest
# certified round, ties by name), advancing the certification-freshness
# floor to r6.
# Every query below is green in the local all-oracle sweep
# (tests/test_oracle_parity.py replicates the driver's t2 gate exactly) and
# in the two-profile determinism + NY-timezone sweeps.
DRIVER_WINDOW = [
    "v20_range_search",
    "d16_duplicate_chunks",
    "d19_edit_distance_rerank",
    "q44_balance_standing",
    "q45_retention_cohorts",
    "q47_supplier_breadth",
    "q50_small_quantity_revenue",
    "q51_large_orders",
    "q52_disjunctive_revenue",
    "q54_important_parts",
    "q56_product_profit",
    "q58_conversion_funnel",
    "q59_daily_ohlc",
    "q61_event_transitions",
    "q63_event_cooccurrence",
    "q64_linear_interpolation",
    "q65_ewma_smoothing",
    "q67_touch_attribution",
    "q69_twap",
    "q70_distribution_ranks",
    "q74_pit_tier_enrichment",
    "q75_hierarchy_rollup",
    "q77_top_event_trigrams",
    "q78_longest_daily_streak",
    "q80_session_pattern_match",
    "q81_ab_experiment_readout",
    "s04_length_weighted_sample",
    "s05_per_source_cap",
    "s06_cluster_balanced_sample",
    "s07_training_shards",
    "s08_curriculum_sample",
    "s16_annealed_mixture_schedule",
    "t10_ngram_novelty",
    "t11_char_distribution",
    "t12_tfidf_top_terms",
    "t13_bm25_search",
    "t14_chunk_inventory",
    "t15_pii_redaction",
    "t16_classifier_scores",
    "t17_bpe_pair_counts",
    "t18_readability",
    "t19_collocations",
    "t20_vocab_richness",
    "v08_quantized_ann",
    "v09_kmeans_clusters",
    "v11_matryoshka_ann",
    "v12_ndcg_eval",
    "v13_filtered_ann",
    "v14_hard_negatives",
    "v15_label_diversified_topk",
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
