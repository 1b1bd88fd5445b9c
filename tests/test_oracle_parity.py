"""Local replica of the driver's t2 gate: every registered query must match
its DuckDB oracle exactly (row count + sorted values) at sf0.01."""

from __future__ import annotations

import pytest

from delta_lake_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare_one, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CORRECT)
    yield con
    con.close()


# Fast-gate parity set (VERDICT r9 item 1): the queries the DRIVER's t2
# gate actually checks (the curated first-50 window), the 16 headline bench
# queries, and every query the r9/r10 optimization rounds touched.  The
# remaining registry rows run in the full tier (SPARK_GRAFT_TESTS_FULL=1,
# always on in the round-close check) — they are oracle-certified by the
# ledger and unchanged by default.
def _fast_parity_names() -> set:
    import __spark_entry__ as entry

    headline = {
        "q01_pricing_summary", "q02_client_stats", "q03_daily_metrics",
        "q04_fraud_analysis", "q30_local_supplier_volume",
        "q11_top3_orders_per_customer", "q23_user_event_gaps",
        "q09_date_spine_ffill", "q19_asof_event_rates", "t01_dedup_exact",
        "t04_langid_confusion", "t05_winnow_fingerprints",
        "d06_minhash_lsh_pairs", "v01_cosine_topk", "v04_bucketed_ann",
        "m02_frame_features",
    }
    touched = {
        # r9 ranking/prefix-exchange rewrites + r10 cumsum/CC/fusion work
        "q22_balance_quartiles", "q39_exact_percentile_outliers",
        "q53_sole_return_suppliers", "q57_min_cost_supplier",
        "q70_distribution_ranks", "q83_mad_outliers", "q90_ship_latency_slo",
        "q91_market_basket_lift", "q93_rfm_segments", "q96_pareto_customers",
        "q97_segment_migration", "q105_frequent_triples",
        "s01_hash_split_sample", "s08_curriculum_sample",
        "s10_weighted_pps_sample", "s11_epoch_shuffle", "t13_bm25_search",
        "t21_heavy_hitters", "t25_classifier_auc",
        "t27_quality_rank_correlation", "p03_release_pipeline",
        "p04_mixture_materialization", "p05_forgetting_pipeline",
        "d10_dedup_clusters", "q73_copurchase_pagerank",
        "v07_ann_recall", "v19_pq_shortlist_rerank", "v21_ivfpq_ann",
        "d15_semantic_dedup", "d20_prefix_filter_jaccard",
    }
    return set(entry.DRIVER_WINDOW) | headline | touched


_FAST = _fast_parity_names()


@pytest.mark.parametrize(
    "name",
    [
        n if n in _FAST else pytest.param(n, marks=pytest.mark.full)
        for n in sorted(ORACLE)
    ],
)
def test_query_matches_oracle(spark, duck, name):
    res = compare_one(spark, duck, name, QUERIES[name], ORACLE[name], SF_CORRECT)
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_callable():
    assert QUERIES, "registry must not be empty"
    for name in ORACLE:
        assert name in QUERIES


def test_entry_smoke(spark):
    import __spark_entry__

    df = __spark_entry__.entry(spark)
    assert df.count() > 0


def test_driver_window_pinned_to_registry():
    """ADVICE r3: the curated first-50 window must never silently shrink —
    every name must exist in the registry, carry an oracle, and the head of
    queries()/oracle_sql() must be exactly the window."""
    import __spark_entry__ as entry

    assert len(entry.DRIVER_WINDOW) == 50
    assert len(set(entry.DRIVER_WINDOW)) == 50
    missing = [k for k in entry.DRIVER_WINDOW if k not in QUERIES]
    assert not missing, f"window names absent from registry: {missing}"
    no_oracle = [k for k in entry.DRIVER_WINDOW if k not in ORACLE]
    assert not no_oracle, f"window names without an oracle: {no_oracle}"
    assert list(entry.queries())[:50] == entry.DRIVER_WINDOW
    assert list(entry.oracle_sql())[:50] == entry.DRIVER_WINDOW
