"""End-to-end medallion pipeline tests (SURVEY.md §3): full build parity
with the oracle-checked registry queries, then incremental refresh
equivalence with a full rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.pipeline import MedallionPipeline
from delta_lake_spark.pipeline.marts import client_stats_mart, daily_metrics_mart
from delta_lake_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def rowset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    p = MedallionPipeline(spark, str(tmp_path_factory.mktemp("lake")), SF_SMOKE)
    p.run()
    return p


def test_gold_matches_registry_queries(spark, pipe):
    """Gold marts built through Bronze→Silver managed tables must equal the
    same marts computed straight off the raw corpus (q02-q04)."""
    got = rowset(pipe.read("gold", "client_stats"))
    want = rowset(QUERIES["q02_client_stats"](spark, SF_SMOKE))
    assert got == want

    got = rowset(pipe.read("gold", "daily_metrics"))
    want = rowset(QUERIES["q03_daily_metrics"](spark, SF_SMOKE))
    assert got == want

    got = rowset(pipe.read("gold", "fraud_analysis"))
    want = rowset(QUERIES["q04_fraud_analysis"](spark, SF_SMOKE))
    assert got == want


def test_silver_flags_and_partitioning(pipe):
    o = pipe.read("silver", "orders")
    # is_suspicious-analog invariant (SURVEY.md §5 golden invariant 3)
    bad = o.filter(
        F.col("is_priority_large")
        != (
            (F.col("o_totalprice") > 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
    )
    assert bad.count() == 0
    assert pipe._t("silver", "orders").detail()["partition_columns"] == ["order_year"]


def test_incremental_refresh_matches_full_rebuild(spark, pipe):
    """New orders (new keys, new dates) ingested incrementally must land the
    same Gold state as a from-scratch rebuild (merge idempotency + anti-join
    append correctness at pipeline level)."""
    base = pipe.read("silver", "orders")
    increment = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .orderBy("o_orderkey")
        .limit(20)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderdate", F.date_add("o_orderdate", 9000))
    )
    pipe.ingest_orders_increment(increment, n_batches=2)

    merged_orders = pipe.read("silver", "orders")
    assert merged_orders.count() == base.count() + 20

    customer = pipe.read("silver", "customer")
    nation = pipe.read("silver", "nation")
    rates = pipe.read("silver", "rates")
    assert rowset(pipe.read("gold", "client_stats")) == rowset(
        client_stats_mart(merged_orders, customer, nation)
    )
    assert rowset(pipe.read("gold", "daily_metrics")) == rowset(
        daily_metrics_mart(merged_orders, rates)
    )


def test_quarantine_catches_bad_bronze_rows(spark, tmp_path):
    """A poisoned bronze orders row lands in silver/orders_quarantine (with
    the failing rule names), never in silver or the marts; counts reconcile
    exactly (kept + quarantined == bronze)."""
    from delta_lake_spark.catalog import table as corpus_table
    from delta_lake_spark.pipeline.medallion import MedallionPipeline
    from delta_lake_spark.tables import ManagedTable

    p = MedallionPipeline(spark, str(tmp_path / "lake"), SF_SMOKE)
    p.build_bronze()
    # poison one row: negative price + unknown status
    bronze = p.read("bronze", "orders")
    bad = bronze.limit(1).withColumn("o_totalprice", F.lit(-1.0)).withColumn(
        "o_orderstatus", F.lit("X")
    ).withColumn("o_orderkey", F.lit(-999).cast("long"))
    p._t("bronze", "orders").write(bad, mode="append")
    p.build_silver()

    n_bronze = p.read("bronze", "orders").count()
    n_silver = p.read("silver", "orders").count()
    q = ManagedTable(spark, str(tmp_path / "lake" / "silver" / "orders_quarantine"))
    qr = q.read()
    assert qr.count() == 1
    assert n_silver + qr.count() == n_bronze
    row = qr.first()
    assert sorted(row._failed_expectations) == ["known_status", "positive_price"]
    assert p.read("silver", "orders").filter(F.col("o_orderkey") == -999).count() == 0
