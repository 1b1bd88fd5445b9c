"""Gold-mart plan builders, factored to DataFrame level so the same plans
serve both the query registry (q02-q04, oracle-checked) and the medallion
pipeline (which feeds them Silver managed tables instead of raw scans).

Mirrors the reference's three Gold marts (deltalake.ipynb:1272-1312):
client_stats (J1+J3+A1), daily_metrics (J2+A2+A3 with the currency
when-ladder :1286-1290), fraud_analysis (P10+J1+A1).  Dims are explicitly
broadcast (reference :3154); fact-side aggregation is a single hash-agg
after the map-side joins, so the only shuffle is the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


def client_stats_mart(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Per-client aggregate mart (deltalake.ipynb:1273-1281, :3153-3162).

    customer SCALES with the data (150K rows/SF; the reference broadcasts
    its 50K clients, :3154, which stops being safe at 100x) — no hard hint;
    AQE auto-broadcasts under threshold.  nation is a fixed dim: hint kept.
    """
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left"
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
    return joined.groupBy(
        F.col("c_custkey").alias("client_id"),
        F.col("c_name").alias("name"),
        F.col("n_name").alias("country"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("total_amount"),
        (F.floor(F.sum(_dec("o_totalprice")).cast("double") / F.count("*") * 100) / 100).alias("avg_amount"),
        F.count("*").alias("transactions_count"),
    )


def daily_rates(events: DataFrame) -> DataFrame:
    """Daily rate series from the events stream (the corpus' stand-in for
    currency_rates, FIXTURES.md §5); MAX keeps it order-independent.

    Rate-domain gate (degenerate suite r8): a currency rate is positive and
    bounded — crawl-quality event values (1e154, negatives, zero) are not
    valid rates, and an out-of-domain value overflows the mart's
    DECIMAL(10,2) conversion cast under ANSI.  The gate (0 < value < 1e6)
    is applied identically in q03's DuckDB oracle.
    """
    return (
        events.filter((F.col("value") > 0) & (F.col("value") < 1e6))
        .groupBy(F.dayofmonth("ts").alias("rate_day"))
        .agg(F.max("value").alias("rate"))
    )


def daily_metrics_mart(orders: DataFrame, rates: DataFrame) -> DataFrame:
    """Per-day volume mart with CASE-ladder currency conversion and
    conditional aggregation (deltalake.ipynb:1284-1299)."""
    joined = orders.join(
        F.broadcast(rates), F.dayofmonth(orders.o_orderdate) == rates.rate_day, "left"
    )
    price_dec = _dec("o_totalprice")
    amount_adj = (
        F.when(F.col("o_orderpriority") == "1-URGENT", price_dec * F.col("rate").cast("decimal(10,2)"))
        .when(F.col("o_orderpriority") == "2-HIGH", price_dec * F.lit("1.05").cast("decimal(4,2)"))
        .otherwise(price_dec)
    )
    conv = joined.select(
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_orderpriority"),
        amount_adj.alias("amount_adj"),
    )
    adj = F.col("amount_adj")
    return conv.groupBy(F.col("order_date").alias("date")).agg(
        F.sum(adj).cast("double").alias("daily_volume"),
        (F.floor(F.sum(adj).cast("double") / F.count("*") * 100) / 100).alias("avg_transaction"),
        F.count("*").alias("transactions_count"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("urgent_count"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", adj).otherwise(F.lit(0).cast(DEC))
        ).cast("double").alias("urgent_volume"),
    )


def fraud_analysis_mart(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Suspicious-activity mart (deltalake.ipynb:1302-1312): boolean-flag
    filter feeding a 2-key aggregate over a 3-way join."""
    suspicious = lineitem.filter(
        (F.col("l_quantity") > 45) & F.col("l_returnflag").isin("R", "A")
    )
    joined = (
        suspicious.join(orders, suspicious.l_orderkey == orders.o_orderkey, "inner")
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
    )
    return joined.groupBy(
        F.col("l_returnflag").alias("category"), F.col("n_name").alias("country")
    ).agg(
        F.count("*").alias("fraud_count"),
        (F.floor(F.sum(_dec("l_extendedprice")).cast("double") / F.count("*") * 100) / 100).alias("avg_fraud_amount"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_fraud_amount"),
    )
