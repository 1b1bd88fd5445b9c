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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from delta_lake_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from delta_lake_spark.queries import ORACLE

    return dict(ORACLE)
