"""Query registry: every implemented operator from SURVEY.md §2 is exposed as
a named (spark, sf_dir) -> DataFrame callable, with a DuckDB-runnable ANSI SQL
oracle where the semantics are SQL-expressible."""

from __future__ import annotations

from delta_lake_spark.queries.registry import ORACLE, QUERIES

# Importing the modules populates the registry.
from delta_lake_spark.queries import relational  # noqa: F401,E402
from delta_lake_spark.queries import timeseries  # noqa: F401,E402
from delta_lake_spark.queries import text  # noqa: F401,E402
from delta_lake_spark.queries import vector  # noqa: F401,E402
from delta_lake_spark.queries import dedup  # noqa: F401,E402
from delta_lake_spark.queries import multimodal  # noqa: F401,E402
from delta_lake_spark.queries import sampling  # noqa: F401,E402
from delta_lake_spark.queries import curation  # noqa: F401,E402
from delta_lake_spark.queries import tpch_gap  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE"]
