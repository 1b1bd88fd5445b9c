"""delta_lake_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
lakehouse pipeline (Doodhust/delta_lake, surveyed in SURVEY.md) as a coherent
Spark-first library:

- ``session``    — SparkSession factory (AQE, Arrow, UTC).
- ``catalog``    — named access to the test corpus parquet tables.
- ``queries``    — the operator inventory from SURVEY.md §2 expressed as
                   (spark, sf_dir) -> DataFrame callables with ANSI-SQL oracles.
- ``ops``        — reusable composite operators (gap fill, as-of join,
                   incremental merge patterns, batched upsert).
- ``functions``  — text analysis, dedup (exact/MinHash/SimHash), vector
                   similarity, multimodal column plumbing.
- ``tables``     — a transactional parquet table format ("deltalite"): commit
                   log, snapshot reads, MERGE upsert, compaction, Z-order,
                   time travel.  (delta-spark is not available in this
                   environment; the capabilities are rebuilt on plain Spark.)
- ``streaming``  — Structured Streaming equivalents of the reference's
                   batch-incremental patterns, plus watermarked windows,
                   streaming dedup, and stateful sessionization.
- ``pipeline``   — the medallion (Bronze → Silver → Gold) pipeline API with
                   incremental refresh.
- ``io``         — schema-declared CSV/JSON readers, export writers (single
                   -file CSV, tuned parquet, JDBC serving sink).
- ``quality``    — enforced data-quality gates (schema/uniqueness/nulls/
                   reconciliation).
"""

__version__ = "0.1.0"
