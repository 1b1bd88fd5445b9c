"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both sides
on the join key for every query.  Bucketing pays that shuffle ONCE at write
time: rows are hash-distributed into a fixed number of bucket files per
partition, and every later join/aggregation on the bucket key reads the
buckets aligned — the physical plan is a SortMergeJoin with NO Exchange on
either side (asserted in tests/test_plans.py).

This is the Spark-native answer to the reference's serving-side
`CREATE INDEX` (silver.py:192, SURVEY.md §2.11 M7) for join keys, and the
"pre-partitioning" co-location strategy the scale notes call for.  Rules:

- Both sides must be bucketed on their join column with the SAME bucket
  count (or an integer multiple, with spark.sql.bucketing.coalesceBucketsInJoin).
- Bucket count is a storage-time commitment: size it so one bucket of the
  biggest table fits an executor core (e.g. 10 TB table / 4096 buckets
  ≈ 2.5 GB). Re-bucketing means rewriting.
- ``sortBy`` on the same key lets merge joins skip the per-task sort when
  files-per-bucket is 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str] | str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table registered as ``name``.

    ``path`` makes it an external table (data at ``path``, metadata in the
    session catalog); omit it to store under the warehouse dir.  Bucketed
    writes require saveAsTable — a pathless ``.parquet()`` write has nowhere
    to record the bucket spec, which lives in catalog metadata.
    """
    keys = [keys] if isinstance(keys, str) else keys
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys, pinned to a merge join.

    The ``merge`` hint keeps the plan on the shuffle-free SortMergeJoin path
    even when one side is small enough that AQE would broadcast it — use a
    plain ``.join`` instead when one side is a true dim table (broadcasting
    a small side is cheaper than reading it aligned).
    """
    return spark.table(left_name).hint("merge").join(spark.table(right_name), on, how)
