"""Deterministic sampling for training-data pipelines.

Spark's built-in ``df.sample`` is seeded per-partition: the selected rows
change whenever the input's partitioning changes, which makes experiment
repro and cross-engine verification impossible.  A 100 TB pipeline wants
*content-addressed* sampling instead — each row's fate is a pure function of
its key and a salt, independent of partitioning, executor count, or engine:

- stable under repartition/compaction/re-runs (same rows every time),
- consistent across sub-pipelines (a doc sampled into "train" here is in
  "train" everywhere),
- embarrassingly parallel: one md5 per row, no shuffle, no coordination.

Idiom: ``bucket = int(md5(salt ':' key)[:8], 16) % 10000`` — uniform in
[0, 10000) (verified Spark == DuckDB bit-for-bit), then rate and split
decisions are integer comparisons on the bucket.  Distinct salts give
independent decisions (sampling vs train/val/test assignment).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str) -> Column:
    """Deterministic uniform bucket in [0, 10000): md5 of ``salt ':' key``,
    first 8 hex digits as an integer.  Engine-portable (no hash seeds)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt + ":"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def hash_bucket_sql(key_sql: str, salt: str) -> str:
    """DuckDB twin of hash_bucket (for oracle SQL generation)."""
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({key_sql} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {BUCKETS})"
    )


def keep_fraction(key: Column | str, rate_bp: Column | int, salt: str) -> Column:
    """True for ~rate_bp/10000 of rows, chosen deterministically by key.
    ``rate_bp`` may be a per-row Column (stratified rates)."""
    rate = F.lit(rate_bp) if isinstance(rate_bp, int) else rate_bp
    return hash_bucket(key, salt) < rate


def split_assign(
    key: Column | str,
    salt: str = "split",
    train_bp: int = 9000,
    val_bp: int = 500,
) -> Column:
    """Deterministic train/val/test assignment: train gets buckets
    [0, train_bp), val the next val_bp, test the rest."""
    b = hash_bucket(key, salt)
    return (
        F.when(b < train_bp, "train")
        .when(b < train_bp + val_bp, "val")
        .otherwise("test")
    )
