"""Batch-incremental processing patterns (SURVEY.md §2.9 / §3.3).

The reference implements incrementality as four batch patterns rather than
streaming; this module packages them as reusable utilities over
:class:`~delta_lake_spark.tables.managed.ManagedTable`:

1. **High-water mark** — ``agg(max(watermark_col))`` on the target decides
   the next fetch window (deltalake.ipynb:1495-1502).
2. **Insert-only dedup merge** — append new rows keyed on an id, dropping
   rows whose key already exists (``whenNotMatchedInsertAll``,
   deltalake.ipynb:1786-1791).
3. **Batched upsert** — modulo-bucketed MERGE (deltalake.ipynb:2937-2946)
   via :meth:`ManagedTable.merge_in_batches`.
4. **Anti-join append** — append only rows whose key is absent, computed as
   a left_anti join against the target's key projection
   (deltalake.ipynb:3227-3243).

All four are pure metadata-plus-join plans: nothing collects data rows to
the driver except the single high-water-mark scalar.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable


def high_water_mark(table: ManagedTable, col: str) -> Any:
    """Max of ``col`` in the current snapshot, or None for an empty table.

    One scalar crosses to the driver; the scan itself is distributed and
    benefits from partition pruning when ``col`` is the partition key.
    """
    row = table.read().agg(F.max(F.col(col)).alias("hwm")).first()
    return None if row is None else row["hwm"]


def insert_only_merge(
    table: ManagedTable, source: DataFrame, keys: list[str]
) -> int:
    """Dedup-on-append: insert source rows whose key is not present
    (Delta ``whenNotMatchedInsertAll``)."""
    return table.merge(
        source, keys, when_matched="ignore", when_not_matched="insert_all"
    )


def anti_join_append(
    table: ManagedTable, source: DataFrame, keys: list[str]
) -> int:
    """Append rows for keys the target has never seen.

    Same net effect as :func:`insert_only_merge` but implemented the way
    the reference's Gold refresh does it (anti-join then plain ``append``):
    no target rewrite at all — the cheapest possible incremental write when
    the target is append-only (e.g. date-keyed daily marts).
    """
    existing = table.read().select(*keys).distinct()
    fresh = source.join(existing, keys, "left_anti")
    return table.write(fresh, mode="append")


def apply_changes(
    target: ManagedTable,
    source: ManagedTable,
    keys: list[str],
    last_version: int,
) -> int:
    """CDC propagation: replay the source's change feed since
    ``last_version`` onto ``target`` so it mirrors the source snapshot —
    the downstream-consumer half of the change feed (Delta CDF's
    ``readChangeFeed`` + ``foreachBatch`` merge pattern, here as the
    reference-style batch-incremental equivalent).

    Uses ``changes(include_change_type=True)``: post-image rows upsert;
    delete pre-images whose key was not re-inserted later in the range
    merge with ``when_matched='delete'``.  Upserting a post-image twice is
    idempotent, so retrying after a failure is safe (at-least-once
    consumer contract).  Returns the source version now reflected; feed it
    back as ``last_version`` on the next call.
    """
    upto = source.latest_version() or 0
    if upto <= last_version:
        return upto
    ch = source.changes(
        last_version, upto, include_change_type=True
    ).persist()
    try:
        ins = ch.filter(F.col("_change_type") == "insert").drop("_change_type")
        dels = (
            ch.filter(F.col("_change_type") == "delete")
            .drop("_change_type")
            .join(ins.select(*keys).distinct(), keys, "left_anti")
        )
        target.merge(ins, keys)
        if dels.limit(1).count():
            target.merge(
                dels, keys, when_matched="delete", when_not_matched="ignore"
            )
    finally:
        ch.unpersist()
    return upto


def incremental_refresh(
    table: ManagedTable,
    source: DataFrame,
    keys: list[str],
    n_batches: int = 1,
) -> list[int]:
    """Full upsert refresh; splits into modulo batches when the source is
    large (the reference's OOM mitigation, deltalake.ipynb:2937-2946)."""
    if n_batches <= 1:
        return [table.merge(source, keys)]
    return table.merge_in_batches(source, keys, n_batches)
