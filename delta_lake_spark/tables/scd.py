"""Slowly-changing-dimension Type 2 maintenance over a managed table.

The Kimball type-2 dimension is the warehouse-standard way to keep attribute
history: each business key holds a chain of versions with
``(eff_from, eff_to, is_current)`` validity ranges; a change closes the open
version and opens a new one.  The reference has no SCD surface — this is the
warehouse-completeness extension beside MERGE/CDF (Databricks documents the
same pattern as the canonical Delta MERGE use case).

Scale design:

- The whole apply is ONE window pass over ``current-head ∪ batch`` keyed by
  the business key (cheap: one shuffle of |current keys| + |batch| rows —
  the *head* of the dimension, never its history), followed by ONE atomic
  :meth:`ManagedTable.merge` on ``keys + [eff_from]``.  Close-outs and new
  versions land in the same commit, so a reader never observes a key with
  two open versions or none.
- Replay-safe: staged rows carry their final ``(eff_to, is_current)`` in
  the source columns and the matched clause copies them verbatim
  (``update_set={"eff_to": "s.eff_to", ...}``) — re-applying the same batch
  rewrites identical values, so a crashed-and-retried apply converges.
  Compose with ``txn_app``/``txn_batch`` for exactly-once foreachBatch use.
- Intra-batch chains are first-class: a batch may carry several updates for
  one key; consecutive-equal attribute rows collapse (no empty versions)
  and intermediate versions are closed in the same commit.

Batch query twin: ``q71_scd2_tier_history`` (queries/timeseries.py) builds
the same shape from a raw change stream with the identical collapse-chain
windows, oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_spark.tables.managed import ManagedTable

_IS_CUR = "__scd_is_cur"


def _collapse_chain(
    rows: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    eff_from: str,
    eff_to: str,
    current: str,
) -> DataFrame:
    """Collapse consecutive-equal tracked values per key (ordered by
    ``ts_col``; current-head rows sort first on ties by construction —
    callers guard that batch timestamps are strictly newer) and chain
    validity ranges.  ``rows`` must carry the boolean ``_IS_CUR`` marker.

    Crawl-quality input rules (degenerate suite r8), applied here so every
    path (init, apply, stream) shares them:

    - A change row with a NULL timestamp is UNPLACEABLE on the version
      timeline and is dropped — it would otherwise sort first and open a
      NULL ``eff_from`` version whose merge key can never match on replay.
    - A change row with a NULL business key is dropped: the dimension's
      close-out MERGE joins on key equality, and SQL ``NULL = NULL`` never
      matches, so a NULL-keyed chain could be opened but never closed —
      the streamed dimension would diverge from a batch rebuild.
    - Two SIMULTANEOUS conflicting changes (same key, same ts, different
      tracked values — two upstream systems emitting at the same instant)
      resolve to exactly ONE surviving row — the greatest tracked tuple
      ("deterministic latest-writer-wins at an instant").  The dimension's
      merge key is ``keys + [eff_from]``, so it structurally cannot hold
      two versions at one instant; keeping one deterministically makes the
      chain a function of the input SET, not of physical partition order.
    """
    for k in keys:
        rows = rows.filter(F.col(k).isNotNull())
    rows = rows.filter(F.col(ts_col).isNotNull())
    instant = Window.partitionBy(*keys, ts_col).orderBy(
        F.col(_IS_CUR).desc(), *[F.col(c).desc() for c in tracked]
    )
    rows = (
        rows.withColumn("__inst_rn", F.row_number().over(instant))
        .filter(F.col("__inst_rn") == 1)
        .drop("__inst_rn")
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(_IS_CUR).desc()
    )
    attrs = F.struct(*[F.col(c) for c in tracked])
    chg = (
        rows.withColumn("__prev", F.lag(attrs).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != attrs))
        .drop("__prev")
    )
    return (
        chg.withColumn("__next_ts", F.lead(ts_col).over(w))
        .select(
            *keys,
            *tracked,
            F.col(ts_col).alias(eff_from),
            F.col("__next_ts").alias(eff_to),
            F.col("__next_ts").isNull().alias(current),
            F.col(_IS_CUR),
        )
    )


def scd2_init(
    table: ManagedTable,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    current: str = "is_current",
    partition_by: list[str] | None = None,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """Create the type-2 dimension from an initial change-row snapshot
    (one or many rows per key; consecutive-equal rows collapse).
    ``txn_app``/``txn_batch`` make a replayed init (crash-after-commit in a
    foreachBatch sink) a no-op, same as :func:`scd2_apply`."""
    marked = snapshot.select(*keys, *tracked, ts_col).withColumn(
        _IS_CUR, F.lit(False)
    )
    dim = _collapse_chain(
        marked, keys, tracked, ts_col, eff_from, eff_to, current
    ).drop(_IS_CUR)
    return table.write(
        dim,
        mode="overwrite",
        partition_by=partition_by,
        txn_app=txn_app,
        txn_batch=txn_batch,
    )


def scd2_apply(
    table: ManagedTable,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    current: str = "is_current",
    strict: bool = True,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """Apply a batch of attribute updates to a type-2 dimension.

    Semantics: per key, batch rows (ordered by ``ts_col``) extend the
    version chain.  A row equal to the key's current attributes (or to the
    preceding batch row) is a no-op; each real change closes the previous
    version at its timestamp and opens a new one; the last change per key
    becomes the open (``is_current``) version.  Brand-new keys insert their
    chain with no close-out.

    ``strict=True`` (default) validates the two preconditions the window
    order relies on — batch timestamps strictly newer than each key's open
    ``eff_from``, and ``(keys, ts_col)`` unique within the batch — with two
    small aggregates before any data is staged.  Late/out-of-order change
    data needs a rebuild via :func:`scd2_init`, not an in-place apply.

    Returns the committed version (or the current one when the batch
    collapses to a no-op).
    """
    if txn_app is not None and txn_batch is not None:
        last = table.last_txn_batch(txn_app)
        if last is not None and txn_batch <= last:
            # Already committed (crash-after-merge retry): the strict
            # guards below would mis-read the post-commit head as an
            # out-of-order batch, so short-circuit before them.
            return table.latest_version()

    upd = updates.select(*keys, *tracked, ts_col)
    cur = table.read().filter(F.col(current)).select(
        *keys, *tracked, F.col(eff_from).alias(ts_col)
    )

    if strict:
        dup = (
            upd.groupBy(*keys, ts_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                f"scd2_apply: duplicate (keys, {ts_col}) in batch: "
                f"{tuple(r[k] for k in keys)} @ {r[ts_col]}"
            )
        stale = (
            upd.groupBy(*keys)
            .agg(F.min(ts_col).alias("__min_ts"))
            .join(cur.select(*keys, F.col(ts_col).alias("__cur_ts")), keys)
            .filter(F.col("__min_ts") <= F.col("__cur_ts"))
            .limit(1)
            .collect()
        )
        if stale:
            r = stale[0]
            raise ValueError(
                "scd2_apply: out-of-order batch — "
                f"key {tuple(r[k] for k in keys)} has ts {r['__min_ts']} <= "
                f"current eff_from {r['__cur_ts']}; late change data needs a "
                "rebuild (scd2_init), not an in-place apply"
            )

    merged = cur.withColumn(_IS_CUR, F.lit(True)).unionByName(
        upd.withColumn(_IS_CUR, F.lit(False))
    )
    chain = _collapse_chain(
        merged, keys, tracked, ts_col, eff_from, eff_to, current
    )
    # New versions: batch-born rows that survived the collapse.  Close-outs:
    # current-head rows that gained a successor (their lead() filled eff_to).
    # Both carry their final (eff_to, is_current) in the source columns, so
    # ONE merge on keys+[eff_from] applies everything atomically: close-outs
    # match their open target row (same eff_from) and copy the new range in;
    # new versions don't match and insert whole.
    staged = chain.filter(
        (~F.col(_IS_CUR)) | F.col(eff_to).isNotNull()
    ).drop(_IS_CUR)
    if staged.isEmpty():
        return table.latest_version()
    return table.merge(
        staged,
        keys=[*keys, eff_from],
        update_set={eff_to: f"s.{eff_to}", current: f"s.{current}"},
        when_not_matched="insert_all",
        txn_app=txn_app,
        txn_batch=txn_batch,
    )


def scd2_current(
    table: ManagedTable, current: str = "is_current"
) -> DataFrame:
    """The dimension head — one open version per key."""
    return table.read().filter(F.col(current))


def scd2_as_of(
    table: ManagedTable,
    ts,
    ts_col_type: str = "timestamp",
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
) -> DataFrame:
    """Point-in-time snapshot: the version of each key valid at ``ts``
    (half-open ranges: ``eff_from <= ts < eff_to``).  This is *attribute*
    time travel — complementary to :meth:`ManagedTable.read(version=...)`,
    which is *storage* time travel."""
    t = F.lit(ts).cast(ts_col_type)
    return table.read().filter(
        (F.col(eff_from) <= t)
        & (F.col(eff_to).isNull() | (F.col(eff_to) > t))
    )


def scd2_sync(
    table: ManagedTable,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts,
    ts_col_type: str = "timestamp",
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    current: str = "is_current",
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> int:
    """Advance the dimension to a FULL state snapshot taken at ``ts`` (the
    daily-extract feed shape, vs :func:`scd2_apply`'s change-stream shape):

    - key present, tracked attrs changed -> close the open version at
      ``ts``, open a new one,
    - key present, attrs equal -> untouched,
    - brand-new key -> open its first version at ``ts``,
    - key ABSENT from the snapshot -> the open version closes at ``ts``
      with no successor (the key's chain ends until it reappears).

    All four cases stage into ONE atomic merge on ``keys + [eff_from]``
    (close-outs match open target rows, new versions insert) — a reader
    never sees a half-synced dimension.  Replay-safe via txn markers, and
    idempotent by construction: re-syncing an identical snapshot stages
    nothing.  ``ts`` must be newer than every open ``eff_from`` (guarded).
    """
    if txn_app is not None and txn_batch is not None:
        last = table.last_txn_batch(txn_app)
        if last is not None and txn_batch <= last:
            return table.latest_version()

    ts_lit = F.lit(ts).cast(ts_col_type)
    snap = snapshot.select(*keys, *tracked).dropDuplicates(keys)
    cur = table.read().filter(F.col(current))

    stale = cur.filter(F.col(eff_from) >= ts_lit).limit(1).collect()
    if stale:
        raise ValueError(
            f"scd2_sync: snapshot ts {ts!r} is not newer than an open "
            f"version's {eff_from} ({stale[0][eff_from]}); snapshots must "
            "arrive in order"
        )

    # presence flags via lit markers: null-value-proof under full_outer
    cur_m = cur.withColumn("__in_cur", F.lit(True))
    snap_m = snap.withColumn("__in_snap", F.lit(True))
    joined = cur_m.alias("c").join(snap_m.alias("s"), keys, "full_outer")
    present_cur = F.col("__in_cur").isNotNull()
    present_snap = F.col("__in_snap").isNotNull()
    changed = present_cur & present_snap & (
        F.struct(*[F.col(f"c.{c}") for c in tracked])
        != F.struct(*[F.col(f"s.{c}") for c in tracked])
    )
    vanished = present_cur & ~present_snap
    new_or_changed = present_snap & (~present_cur | changed)

    key_cols = [F.coalesce(F.col(f"c.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    closeouts = joined.filter(changed | vanished).select(
        *key_cols,
        *[F.col(f"c.{c}").alias(c) for c in tracked],
        F.col(f"c.{eff_from}").alias(eff_from),
        ts_lit.alias(eff_to),
        F.lit(False).alias(current),
    )
    inserts = joined.filter(new_or_changed).select(
        *key_cols,
        *[F.col(f"s.{c}").alias(c) for c in tracked],
        ts_lit.alias(eff_from),
        F.lit(None).cast(ts_col_type).alias(eff_to),
        F.lit(True).alias(current),
    )
    staged = closeouts.unionByName(inserts)
    if staged.isEmpty():
        return table.latest_version()
    return table.merge(
        staged,
        keys=[*keys, eff_from],
        update_set={eff_to: f"s.{eff_to}", current: f"s.{current}"},
        when_not_matched="insert_all",
        txn_app=txn_app,
        txn_batch=txn_batch,
    )
