"""Structured Streaming layer (SURVEY.md §2.9).

The reference has NO streaming — its incrementality is four batch patterns
(high-water-mark fetch, Bronze append, MERGE into Silver, anti-join append
into Gold; deltalake.ipynb:1495-1502, :1539, :2933-2946, :3227-3243).  This
module re-expresses those patterns on Structured Streaming so the same
engine serves both batch-incremental and continuous pipelines:

- ``file_stream`` — ``readStream`` over a landing directory (the streaming
  analog of the reference's Bronze append: new files ARE the increments).
- ``windowed_agg`` — event-time tumbling-window aggregation with a
  watermark for late data (capability the reference lacks entirely).
- ``dedup_stream`` — dropDuplicatesWithinWatermark, the streaming analog of
  the reference's insert-only dedup MERGE (J7).
- ``stream_merge_into`` — ``foreachBatch`` upserting each micro-batch into
  a :class:`ManagedTable`; with key-idempotent merges, restarts replay the
  last batch harmlessly (effectively-once), matching Delta's canonical
  ``foreachBatch(merge)`` recipe.

Scale notes: file-source listing is incremental (``maxFilesPerTrigger``
bounds batch size); watermark state is partitioned by group key across
executors; foreachBatch merge inherits ManagedTable's partition-pruned
rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from delta_lake_spark.tables import ManagedTable


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental file-directory source (streaming Bronze landing).

    Schema must be explicit — streaming sources don't infer.  On a cluster
    the directory would be object storage; listing state lives in the
    checkpoint.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def as_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize a timestamp column for event-time use: Spark watermarks
    require TimestampType instants (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    TIMESTAMP_NTZ).  Batch-side events.ts is NTZ wall-clock (catalog.table);
    the cast interprets it in the session timezone — UTC in ``get_spark``
    sessions, so wall-clock and instant coincide.

    Event-time validity gate (degenerate suite r8): rows with NULL or
    NON-POSITIVE-EPOCH timestamps (ts <= 1970-01-01T00:00:00) are excluded.
    A NULL event time cannot be placed by any watermark/window machinery;
    Spark's initial streaming watermark is epoch 0, so a pre-epoch event is
    silently dropped as late data in the very FIRST micro-batch (making the
    result depend on which rows share a batch), and the epoch INSTANT
    itself sits on the watermark origin — dropDuplicatesWithinWatermark
    drops ts <= watermark, so exactly-epoch rows survive some operators and
    not others.  Strictly-after-epoch is also the honest crawl rule: a
    zero timestamp is the classic zero-initialized parse-failure sentinel.
    The gate makes the rule deterministic and operator-uniform and is
    applied to every batch twin in the differential tests.

    Timezone invariance (r9): the gate is evaluated BEFORE the NTZ->instant
    cast, against the NTZ epoch wall-clock — a naive-to-naive compare that no
    session timezone can shift (the same predicate as the batch rule,
    catalog.VALID_EVENT_TS_SQL).  For input that is already TimestampType,
    the cutoff is the explicit epoch INSTANT ``timestamp_seconds(0)``, not a
    session-tz-interpreted literal.
    """
    from pyspark.sql.types import TimestampNTZType

    from delta_lake_spark.catalog import valid_event_time

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return valid_event_time(df, ts_col).withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        )
    return df.filter(
        F.col(ts_col).isNotNull()
        & (F.col(ts_col) > F.timestamp_seconds(F.lit(0)))
    )


def windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts/sums with late-data watermark.

    State is bounded: windows older than the watermark are finalized and
    evicted.  Output columns: window_start, window_end, group cols, n,
    total_value.
    """
    events = as_event_time(events, ts_col)
    grouped = events.withWatermark(ts_col, watermark).groupBy(
        F.window(F.col(ts_col), window), *(group_cols or [])
    )
    return grouped.agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total_value"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_cols or []),
        "n",
        "total_value",
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with bounded state: duplicates
    arriving within the watermark horizon are dropped; older state is
    evicted (the streaming analog of insert-only MERGE, J7)."""
    events = as_event_time(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_merge_into(
    stream: DataFrame,
    table: ManagedTable,
    keys: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
    insert_only: bool = False,
    output_mode: str | None = None,
) -> StreamingQuery:
    """Sink a stream into a managed table via per-micro-batch MERGE
    (``foreachBatch`` — the Delta canonical incremental-sink recipe; the
    batch analog is deltalake.ipynb:2933-2946).

    Replay safety is belt-and-braces: upsert merges are idempotent by
    construction, AND every batch carries a txn marker (Delta
    txnAppId/txnVersion analog, keyed by the checkpoint dir) so a replayed
    micro-batch is dropped before any work — the contract that stays safe
    even if a caller later swaps in non-idempotent merge expressions.
    ``available_now=True`` drains everything currently in the source then
    stops — the streaming equivalent of one reference incremental run.
    """
    txn_app = f"stream_merge_into:{os.path.abspath(checkpoint_dir)}"

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if not ManagedTable.is_managed_table(table.path):
            table.write(batch)
        elif insert_only:
            table.merge(
                batch, keys, when_matched="ignore",
                txn_app=txn_app, txn_batch=batch_id,
            )
        else:
            table.merge(batch, keys, txn_app=txn_app, txn_batch=batch_id)

    if output_mode is None:
        output_mode = "append" if insert_only else "update"
    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key`` within a time interval:
    ``right_ts`` in [left_ts - lower, left_ts + upper].

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can size the join state and evict rows once they can
    no longer match (unbounded stream-stream joins otherwise buffer
    forever).  The micro-batch analog of the binned range join
    (ops/range_join.py) — same idea, with the watermark as the bin expiry.

    ``how="left_outer"`` emits null-padded left rows — but only ONCE THE
    WATERMARK PASSES their match window (Spark cannot know "no match will
    arrive" any earlier), so unmatched rows near the head of the stream
    surface a watermark-delay later than their inner twins.  Outer
    stream-stream joins REQUIRE exactly this watermark + time-bound
    combination; the differential test drives the eviction with a
    watermark-advancing sentinel batch.

    ``how="right_outer"`` / ``how="full_outer"`` (r6) complete Spark's
    stream-stream join matrix: unmatched RIGHT rows null-pad the left side
    under the same watermark-eviction contract, and for these modes the
    output ``key`` column is ``coalesce(left key, right key)`` (a
    right-unmatched row has no left key to report).

    The right timestamp column is renamed ``<right_ts>_r`` (both survive
    into the output for the caller to diff).
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            f"how must be inner|left_outer|right_outer|full_outer, got {how!r}"
        )
    lname, rname = left_ts, right_ts + "_r"
    l = as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = (
        as_event_time(right, right_ts)
        .withColumnRenamed(right_ts, rname)
        .withColumnRenamed(key, key + "_r")
        .withWatermark(rname, watermark)
    )
    cond = (
        (F.col(key) == F.col(key + "_r"))
        & (F.col(rname) >= F.col(lname) - F.expr(f"INTERVAL {lower}"))
        & (F.col(rname) <= F.col(lname) + F.expr(f"INTERVAL {upper}"))
    )
    joined = l.join(r, cond, how)
    if how in ("right_outer", "full_outer"):
        joined = joined.withColumn(
            key, F.coalesce(F.col(key), F.col(key + "_r"))
        )
    return joined.drop(key + "_r")


def stream_dedup_ingest(
    stream: DataFrame,
    table: ManagedTable,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_bp: int = 8000,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming corpus curation: each micro-batch of documents flows
    through :func:`~delta_lake_spark.tables.incremental.near_dedup_ingest`
    — batch docs near-duplicating the already-admitted corpus (or a
    lower-id doc in the same micro-batch) are kept out; survivors append
    with their MinHash signatures.

    Replay safety: a replayed micro-batch re-ingests docs that are now
    exact dups of themselves (Jaccard 10000) or already-present ids, so
    restarts are no-ops — the effectively-once contract without a
    transactional sink.
    """
    from delta_lake_spark.tables.incremental import near_dedup_ingest

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        near_dedup_ingest(
            table, batch, id_col=id_col, text_col=text_col,
            min_jaccard_bp=min_jaccard_bp,
        )

    writer = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_maintain_view(
    stream: DataFrame,
    base: ManagedTable,
    view: "IncrementalAggView",
    checkpoint_dir: str,
    dedup_keys: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming materialized-view maintenance: each micro-batch appends to
    the ``base`` table and then advances ``view`` incrementally from the
    base's signed-change feed — continuous serving aggregates without ever
    re-reading the base.

    Per-batch cost is O(batch rows) + a key-pruned MERGE into the view;
    the base's commit log (not streaming state) carries the exactly-what-
    changed information, so the view also absorbs any OUT-OF-BAND batch
    DML on the base (deletes, merges) at the next trigger — something a
    pure streaming aggregation with a state store cannot do.

    Replay safety: a replayed micro-batch re-appends rows (at-least-once
    file source), which double-counts in a naive sum — so the append goes
    through an anti-join on ``dedup_keys`` when provided, restoring the
    effectively-once contract of the batch pipeline.
    """
    from delta_lake_spark.tables.incremental import anti_join_append
    from delta_lake_spark.tables.matview import IncrementalAggView  # noqa: F401

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        if dedup_keys and ManagedTable.is_managed_table(base.path):
            anti_join_append(base, batch, dedup_keys)
        else:  # first batch: nothing to dedup against yet
            base.write(batch, mode="append")
        view.refresh()

    writer = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_assign_clusters(
    stream: DataFrame,
    centroids: DataFrame,
    table: ManagedTable,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming cluster assignment: tag arriving embeddings with their
    nearest centroid (cosine argmax) and append to a managed table.

    Because the map-only assignment (functions/clustering.py) is a pure
    projection — the centroid set collapses to one broadcast row and each
    vector folds to its argmax — this stream needs NO state store, NO
    watermark, and NO shuffle; micro-batch latency is scan + project.
    Centroids come from a batch :func:`spherical_kmeans` run (refresh them
    periodically by restarting the stream); the stream itself never moves
    them, matching the online-inference / offline-training split.
    """
    from delta_lake_spark.functions.clustering import assign_to_centroids
    from delta_lake_spark.functions.similarity import as_double

    cent = centroids.persist()

    def write(batch: DataFrame, _batch_id: int) -> None:
        v = batch.select(
            F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("e")
        )
        table.write(assign_to_centroids(v, cent), mode="append")

    writer = (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window`` — the
    JVM-side, state-store-backed twin of ``stateful.sessionize``'s
    applyInPandasWithState path.  Prefer THIS at scale: session merging
    runs inside the streaming aggregation operator (whole-stage, no Arrow
    hop, watermark-evicted state), while the pandas path exists to show
    the custom-stateful escape hatch.

    Semantics note: ``session_window`` closes a session when the next
    event arrives at or after ``prev + gap`` (half-open windows), i.e. a
    gap of EXACTLY the threshold splits — the batch lag-rule in q27
    (``diff > gap`` splits) keeps boundary-equal events together.  Same
    function in batch mode gives bit-identical sessions, which is what
    the parity test compares.

    Output: group cols, session_start, session_end, n_events, total_value.
    """
    events = as_event_time(events, ts_col)
    grouped = events.withWatermark(ts_col, watermark).groupBy(
        F.session_window(F.col(ts_col), gap), *(group_cols or [])
    )
    return grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).select(
        *(group_cols or []),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "total_value",
    )


def stream_scd2_into(
    stream: DataFrame,
    table: ManagedTable,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain an SCD Type-2 dimension from a change stream
    (``foreachBatch`` over :func:`~delta_lake_spark.tables.scd.scd2_apply`).

    Each micro-batch extends per-key version chains atomically (close-out +
    new versions in one commit); the first batch initializes the dimension.
    Exactly-once across crash/replay: both the init write and every apply
    merge carry a txn marker keyed by the checkpoint dir, and scd2_apply
    short-circuits on an already-committed batch id BEFORE its strict
    ordering guards (a replayed batch's timestamps equal the committed
    head's — the guard would otherwise read that as out-of-order data).
    Precondition inherited from scd2_apply: micro-batches arrive in event
    order per key (true for an ordered landing feed); late data needs the
    batch rebuild path (scd2_init), not the stream.
    """
    from delta_lake_spark.tables.scd import scd2_apply, scd2_init

    txn_app = f"stream_scd2_into:{os.path.abspath(checkpoint_dir)}"

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if not ManagedTable.is_managed_table(table.path):
            scd2_init(
                table, batch, keys, tracked, ts_col,
                txn_app=txn_app, txn_batch=batch_id,
            )
        else:
            scd2_apply(
                table, batch, keys, tracked, ts_col,
                txn_app=txn_app, txn_batch=batch_id,
            )

    writer = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
