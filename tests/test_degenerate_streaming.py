"""Degenerate-input differentials for the streaming layer (r8, the §2.9
leg of the adversarial program).

A 100 TB event stream carries NULL timestamps (failed parse upstream),
NULL user/type keys, and NaN/inf measurements.  Each streaming twin must
leave exactly the state its batch computation produces on that input —
or exclude rows by a rule applied to BOTH sides.  The fixture reuses the
relational suite's event hazards in a landing dir split across two
micro-batch files.

FIXTURE-CHANGE RULE (r9): edits here require a same-session green sweep
stamped via ``python tools/stamp_degenerate.py`` (see
tests/degenerate_fixtures.stamp and tests/test_degenerate_stamp.py).
"""

from __future__ import annotations

import datetime as dt

import pytest

# Full tier (VERDICT r9 item 1): the degenerate-corpus differential sweeps
# are round-close evidence, not the driver-facing fast gate.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.streaming import (
    dedup_stream,
    file_stream,
    sessionize,
    stream_merge_into,
    windowed_agg,
)
from delta_lake_spark.tables import ManagedTable
from tests.conftest import SF_SMOKE


def _ts(s):
    return dt.datetime.fromisoformat(s)


_HAZARD_ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (99001, _ts("1970-01-01T00:00:00"), 9001, "view", 0.0, "{}"),
    (99002, None, 9001, "click", 1.0, None),                   # NULL ts
    (99003, _ts("2024-03-10T07:30:00"), None, "purchase", -0.0, "{"),
    (99004, _ts("2024-11-03T05:30:00"), 9002, None, None, "null"),
    (99005, _ts("2023-12-31T23:59:59.999999"), 9002, "", 1e154, ""),
    (99006, _ts("2024-05-01T12:00:00"), 9003, "view", 2.0, '{"k": "v"}'),
    (99007, _ts("2024-05-01T12:00:00.000001"), 9003, "click", 3.0, "[]"),
    (99008, _ts("2024-05-01T13:00:00"), 9003, "view", float("nan"), "{}"),
    (99009, _ts("2024-05-01T13:00:00"), 9003, "purchase", float("inf"), "{}"),
    (99012, _ts("1969-12-31T23:00:00"), 9005, "view", 7.5, "{}"),  # pre-epoch
]


@pytest.fixture(scope="module")
def degen_events(spark):
    ev = table(spark, SF_SMOKE, "events")
    hazards = spark.createDataFrame(_HAZARD_ROWS, schema=ev.schema)
    return ev.unionAll(hazards)


@pytest.fixture(scope="module")
def degen_landing(spark, degen_events, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_landing")
    degen_events.filter(
        F.col("event_id") < 500
    ).coalesce(1).write.parquet(str(d / "f0"))
    degen_events.filter(
        (F.col("event_id") >= 500) | F.col("event_id").isNull()
    ).coalesce(1).write.parquet(str(d / "f1"))
    return str(d) + "/*"


def drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_windowed_agg_matches_batch_on_degenerate_events(
    spark, tmp_path, degen_landing, degen_events
):
    """Watermarked tumbling-window counts/sums over a stream carrying NULL
    timestamps, NULL group keys, and NaN/inf values must equal the batch
    window aggregate row for row (NULL-ts and non-positive-epoch rows are
    excluded by BOTH sides — the event-time validity gate in
    streams.as_event_time; Spark's initial streaming watermark is epoch 0,
    so a 1969 event would otherwise be dropped as late data only when it
    lands after the first micro-batch, and an exactly-epoch event survives
    window aggs but not dropDuplicatesWithinWatermark)."""
    src = file_stream(spark, degen_landing, degen_events.schema)
    agg = windowed_agg(
        src, window="1 hour", watermark="2 hours", group_cols=["event_type"]
    )
    t = ManagedTable(spark, str(tmp_path / "win_tbl"))
    q = stream_merge_into(
        agg, t, ["window_start", "event_type"], str(tmp_path / "ckpt")
    )
    drain(q)
    want = (
        degen_events.filter(
            F.col("ts").isNotNull() & (F.col("ts") > F.lit("1970-01-01"))
        )
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    got = t.read().select("window_start", "event_type", "n", "total_value")
    assert sorted(map(repr, got.collect())) == sorted(map(repr, want.collect()))


def test_sessionize_matches_batch_on_degenerate_events(
    spark, tmp_path, degen_landing, degen_events
):
    """Streaming sessionization over degenerate events: NULL-ts rows have
    no place on a session timeline (excluded both sides); microsecond ties
    and a NULL user key must produce identical closed sessions."""
    src = file_stream(spark, degen_landing, degen_events.schema)
    sessions = sessionize(src, gap_seconds=1800, watermark="1 minute")
    t = ManagedTable(spark, str(tmp_path / "sess_tbl"))
    q = stream_merge_into(
        sessions,
        t,
        ["user_id", "session_start"],
        str(tmp_path / "ckpt"),
        insert_only=True,
    )
    drain(q)

    from pyspark.sql.window import Window

    from delta_lake_spark.catalog import epoch_seconds

    ev = degen_events.filter(
        F.col("ts").isNotNull() & (F.col("ts") > F.lit("1970-01-01"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = epoch_seconds(F.col("ts"))
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            secs - F.lag(secs).over(w) > 1800, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess_id = F.sum("new_sess").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    batch = (
        flagged.withColumn("sid", sess_id)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "n_events")
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in t.read().collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in batch.collect()
    }
    # streaming emits only sessions the watermark has CLOSED (sessions at
    # the stream's end can't finalize) — every emitted one must match the
    # batch computation exactly
    assert got, "no sessions were closed"
    for k, v in got.items():
        assert k in want and want[k] == v, (k, v, want.get(k))
    # the adversarial sessions the watermark HAS passed must actually have
    # been emitted: the microsecond-tie pair (one 2-event session) and the
    # NULL-user-key session (a stateful group keyed by NULL)
    assert got.get((9003, _ts("2024-05-01T12:00:00"))) == 2
    assert got.get((None, _ts("2024-03-10T07:30:00"))) == 1


def test_dedup_stream_matches_batch_on_degenerate_events(
    spark, tmp_path, degen_landing, degen_events
):
    """Streaming drop-duplicates by user over degenerate input: the NULL
    user key is one identity (dropDuplicates treats NULL as a value) and
    NULL-ts rows cannot enter a watermarked dedup state store — excluded
    on both sides."""
    src = file_stream(spark, degen_landing, degen_events.schema)
    deduped = dedup_stream(src, ["user_id"], watermark="10 days")
    t = ManagedTable(spark, str(tmp_path / "dd_tbl"))
    q = stream_merge_into(
        deduped, t, ["user_id"], str(tmp_path / "ckpt"), insert_only=True
    )
    drain(q)
    want = (
        degen_events.filter(
            F.col("ts").isNotNull() & (F.col("ts") > F.lit("1970-01-01"))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert t.read().count() == want


def test_interval_join_matches_batch_on_degenerate_events(
    spark, tmp_path, degen_landing, degen_events
):
    """Stream-stream interval join over degenerate input: NULL join keys
    never match (equality join, both sides), NULL/epoch timestamps are
    excluded by the event-time gate on both stream sides and stated in the
    batch twin, and the microsecond-tie click/view pair must join."""
    from delta_lake_spark.streaming import interval_join

    schema = degen_events.schema
    clicks = file_stream(spark, degen_landing, schema).filter(
        F.col("event_type") == "click"
    )
    views = file_stream(spark, degen_landing, schema).filter(
        F.col("event_type") == "view"
    )
    joined = interval_join(
        clicks.select("user_id", "ts", F.col("event_id").alias("click_id")),
        views.select("user_id", "ts", F.col("event_id").alias("view_id")),
        key="user_id",
        upper="30 minutes",
        watermark="2 hours",
    ).select("user_id", "click_id", "view_id")
    t = ManagedTable(spark, str(tmp_path / "ij_tbl"))
    q = stream_merge_into(
        joined, t, ["click_id", "view_id"], str(tmp_path / "ckpt"),
        insert_only=True, output_mode="append",
    )
    drain(q)
    eb = degen_events.filter(
        F.col("ts").isNotNull() & (F.col("ts") > F.lit("1970-01-01"))
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    c = eb.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    v = eb.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
    )
    want = c.join(
        v,
        (F.col("user_id") == F.col("u2"))
        & (F.col("vts") >= F.col("cts"))
        & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
    ).select("user_id", "click_id", "view_id")
    got_rows = sorted(
        map(tuple, t.read().select("user_id", "click_id", "view_id").collect())
    )
    assert got_rows == sorted(map(tuple, want.collect()))
    # the microsecond-tie pair joined: click 99007 (12:00:00.000001) finds
    # view 99006 (12:00:00) NOT in its forward window, but view-after-click
    # pairs within 30 min must include (view 99008 at 13:00 is > 30 min,
    # so only the batch twin defines the truth here — presence asserted
    # via equality above); assert the NULL-user click joined nothing
    assert all(u is not None for (u, _, _) in got_rows)


def test_session_window_agg_matches_batch_on_degenerate_events(
    spark, tmp_path, degen_landing, degen_events
):
    """Native session_window streaming aggregation over degenerate input:
    NaN/inf totals, NULL group keys, and microsecond ties must finalize to
    exactly the batch session_window rows (same event-time gate both
    sides)."""
    from delta_lake_spark.streaming import session_window_agg

    src = file_stream(spark, degen_landing, degen_events.schema)
    sess = session_window_agg(
        src, gap="30 minutes", group_cols=["user_id"], watermark="1 minute"
    )
    t = ManagedTable(spark, str(tmp_path / "sw_tbl"))
    q = stream_merge_into(
        sess,
        t,
        ["user_id", "session_start"],
        str(tmp_path / "ckpt_sw"),
        insert_only=True,
    )
    drain(q)
    want = (
        degen_events.filter(
            F.col("ts").isNotNull() & (F.col("ts") > F.lit("1970-01-01"))
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], repr(r["total_value"]))
        for r in t.read().collect()
    }
    want_map = {
        (r["user_id"], r["session_start"]): (r["n_events"], repr(r["total_value"]))
        for r in want.collect()
    }
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want_map[k] == v, (k, v, want_map.get(k))
    assert len(got) >= 0.8 * len(want_map)
    # the NaN-valued and inf-valued events produced sessions whose totals
    # survived the stream/state-store round trip bit-identically
    nan_k = (9003, _ts("2024-05-01T13:00:00"))
    assert nan_k in got and got[nan_k][1] == "nan"


def test_stream_scd2_matches_batch_on_degenerate_changes(spark, tmp_path):
    """SCD2 over a crawl-quality change stream: NULL-timestamp and
    NULL-business-key changes are dropped on every path (unplaceable on
    the timeline / unmatchable by the close-out MERGE), two SIMULTANEOUS
    conflicting changes collapse to one deterministic winner (greatest
    tracked tuple — the merge key keys+[eff_from] cannot hold two versions
    at one instant), NULL tracked values are ordinary versions, and the
    streamed dimension equals the batch rebuild."""
    from delta_lake_spark.streaming import stream_scd2_into
    from delta_lake_spark.tables.scd import scd2_init

    schema = "user_id bigint, tier string, ts timestamp"
    rows1 = [
        (1, "bronze", _ts("2024-01-01T00:00:00")),
        # two conflicting changes at the same instant (two upstream systems)
        (1, "gold", _ts("2024-01-02T00:00:00")),
        (1, "silver", _ts("2024-01-02T00:00:00")),
        (2, "bronze", _ts("2024-01-01T00:00:00")),
        (2, None, _ts("2024-01-02T00:00:00")),        # NULL tracked value
        (None, "bronze", _ts("2024-01-01T00:00:00")),  # NULL business key
        (3, "bronze", None),                           # NULL ts: dropped
    ]
    rows2 = [
        (1, "gold", _ts("2024-01-04T00:00:00")),
        (2, None, _ts("2024-01-05T00:00:00")),         # no-op vs open NULL
        (None, "zürich-tier", _ts("2024-01-06T00:00:00")),
        (3, "silver", None),                           # NULL ts again
        (3, "silver", _ts("2024-01-06T00:00:00")),     # 3's first real change
    ]
    land = tmp_path / "land"
    df1 = spark.createDataFrame(rows1, schema)
    df1.coalesce(1).write.parquet(str(land / "f0"))

    dim = ManagedTable(spark, str(tmp_path / "dim"))
    ckpt = str(tmp_path / "ckpt")
    q = stream_scd2_into(
        file_stream(spark, str(land) + "/*", df1.schema),
        dim, ["user_id"], ["tier"], "ts", ckpt,
    )
    drain(q)
    import time

    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(land / "f1")
    )
    q = stream_scd2_into(
        file_stream(spark, str(land) + "/*", df1.schema),
        dim, ["user_id"], ["tier"], "ts", ckpt,
    )
    drain(q)

    rebuild = ManagedTable(spark, str(tmp_path / "rebuild"))
    scd2_init(
        rebuild, spark.createDataFrame(rows1 + rows2, schema),
        ["user_id"], ["tier"], "ts",
    )
    key = lambda t: sorted(
        ((r.user_id, r.tier, r.eff_from, r.eff_to, r.is_current)
         for r in t.read().collect()),
        key=repr,
    )
    assert key(dim) == key(rebuild)

    rows = key(dim)
    # NULL-ts changes were dropped: user 3 has exactly one version (the
    # dated one), not a NULL-eff_from artifact
    u3 = sorted((r for r in rows if r[0] == 3), key=lambda r: r[2])
    assert u3 == [(3, "silver", _ts("2024-01-06T00:00:00"), None, True)]
    # the simultaneous conflict resolved to ONE deterministic winner:
    # silver > gold in tracked-tuple order, so silver is the Jan 2 version
    u1 = sorted((r for r in rows if r[0] == 1), key=lambda r: r[2])
    assert [(t, f) for (_, t, f, _, _) in u1] == [
        ("bronze", _ts("2024-01-01T00:00:00")),
        ("silver", _ts("2024-01-02T00:00:00")),
        ("gold", _ts("2024-01-04T00:00:00")),
    ]
    # NULL business keys were dropped on both paths
    assert not [r for r in rows if r[0] is None]
