"""Structured Streaming layer: incremental sources, watermarked windows,
streaming dedup, foreachBatch merge sinks, stateful sessionization."""

from delta_lake_spark.streaming.stateful import sessionize
from delta_lake_spark.streaming.streams import (
    dedup_stream,
    interval_join,
    file_stream,
    stream_merge_into,
    stream_scd2_into,
    session_window_agg,
    windowed_agg,
)

__all__ = [
    "file_stream",
    "windowed_agg",
    "dedup_stream",
    "stream_merge_into",
    "stream_scd2_into",
    "interval_join",
    "sessionize",
    "session_window_agg",
]
