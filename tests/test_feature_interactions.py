"""Cross-feature interaction coverage for the round-4 table features:
CDF x row tracking x auto-compact x streaming sink — each pair proven
compatible, not just each feature alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable


def test_cdf_and_row_tracking_together_on_merge(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    t.enable_cdf()
    t.enable_row_tracking()
    ids0 = {r.k: r._row_id for r in t.read_with_row_ids().collect()}
    t.merge(spark.createDataFrame([(1, 11.0), (3, 30.0)], "k long, v double"), ["k"])
    # row ids: matched kept, insert fresh
    ids1 = {r.k: r._row_id for r in t.read_with_row_ids().collect()}
    assert ids1[1] == ids0[1] and ids1[2] == ids0[2]
    assert len(set(ids1.values())) == 3
    # CDC sidecar: exact images, and NO _row_id column leaks into the feed
    feed = t.change_feed(2)
    assert "_row_id" not in feed.columns
    assert sorted((r._change_type, r.k, r.v) for r in feed.collect()) == [
        ("insert", 3, 30.0),
        ("update_postimage", 1, 11.0),
        ("update_preimage", 1, 10.0),
    ]
    # the DML sidecars of CoW delete/update also stay _row_id-free
    t.delete_where([("k", "=", 2)])
    t.update_where([("k", "=", 3)], {"v": F.lit(99.0)}, mode="merge_on_read")
    feed2 = t.change_feed(3)
    assert "_row_id" not in feed2.columns
    ids2 = {r.k: r._row_id for r in t.read_with_row_ids().collect()}
    assert ids2 == {k: v for k, v in ids1.items() if k != 2}


def test_auto_compact_invisible_to_cdf_and_preserves_row_ids(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(0, 0.0)], "k long, v double"))
    t.enable_cdf()
    t.enable_row_tracking()
    t.set_auto_compact(min_files=4, min_file_bytes=10 * 1024 * 1024)
    for i in range(1, 7):
        t.write(
            spark.createDataFrame([(i, float(i))], "k long, v double"),
            mode="append",
        )
    assert "optimize" in [h["operation"] for h in t.history()]  # it fired
    # the feed shows exactly one insert per appended row — compaction
    # commits surface nothing
    feed = t.change_feed(2)  # after enable_row_tracking
    assert sorted(r.k for r in feed.collect()) == list(range(1, 7))
    assert set(r._change_type for r in feed.collect()) == {"insert"}
    # ids survived the mid-loop compactions and stay unique
    ids = {r.k: r._row_id for r in t.read_with_row_ids().collect()}
    assert len(set(ids.values())) == 7


def test_streaming_sink_into_tracked_cdf_table(spark, tmp_path):
    from delta_lake_spark.tables.stream_source import (
        register_managed_stream_source,
    )

    register_managed_stream_source(spark)
    src, tgt, ck = (str(tmp_path / x) for x in ("s", "t", "c"))
    smt = ManagedTable(spark, src)
    smt.write(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    tmt = ManagedTable(spark, tgt)
    tmt.write(spark.createDataFrame([], "k long, v double"))
    tmt.enable_cdf()
    tmt.enable_row_tracking()
    q = (
        spark.readStream.format("managed_stream").option("path", src).load()
        .writeStream.format("managed_stream").option("path", tgt)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # streamed rows drew fresh row ids from their commit-assigned base
    ids = {r.k: r._row_id for r in tmt.read_with_row_ids().collect()}
    assert len(set(ids.values())) == 2
    # and the change feed reports the streaming append as inserts
    feed = tmt.change_feed(2)
    assert sorted((r._change_type, r.k) for r in feed.collect()) == [
        ("insert", 1),
        ("insert", 2),
    ]
