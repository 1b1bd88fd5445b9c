"""Row tracking (delta.enableRowTracking analog): stable per-row ids that
survive compaction, Z-order, CoW and merge-on-read DML, and MERGE — fresh
ids from commit-assigned file bases, materialized _row_id through rewrites."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ConcurrentWriteError, ManagedTable


def _ids(mt, version=None):
    return {r.k: r._row_id for r in mt.read_with_row_ids(version).collect()}


@pytest.fixture()
def tracked(spark, tmp_path):
    mt = ManagedTable(spark, str(tmp_path / "t"))
    mt.write(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "k long, v double")
    )
    mt.enable_row_tracking()
    return mt


def test_backfill_and_fresh_ids_unique(spark, tracked):
    ids = _ids(tracked)
    assert len(set(ids.values())) == 10
    tracked.write(
        spark.createDataFrame([(10, 10.0), (11, 11.0)], "k long, v double"),
        mode="append",
    )
    ids2 = _ids(tracked)
    assert all(ids2[k] == v for k, v in ids.items())  # existing ids stable
    assert len(set(ids2.values())) == 12               # fresh ids collide with nothing


def test_ids_survive_compaction_and_clustering(spark, tracked):
    before = _ids(tracked)
    tracked.optimize()
    assert _ids(tracked) == before
    tracked.optimize(zorder_by=["k", "v"])
    assert _ids(tracked) == before
    # the rewritten files carry a MATERIALIZED _row_id column
    entry = tracked._entry()
    import pyarrow.parquet as pq

    cols = pq.ParquetFile(
        os.path.join(tracked.path, entry["files"][0]["path"])
    ).schema_arrow.names
    assert "_row_id" in cols


def test_ids_survive_dml_both_modes(spark, tracked):
    base = _ids(tracked)
    tracked.delete_where([("k", "<", 3)])                                  # CoW
    tracked.update_where([("k", "=", 5)], {"v": F.lit(99.0)})              # CoW
    tracked.delete_where([("k", "=", 9)], mode="merge_on_read")
    tracked.update_where([("k", "=", 6)], {"v": F.lit(66.0)}, mode="merge_on_read")
    ids = _ids(tracked)
    assert set(ids) == {3, 4, 5, 6, 7, 8}
    assert all(ids[k] == base[k] for k in ids)
    vals = {r.k: r.v for r in tracked.read().collect()}
    assert vals[5] == 99.0 and vals[6] == 66.0


def test_merge_preserves_matched_assigns_fresh(spark, tracked):
    base = _ids(tracked)
    tracked.merge(
        spark.createDataFrame([(5, 555.0), (100, 1.0)], "k long, v double"), ["k"]
    )
    ids = _ids(tracked)
    assert ids[5] == base[5]                       # updated row keeps its id
    assert ids[100] not in set(base.values())      # insert drew a fresh id
    assert len(set(ids.values())) == len(ids)
    # conditional merge clauses too
    tracked.merge(
        spark.createDataFrame([(100, 2.0), (7, 0.5)], "k long, v double"),
        ["k"],
        matched_condition="s.v > t.v",             # applies to 100, not 7
    )
    ids2 = _ids(tracked)
    assert ids2 == ids                             # both matched rows keep ids
    vals = {r.k: r.v for r in tracked.read().collect()}
    assert vals[100] == 2.0 and vals[7] == 7.0


def test_time_travel_reads_historic_ids(spark, tracked):
    v = tracked.latest_version()
    before = _ids(tracked)
    tracked.delete_where([("k", "<", 5)])
    assert _ids(tracked, version=v) == before


def test_requires_property_and_reserved_name(spark, tmp_path):
    mt = ManagedTable(spark, str(tmp_path / "a"))
    mt.write(spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="enable_row_tracking"):
        mt.read_with_row_ids()
    mt2 = ManagedTable(spark, str(tmp_path / "b"))
    mt2.write(spark.createDataFrame([(1,)], "`_row_id` long"))
    with pytest.raises(ValueError, match="reserves"):
        mt2.enable_row_tracking()


def test_lost_commit_race_rolls_back_base_assignment(
    spark, tracked, monkeypatch
):
    # inject one lost commit race: the first log link fails as if another
    # writer took the version; write() retries.  The failed attempt must
    # not leak its id-range assignment into the retry.
    real_link = os.link
    state = {"failed": False}

    def flaky(src, dst, *a, **k):
        if not state["failed"] and "_log" in dst and dst.endswith(".json"):
            state["failed"] = True
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **k)

    monkeypatch.setattr(os, "link", flaky)
    tracked.write(
        spark.createDataFrame([(50, 50.0)], "k long, v double"), mode="append"
    )
    assert state["failed"]  # the race actually fired
    ids = _ids(tracked)
    assert len(set(ids.values())) == len(ids)
    assert 50 in ids
