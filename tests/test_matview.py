"""signed_changes (net multiset delta between snapshots) and
IncrementalAggView (incremental materialized aggregate maintenance).

Invariant under test: after ANY commit history, aggregating the signed
delta equals the difference of the snapshot aggregates, and the
incrementally maintained view equals a from-scratch group-by of the base —
the property that lets a 100 TB mart refresh cost O(changed rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_spark.tables import IncrementalAggView, ManagedTable


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def base_rows(n, grp=("a", "b", "c")):
    return [
        Row(id=i, grp=grp[i % len(grp)], amt=float(i) + 0.25) for i in range(n)
    ]


@pytest.fixture
def base(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "base"))
    t.write(spark.createDataFrame(base_rows(12)).repartition(3))
    return t


def expected_view(t):
    return (
        t.read()
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("amt").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("amt_sum"),
        )
    )


def assert_view_matches(view, t):
    assert rows(view.read().select("grp", "n", "amt_sum")) == rows(
        expected_view(t)
    )


def signed_agg(t, frm, to=None):
    return (
        t.signed_changes(frm, to)
        .agg(
            F.sum("_sign").alias("dn"),
            F.sum(F.col("_sign") * F.col("amt")).alias("damt"),
        )
        .first()
    )


def test_signed_changes_append_and_delete(spark, base):
    v0 = base.latest_version()
    base.write(
        spark.createDataFrame([Row(id=100, grp="a", amt=10.0)]), mode="append"
    )
    base.delete_where([("id", "=", 0)])  # amt 0.25, grp a
    got = signed_agg(base, v0)
    assert got["dn"] == 0  # one added, one removed
    assert abs(got["damt"] - (10.0 - 0.25)) < 1e-9


def test_signed_changes_merge_update_nets_out(spark, base):
    v0 = base.latest_version()
    # update one row's amt (+100), leave everything else untouched
    src = spark.createDataFrame([Row(id=3, grp="a", amt=103.25)])
    base.merge(src, keys=["id"])
    got = signed_agg(base, v0)
    assert got["dn"] == 0
    assert abs(got["damt"] - 100.0) < 1e-9


def test_signed_changes_skips_compaction(spark, base):
    v0 = base.latest_version()
    base.optimize()
    sc = base.signed_changes(v0)
    assert sc.count() == 0
    assert "_sign" in sc.columns  # schema stable even when empty


def test_signed_changes_mor_delete(spark, base):
    v0 = base.latest_version()
    base.delete_where([("grp", "=", "b")], mode="merge_on_read")
    # signed_changes is a multiset delta UP TO cancelling (+1, -1) pairs —
    # the contract is aggregate-level: sums net to the snapshot difference
    got = signed_agg(base, v0)
    assert got["dn"] == -4  # ids 1, 4, 7, 10
    assert abs(got["damt"] - -(1 + 4 + 7 + 10 + 4 * 0.25)) < 1e-9


def test_matview_full_then_incremental(spark, tmp_path, base):
    view = IncrementalAggView(
        spark, base, str(tmp_path / "v"), keys=["grp"], sums={"amt_sum": "amt"}
    )
    st = view.refresh()
    assert st["mode"] == "full"
    assert_view_matches(view, base)

    # append touching two groups
    base.write(
        spark.createDataFrame(
            [Row(id=200, grp="a", amt=5.0), Row(id=201, grp="zz", amt=7.0)]
        ),
        mode="append",
    )
    st = view.refresh()
    assert st["mode"] == "incremental"
    assert_view_matches(view, base)
    assert rows(view.read().filter("grp = 'zz'").select("n")) == [(1,)]


def test_matview_survives_mixed_dml(spark, tmp_path, base):
    view = IncrementalAggView(
        spark, base, str(tmp_path / "v"), keys=["grp"], sums={"amt_sum": "amt"}
    )
    view.refresh()
    base.delete_where([("id", "<", 3)])  # CoW delete
    base.delete_where([("id", "=", 7)], mode="merge_on_read")  # DV delete
    base.update_where([("id", "=", 8)], {"amt": F.lit(80.5)})
    base.merge(
        spark.createDataFrame([Row(id=300, grp="b", amt=1.5)]), keys=["id"]
    )
    base.optimize()  # interleaved compaction must not disturb the delta
    view.refresh()
    assert_view_matches(view, base)


def test_matview_group_disappears(spark, tmp_path, base):
    view = IncrementalAggView(
        spark, base, str(tmp_path / "v"), keys=["grp"], sums={"amt_sum": "amt"}
    )
    view.refresh()
    base.delete_where([("grp", "=", "c")])
    view.refresh()
    assert view.read().filter("grp = 'c'").count() == 0
    assert_view_matches(view, base)


def test_matview_noop_refresh(spark, tmp_path, base):
    view = IncrementalAggView(
        spark, base, str(tmp_path / "v"), keys=["grp"], sums={"amt_sum": "amt"}
    )
    view.refresh()
    v = view.table.latest_version()
    st = view.refresh()
    assert st["mode"] == "noop"
    assert view.table.latest_version() == v  # no wasted commits


@pytest.mark.full  # >13s multi-process/stream differential: round-close tier
def test_stream_maintain_view_matches_batch(spark, tmp_path):
    """Streaming ingest with per-batch view maintenance: after the stream
    drains, the view equals a from-scratch group-by of the base — and an
    out-of-band batch DELETE on the base is absorbed by the next refresh,
    which a state-store streaming aggregation could not see."""
    from delta_lake_spark.streaming.streams import (
        file_stream,
        stream_maintain_view,
    )

    data = spark.createDataFrame(base_rows(30))
    landing = str(tmp_path / "landing")
    data.filter("id < 10").coalesce(1).write.parquet(f"{landing}/b1")
    data.filter("id >= 10 and id < 20").coalesce(1).write.parquet(f"{landing}/b2")
    data.filter("id >= 20").coalesce(1).write.parquet(f"{landing}/b3")

    base_t = ManagedTable(spark, str(tmp_path / "base"))
    view = IncrementalAggView(
        spark, base_t, str(tmp_path / "view"), keys=["grp"],
        sums={"amt_sum": "amt"},
    )
    src = file_stream(
        spark, f"{landing}/*", data.schema, max_files_per_trigger=1
    )
    q = stream_maintain_view(
        src, base_t, view, checkpoint_dir=str(tmp_path / "ckpt"),
        dedup_keys=["id"],
    )
    q.awaitTermination(120)
    assert base_t.read().count() == 30
    assert_view_matches(view, base_t)

    # out-of-band batch DML is picked up from the base's log, not stream state
    base_t.delete_where([("grp", "=", "b")], mode="merge_on_read")
    view.refresh()
    assert_view_matches(view, base_t)
    assert view.read().filter("grp = 'b'").count() == 0


def test_matview_count_only(spark, tmp_path, base):
    view = IncrementalAggView(spark, base, str(tmp_path / "v"), keys=["grp"])
    view.refresh()
    base.write(
        spark.createDataFrame([Row(id=400, grp="a", amt=0.0)]), mode="append"
    )
    view.refresh()
    got = dict(
        (r["grp"], r["n"]) for r in view.read().select("grp", "n").collect()
    )
    assert got == {"a": 5, "b": 4, "c": 4}


def test_matview_crash_before_record_never_double_applies(spark, tmp_path, base):
    """Crash injection: refresh dies after its += delta MERGE but before
    the state record; more base commits land; the re-run must resume from
    the merge's txn marker instead of re-applying the merged window."""
    view = IncrementalAggView(
        spark, base, str(tmp_path / "view"), keys=["grp"], sums={"amt_sum": "amt"}
    )
    view.refresh()
    base.write(
        spark.createDataFrame([Row(id=300, grp="a", amt=50.0)]), mode="append"
    )

    real_record = view._record

    def crash(_version):
        raise RuntimeError("injected crash before state record")

    view._record = crash
    try:
        view.refresh()
    except RuntimeError:
        pass
    view._record = real_record

    base.write(
        spark.createDataFrame([Row(id=301, grp="b", amt=7.5)]), mode="append"
    )
    st = view.refresh()
    assert st["mode"] == "incremental"
    assert_view_matches(view, base)  # double-applied += would inflate sums
    assert view.refresh()["mode"] == "noop"


def test_matview_crash_with_no_new_commits_recovers(spark, tmp_path, base):
    view = IncrementalAggView(
        spark, base, str(tmp_path / "view"), keys=["grp"], sums={"amt_sum": "amt"}
    )
    view.refresh()
    base.write(
        spark.createDataFrame([Row(id=300, grp="a", amt=50.0)]), mode="append"
    )
    real_record = view._record
    view._record = lambda _v: (_ for _ in ()).throw(RuntimeError("crash"))
    try:
        view.refresh()
    except RuntimeError:
        pass
    view._record = real_record
    # no new base commits: the re-run recovers via the marker (no replay)
    assert view.refresh()["mode"] == "noop"
    assert_view_matches(view, base)
