"""IncrementalSketchView: incremental COUNT(DISTINCT) maintenance via
mergeable HLL sketches.

Invariant under test: after ANY commit history (appends, merges, deletes),
the incrementally maintained view's estimates equal a from-scratch
``hll_sketch_agg`` over the base — pure-insert keys advance by sketch
union, delete-touched keys by bounded recompute, vanished keys disappear.
On the small test cardinalities HLL is in exact (list/set) mode, so the
estimates are exact and the comparison is equality, not a tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_spark.tables import IncrementalSketchView, ManagedTable


def rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def base(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "base"))
    t.write(
        spark.createDataFrame(
            [
                Row(id=i, grp=("a", "b", "c")[i % 3], u=f"user{i % 5}")
                for i in range(12)
            ]
        ).repartition(3)
    )
    return t


def expected(t):
    return (
        t.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("u_ndv"),
        )
    )


def assert_matches(view, t):
    assert rows(view.read().select("grp", "n", "u_ndv")) == rows(expected(t))


def test_full_then_pure_insert_union(spark, tmp_path, base):
    v = IncrementalSketchView(
        spark, base, str(tmp_path / "v"), keys=["grp"], ndv={"u_ndv": "u"}
    )
    assert v.refresh()["mode"] == "full"
    assert_matches(v, base)
    # append: new users in existing groups + a brand-new group
    base.write(
        spark.createDataFrame(
            [
                Row(id=100, grp="a", u="user77"),
                Row(id=101, grp="a", u="user0"),   # duplicate value: ndv unchanged
                Row(id=102, grp="d", u="user1"),
            ]
        ),
        mode="append",
    )
    st = v.refresh()
    assert st["mode"] == "incremental" and st["recomputed_keys"] == 0
    assert_matches(v, base)


def test_delete_triggers_bounded_recompute(spark, tmp_path, base):
    v = IncrementalSketchView(
        spark, base, str(tmp_path / "v"), keys=["grp"], ndv={"u_ndv": "u"}
    )
    v.refresh()
    # delete one group's rows entirely and one row from another group
    base.delete_where([("grp", "=", "c")])
    base.delete_where([("id", "=", 0)])  # grp a, user0
    st = v.refresh()
    assert st["mode"] == "incremental" and st["recomputed_keys"] >= 1
    assert_matches(v, base)
    # vanished group is gone from the view
    assert rows(v.read().filter("grp = 'c'")) == []


def test_merge_update_recomputes_touched_keys(spark, tmp_path, base):
    v = IncrementalSketchView(
        spark, base, str(tmp_path / "v"), keys=["grp"], ndv={"u_ndv": "u"}
    )
    v.refresh()
    # a MERGE that changes a row's distinct value (pre-image removed)
    base.merge(
        spark.createDataFrame([Row(id=3, grp="a", u="user99")]), keys=["id"]
    )
    st = v.refresh()
    assert st["mode"] == "incremental"
    assert_matches(v, base)
    assert v.refresh()["mode"] == "noop"


def test_crash_before_record_never_double_applies(spark, tmp_path, base):
    """Crash injection: the refresh dies AFTER its union merge but BEFORE
    the state record, more base commits land, and the re-run must resume
    the non-idempotent union from the txn marker — not replay it."""
    v = IncrementalSketchView(
        spark, base, str(tmp_path / "v"), keys=["grp"], ndv={"u_ndv": "u"}
    )
    v.refresh()
    base.write(
        spark.createDataFrame([Row(id=200, grp="b", u="user42")]), mode="append"
    )

    real_record = v._record

    def crash(_version):
        raise RuntimeError("injected crash before state record")

    v._record = crash
    try:
        v.refresh()
    except RuntimeError:
        pass
    v._record = real_record

    # new commits land between the crash and the re-run
    base.write(
        spark.createDataFrame([Row(id=201, grp="b", u="user43")]), mode="append"
    )
    base.delete_where([("id", "=", 1)])  # grp b, user1: forces recompute too
    st = v.refresh()
    assert st["mode"] == "incremental"
    assert_matches(v, base)  # n would be double-counted if the union replayed
    assert v.refresh()["mode"] == "noop"
