"""Per-file Bloom-filter data skipping (add_bloom_filters): point lookups
on high-cardinality unclustered columns skip files min/max stats cannot —
each file's [min, max] spans the whole id domain, but its Bloom proves
absence.  The JVM build hash and the driver-side probe must agree
bit-for-bit (both md5 over the same string rendering)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_spark.tables import ManagedTable


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# SPARSE ids (multiples of 7) interleaved across files: a probe for an
# in-between value (e.g. 8) falls INSIDE every file's [min, max], so
# min/max stats prune nothing — the gap only a Bloom filter can prove.
_IDS = [i * 7 for i in range(400)]
_ABSENT = 30  # inside every file's [min, max], never written


@pytest.fixture
def idtable(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(id=i, tag=f"tag-{i}", val=float(i)) for i in _IDS]
    ).repartition(4, F.col("id") % 4)
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.write(df)
    return t


def test_bloom_prunes_absent_point_lookup(spark, idtable):
    t = idtable
    # before blooms: stats can't prune an in-range gap value
    live, total = t.pruned_file_count([("id", "=", _ABSENT)])
    assert live == total and total >= 2
    t.add_bloom_filters(["id", "tag"])
    live, total = t.pruned_file_count([("id", "=", _ABSENT)])
    assert live == 0  # provably absent everywhere
    live, _ = t.pruned_file_count([("tag", "=", "tag-30")])
    assert live == 0
    assert t.scan([("id", "=", _ABSENT)]).count() == 0


def test_bloom_present_value_found_exactly(spark, idtable):
    t = idtable
    t.add_bloom_filters(["id", "tag"])
    # a present value must never be pruned away (no false negatives)
    for probe in (0, 49, 2793):
        assert rows(t.scan([("id", "=", probe)]).select("id", "tag")) == [
            (probe, f"tag-{probe}")
        ]
    assert rows(t.scan([("tag", "=", "tag-42")]).select("id")) == [(42,)]
    # typical selective lookup prunes most files (1%-fpp filter)
    live, total = t.pruned_file_count([("id", "=", 49)])
    assert live < total


def test_bloom_commit_is_metadata_only(spark, idtable):
    t = idtable
    v0 = t.latest_version()
    before = {f["path"] for f in t._entry()["files"]}
    t.add_bloom_filters(["id"])
    assert {f["path"] for f in t._entry()["files"]} == before
    # change feed: nothing to surface
    assert t.changes(v0).count() == 0
    assert t.changes(v0, include_change_type=True).count() == 0
    assert t.signed_changes(v0).count() == 0
    assert t.history()[0]["operation"] == "bloom"


def test_bloom_survives_mor_delete_and_append(spark, idtable):
    t = idtable
    t.add_bloom_filters(["id"])
    t.delete_where([("id", "=", 49)], mode="merge_on_read")
    # filter is a superset after the delete: absent stays provably absent,
    # the deleted value may still probe "maybe" but the read returns none
    assert t.pruned_file_count([("id", "=", _ABSENT)])[0] == 0
    assert t.scan([("id", "=", 49)]).count() == 0
    # appended files carry no bloom: lookups keep them (conservative)
    t.write(
        spark.createDataFrame([Row(id=9999, tag="tag-9999", val=0.0)]),
        mode="append",
    )
    live, total = t.pruned_file_count([("id", "=", 9999)])
    assert live >= 1
    assert rows(t.scan([("id", "=", 9999)]).select("tag")) == [("tag-9999",)]


def test_bloom_dropped_on_rewrite_then_rebuilt(spark, idtable):
    t = idtable
    t.add_bloom_filters(["id"])
    t.optimize()  # rewrite replaces files; stale filters must not survive
    assert all(not f.get("bloom") for f in t._entry()["files"])
    live, total = t.pruned_file_count([("id", "=", _ABSENT)])
    assert live == total  # back to stats-only
    t.add_bloom_filters(["id"])
    assert t.pruned_file_count([("id", "=", _ABSENT)])[0] == 0


def test_bloom_rejects_unsupported_types(spark, idtable):
    with pytest.raises(ValueError, match="string/integral/date"):
        idtable.add_bloom_filters(["val"])  # double: rendering-unsafe
