"""Snapshot tags: named refs + vacuum/cleanup_log retention interplay."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable


def _mk(spark, path, n=100):
    t = ManagedTable(spark, str(path))
    t.write(spark.range(n).withColumn("v", F.lit(0)))
    return t


def test_tag_resolve_and_guard_rails(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.tag("baseline")
    t.write(spark.range(50).withColumn("v", F.lit(1)), mode="overwrite")
    assert t.tags() == {"baseline": v0}
    assert t.read("baseline").count() == 100  # tag resolves to the pinned snapshot
    assert t.read().count() == 50
    with pytest.raises(ValueError, match="already exists"):
        t.tag("baseline")
    with pytest.raises(KeyError, match="no such tag"):
        t.read("nope")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("bad/name")
    with pytest.raises(ValueError, match="does not exist"):
        t.tag("ghost", version=99)
    t.delete_tag("baseline")
    assert t.tags() == {}
    with pytest.raises(KeyError):
        t.delete_tag("baseline")


def test_vacuum_keeps_tagged_snapshot_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.tag("keepme")
    t.write(spark.range(10).withColumn("v", F.lit(1)), mode="overwrite")
    t.write(spark.range(20).withColumn("v", F.lit(2)), mode="overwrite")
    t.vacuum()  # retain_hours=0: only latest + tagged survive
    assert t.read("keepme").count() == 100  # files kept despite age
    # the untagged intermediate snapshot IS gone
    from delta_lake_spark.tables.managed import VacuumedVersionError

    with pytest.raises(VacuumedVersionError):
        t.read(version=1).count()
    # dropping the tag releases the files on the next vacuum
    t.delete_tag("keepme")
    assert t.vacuum() > 0
    with pytest.raises(VacuumedVersionError):
        t.read(version=0).count()


def test_cleanup_log_respects_tags(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    t.tag("pin", version=0)
    # drive past two checkpoint intervals so cleanup has a base to use
    for i in range(22):
        t.write(
            spark.range(i, i + 1).withColumn("v", F.lit(i)), mode="append"
        )
    assert t.cleanup_log() == 0  # tag at v0 blocks any prefix removal
    assert t.read("pin").count() == 5
    t.delete_tag("pin")
    assert t.cleanup_log() > 0  # prefix now removable
    with pytest.raises(ValueError):
        t.tag("late", version=0)  # cleaned version can no longer be tagged


def test_tags_resolve_everywhere(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.tag("v-first")
    t.write(spark.range(7).withColumn("v", F.lit(1)), mode="overwrite")
    assert t.scan([("id", "<", 10)], version="v-first").count() == 10
    assert len(t.schema("v-first").fields) == 2
    c = t.clone(str(tmp_path / "c"), version="v-first")
    assert c.read().count() == 100
    t.restore("v-first")
    assert t.read().count() == 100


def test_user_table_properties(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    t.set_property("owner", "data-eng")
    t.set_property("tier", "gold")
    assert t.properties()["user"] == {"owner": "data-eng", "tier": "gold"}
    t.set_property("tier", None)  # unset
    assert t.properties()["user"] == {"owner": "data-eng"}
    # carried across data commits and versioned
    t.write(spark.range(3).withColumn("v", F.lit(1)), mode="append")
    assert t.properties()["user"] == {"owner": "data-eng"}
    assert t.properties(version=0)["user"] == {}


def test_describe_extended_joins_surfaces(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    t.set_property("owner", "data-eng")
    t.tag("rel-1")
    t.analyze()
    d = t.describe_extended()
    assert d["num_files"] >= 1 and d["version"] == t.latest_version()
    assert d["properties"]["user"] == {"owner": "data-eng"}
    assert d["statistics"]["n_rows"] == 10
    assert d["tags"] == {"rel-1": 1}  # pinned after the set_property commit
    assert d["history_length"] == t.latest_version() + 1
