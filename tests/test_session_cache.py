"""Session-scoped memo (ops/session_cache.py): build-once semantics, the
release hook, and the kmeans-family wiring on top of it."""

from __future__ import annotations

from delta_lake_spark.ops import session_cache
from tests.conftest import SF_SMOKE


def test_builder_runs_once_and_clear_releases(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    key = ("test_session_cache", "unit")
    a = session_cache.session_cached(spark, key, build)
    b = session_cache.session_cached(spark, key, build)
    assert a is b
    assert calls["n"] == 1
    assert a.storageLevel.useMemory  # persisted by default
    released = session_cache.clear(spark)
    assert released >= 1
    c = session_cache.session_cached(spark, key, build)
    assert calls["n"] == 2
    assert c is not a
    session_cache.clear(spark)


def test_spherical_assignment_shared_across_family(spark):
    """v09/v10/d15/s06 must reuse ONE assignment frame — Lloyd's driver-side
    collects run once per session, not per consumer."""
    from delta_lake_spark.queries.vector import _spherical_assignment

    session_cache.clear(spark)
    fa1 = _spherical_assignment(spark, SF_SMOKE)
    fa2 = _spherical_assignment(spark, SF_SMOKE)
    assert fa1 is fa2
    assert fa1.storageLevel.useMemory
    # distinct scale dirs must not collide
    fa3 = _spherical_assignment(spark, "/root/testdata/sf0.01")
    assert fa3 is not fa1
    session_cache.clear(spark)


def test_exact_kmeans_assignment_memoized(spark):
    from delta_lake_spark.queries.vector import _kmeans_final_assignment

    session_cache.clear(spark)
    a = _kmeans_final_assignment(spark, SF_SMOKE)
    b = _kmeans_final_assignment(spark, SF_SMOKE)
    assert a is b
    session_cache.clear(spark)


def test_hit_survives_external_clearcache(spark):
    """spark.catalog.clearCache() strips block registration but leaves the
    memo entry; the next hit must re-register the persist instead of
    recomputing uncached forever."""
    from pyspark.storagelevel import StorageLevel

    session_cache.clear(spark)
    key = ("test_session_cache", "clearcache")
    df = session_cache.session_cached(spark, key, lambda: spark.range(7))
    assert df.storageLevel != StorageLevel.NONE
    spark.catalog.clearCache()
    assert df.storageLevel == StorageLevel.NONE
    hit = session_cache.session_cached(
        spark, key, lambda: (_ for _ in ()).throw(AssertionError("rebuilt"))
    )
    assert hit is df
    assert hit.storageLevel != StorageLevel.NONE
    session_cache.clear(spark)
