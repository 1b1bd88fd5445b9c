"""Session-scoped memo for expensive shared DataFrames.

Several query families re-derive the same intermediate frame (the spherical
k-means assignment for v09/v10/d15/s06, the exact-integer k-means assignment
for v17/d21, the quantized vector projection for v18–v21).  Plan-equality in
Spark's CacheManager shares the *scan* stages between them, but any pipeline
with a driver-side step (Lloyd's centroid collects) is rebuilt per consumer —
the collects re-run even though the cached scan is reused.

``session_cached`` memoizes the BUILT DataFrame per (applicationId, key), so
driver-side work runs once per session and every consumer reuses the same
persisted frame.  This is the release-hook half of the pattern flagged in
ADVICE r5: entries from other applications are evicted whenever a new
application inserts (their session is gone; their executors already freed the
blocks), and ``clear()`` is the explicit library-consumer release valve —
equivalent to ``spark.catalog.clearCache()`` plus dropping the memo, for
long-lived sessions that touch many scale dirs.

Correctness contract: keys must name immutable inputs (the read-only testdata
parquet dirs).  A consumer pointing a key at mutable data must ``clear()``
between mutations.
"""

from __future__ import annotations

from collections.abc import Callable
from threading import Lock

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_LOCK = Lock()
_CACHE: dict[tuple, DataFrame] = {}


def session_cached(
    spark: SparkSession,
    key: tuple,
    builder: Callable[[], DataFrame],
    persist: bool = True,
) -> DataFrame:
    """Return the memoized frame for ``key`` in this Spark application,
    building (and by default persisting) it on first use.

    The builder may run driver-side collects; they execute once per
    application.  Entries belonging to other applicationIds are evicted on
    insert, bounding the memo to the live session.
    """
    app = spark.sparkContext.applicationId
    full = (app, *key)
    with _LOCK:
        hit = _CACHE.get(full)
    if hit is not None:
        if persist and hit.storageLevel == StorageLevel.NONE:
            # an external spark.catalog.clearCache() stripped the block
            # registration but left the memo entry: re-register instead of
            # silently recomputing uncached on every subsequent hit
            hit.persist()
        return hit
    df = builder()
    if persist:
        df = df.persist()
    with _LOCK:
        for stale in [k for k in _CACHE if k[0] != app]:
            _CACHE.pop(stale, None)
        # under a race, keep the first insert; the loser's persist is a
        # plan-equal no-op the CacheManager dedupes
        return _CACHE.setdefault(full, df)


def clear(spark: SparkSession | None = None) -> int:
    """Unpersist and drop every memoized frame (optionally only the given
    session's application).  Returns the number of entries released."""
    app = spark.sparkContext.applicationId if spark is not None else None
    with _LOCK:
        keys = [k for k in _CACHE if app is None or k[0] == app]
        dropped = [(k, _CACHE.pop(k)) for k in keys]
    for _, df in dropped:
        try:
            df.unpersist()
        except Exception:
            pass  # a stopped session cannot unpersist; blocks are gone anyway
    return len(dropped)
