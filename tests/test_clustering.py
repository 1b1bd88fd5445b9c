"""Unit tests for functions/clustering.py (distributed spherical k-means).

The v09 oracle-parity test covers cross-engine determinism; these cover the
algorithm's semantics on a corpus with known structure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_spark.functions.clustering import spherical_kmeans


def _toy(spark):
    # Two well-separated directions in 4-d: ids 0-3 near +x, ids 4-7 near +y.
    rows = [
        (0, [1.0, 0.0, 0.1, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [1.0, 0.05, 0.0, 0.05]),
        (3, [0.95, 0.0, 0.05, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.1]),
        (5, [0.1, 0.9, 0.0, 0.0]),
        (6, [0.0, 1.0, 0.05, 0.0]),
        (7, [0.05, 0.95, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_two_directions(spark):
    out = spherical_kmeans(_toy(spark), k=2, iters=2).collect()
    assert len(out) == 8  # exactly one assignment per vector
    by_id = {r.vec_id: r.cl for r in out}
    group_x = {by_id[i] for i in range(4)}
    group_y = {by_id[i] for i in range(4, 8)}
    assert len(group_x) == 1 and len(group_y) == 1
    assert group_x != group_y
    assert all(-1.0 <= r.sim <= 1.0 for r in out)


def test_kmeans_zero_iters_is_seed_assignment(spark):
    # iters=0 skips updates: centroids are the k seed vectors themselves, so
    # each seed must land in its own cluster with sim == 1 (cos(v, v)).
    out = spherical_kmeans(_toy(spark), k=2, iters=0).collect()
    by_id = {r.vec_id: r for r in out}
    assert by_id[0].cl == 0 and abs(by_id[0].sim - 1.0) < 1e-12
    assert by_id[1].cl == 1 and abs(by_id[1].sim - 1.0) < 1e-12


def test_kmeans_assignment_is_argmax_of_final_centroids(spark):
    # Definitional invariant: recomputing similarity of each vector against
    # every final centroid reproduces the reported (cl, sim).
    from delta_lake_spark.functions.clustering import (
        assign_to_centroids,
        update_centroids,
    )
    from delta_lake_spark.functions.similarity import as_double

    v = _toy(spark).select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    cent = v.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cl"), F.col("e").alias("c")
    )
    for _ in range(2):
        cent = update_centroids(assign_to_centroids(v, cent, keep_vec=True))
    expected = {
        (r.vec_id, r.cl, round(r.sim, 9))
        for r in assign_to_centroids(v, cent).collect()
    }
    got = {
        (r.vec_id, r.cl, round(r.sim, 9))
        for r in spherical_kmeans(_toy(spark), k=2, iters=2).collect()
    }
    assert got == expected


def test_kmeans_and_sample_invariant_under_repartition(spark):
    """Content-addressed guarantee: cluster assignments (and therefore the
    s06 sample) are pure functions of row content — reshuffling the input
    into a different partitioning must not change a single row."""
    base = _toy(spark)
    a = {(r.vec_id, r.cl, r.sim) for r in spherical_kmeans(base.repartition(7), k=2, iters=2).collect()}
    b = {(r.vec_id, r.cl, r.sim) for r in spherical_kmeans(base.repartition(3), k=2, iters=2).collect()}
    assert a == b
