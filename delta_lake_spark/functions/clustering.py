"""Distributed spherical k-means over an embedding column.

The semantic-clustering primitive of a training-data pipeline (topic
bucketing, cluster-balanced sampling, semantic-dedup preprocessing —
the SemDeDup/DSIR-style corpus shaping step).  Reference scope: the
reference engine (Doodhust/delta_lake) has no clustering operator; this is a
beyond-reference extension in the SURVEY.md §7.8 family.

Scale shape (the canonical Lloyd's-on-MapReduce plan):

- centroids collapse to ONE broadcast row carrying an array of (cl, c)
  structs; assignment is a per-row fold over that array — map-only, the
  corpus never shuffles for an assignment;
- the centroid update is the iteration's ONLY shuffle, keyed by
  (cluster, dim) with map-side partial aggregation — k*dim groups
  regardless of corpus size, so the reduce side is constant-size even at
  100 TB (assignment carries the vector through, so no join back);
- iterations are a driver-side loop over DataFrame transformations (the
  corpus is never collected; only the k centroid rows move).

Determinism (both engines produce bit-identical assignments):

- cosine similarities use the left-to-right ``dot`` fold proven
  bit-identical with DuckDB's ``list_dot_product`` (see
  functions/similarity.py);
- centroid means follow the registry decimal rule: components are cast to
  ``decimal(20,12)`` before summing (exact, order-independent), divided as
  doubles, and rounded to 6 decimals — so both engines feed the next
  iteration the identical centroid literal values;
- argmax ties break on the lower cluster id.

Spherical (cosine) k-means: cos(v, c) is invariant to scaling c, so the
mean-of-members centroid needs no re-normalization for the argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_spark.functions.similarity import as_double, cosine


def assign_to_centroids(
    vectors: DataFrame, centroids: DataFrame, keep_vec: bool = False
) -> DataFrame:
    """Nearest-centroid assignment by cosine similarity — MAP-ONLY.

    ``vectors``: (vec_id, e: array<double>); ``centroids``: (cl, c).
    Returns (vec_id, cl, sim) with exactly one row per vector (ties on
    similarity break to the lower cluster id).

    The k centroids collapse to a single broadcast row holding an array of
    (cl, c) structs; each vector folds over that array to find its argmax
    in one projection.  No shuffle touches the corpus — the naive
    crossJoin + per-vec_id ranking window would re-shuffle n*k rows every
    iteration, which is exactly the plan that dies at 100 TB.  The fold's
    explicit better-than rule (higher sim, then lower cl) makes the result
    independent of the array's collection order.
    """
    cents = F.broadcast(
        centroids.agg(F.collect_list(F.struct("cl", "c")).alias("cents"))
    )

    def better(acc, x):
        sim = cosine(F.col("e"), x["c"])
        wins = (sim > acc["sim"]) | ((sim == acc["sim"]) & (x["cl"] < acc["cl"]))
        return F.when(
            wins, F.struct(x["cl"].alias("cl"), sim.alias("sim"))
        ).otherwise(acc)

    acc0 = F.struct(
        F.lit(-1).cast("long").alias("cl"), F.lit(-2.0).alias("sim")
    )
    best = F.aggregate(F.col("cents"), acc0, better)
    cols = ["vec_id", best["cl"].alias("cl"), best["sim"].alias("sim")]
    if keep_vec:
        cols.append(F.col("e"))
    return vectors.crossJoin(cents).select(*cols)


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster per-dimension mean, decimal-summed and rounded to 6
    decimals so the value is accumulation-order-independent.

    ``assigned``: (cl, e) — an assignment that kept its vector, so no join
    back to the corpus is needed.  One shuffle keyed by (cl, pos) — k*dim
    groups, constant-size reduce with map-side partials.
    """
    member_dims = assigned.select(
        "cl", F.posexplode("e").alias("pos", "val")
    ).select("cl", "pos", F.col("val").cast("decimal(20,12)").alias("val"))
    dim_means = member_dims.groupBy("cl", "pos").agg(
        F.round(F.sum("val").cast("double") / F.count("*"), 6).alias("m")
    )
    return dim_means.groupBy("cl").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("c")
    )


def spherical_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's spherical k-means: ``iters`` update rounds from the
    deterministic seed (the k lowest-id vectors), then a final assignment.

    Returns (vec_id, cl, sim).  Fixed iteration count (not convergence-
    tested) keeps the plan statically known and the oracle expressible as
    unrolled SQL.
    """
    # persist the projected vectors: every Lloyd round plus the final
    # assignment scans this frame (iters+1 passes), and the plan-equal
    # cached relation is shared across the kmeans consumers (v09/v10/d15/
    # s06/d21) within a session (measured: family warm total 13.1 -> 11.4 s
    # and v09 cold 11.6 -> 2.9 s at sf0.1)
    v = embeddings.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("e")
    ).persist()
    spark = embeddings.sparkSession
    centroids = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cl"), F.col("e").alias("c")
    )
    for _ in range(iters):
        assigned = assign_to_centroids(v, centroids, keep_vec=True)
        # materialize the k centroid rows (k*dim doubles — metadata-sized)
        # each round: left lazy, round i's broadcast subtree RECOMPUTES
        # every earlier round inside the same job, so the corpus is scanned
        # O(iters^2) times; collected, each round is one clean map +
        # (k*dim)-group shuffle and the chain is linear (measured
        # 8.8 -> 3.2 s warm on v10, 10.2 -> 2.3 s on d21 at sf0.1).  Values are bit-identical:
        # update_centroids rounds to 6 decimals before the collect, and a
        # double survives the driver round-trip exactly.
        rows = update_centroids(assigned).collect()
        centroids = spark.createDataFrame(
            [(r["cl"], r["c"]) for r in rows], "cl long, c array<double>"
        )
    return assign_to_centroids(v, centroids)
