"""Distributed spherical k-means over an embedding column.

The semantic-clustering primitive of a training-data pipeline (topic
bucketing, cluster-balanced sampling, semantic-dedup preprocessing —
the SemDeDup/DSIR-style corpus shaping step).  Reference scope: the
reference engine (Doodhust/delta_lake) has no clustering operator; this is a
beyond-reference extension in the SURVEY.md §7.8 family.

Scale shape (the canonical Lloyd's-on-MapReduce plan):

- centroids are k rows — always broadcast; assignment is a broadcast
  nested-loop over k tiny rows per vector, embarrassingly parallel, no
  shuffle of the corpus;
- the centroid update is ONE shuffle per iteration, keyed by
  (cluster, dim) — k*dim groups regardless of corpus size, so the reduce
  side is constant-size even at 100 TB;
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_spark.functions.similarity import as_double, cosine


def assign_to_centroids(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by cosine similarity.

    ``vectors``: (vec_id, e: array<double>); ``centroids``: (cl, c).
    Returns (vec_id, cl, sim) with exactly one row per vector (ties on
    similarity break to the lower cluster id).
    """
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "cl")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select("vec_id", "cl", cosine(F.col("e"), F.col("c")).alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


def update_centroids(vectors: DataFrame, assignment: DataFrame) -> DataFrame:
    """Per-cluster per-dimension mean, decimal-summed and rounded to 6
    decimals so the value is accumulation-order-independent.

    One shuffle keyed by (cl, pos) — k*dim groups, constant-size reduce.
    """
    member_dims = (
        vectors.join(assignment.select("vec_id", "cl"), "vec_id")
        .select("cl", F.posexplode("e").alias("pos", "val"))
        .select("cl", "pos", F.col("val").cast("decimal(20,12)").alias("val"))
    )
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
    v = embeddings.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("e")
    )
    centroids = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cl"), F.col("e").alias("c")
    )
    for _ in range(iters):
        assignment = assign_to_centroids(v, centroids)
        centroids = update_centroids(v, assignment)
    return assign_to_centroids(v, centroids)
