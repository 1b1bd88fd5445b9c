"""Vector-similarity operator queries over the embeddings table
(ANN / near-dup surface, SURVEY.md §7.8).

Determinism note: dot products are computed as deterministic left-to-right
folds in both engines (verified bit-identical against DuckDB's
list_dot_product), so raw double similarities are hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table, table_parallel
from delta_lake_spark.functions.similarity import as_double, cosine, cosine_topk
from delta_lake_spark.queries.registry import register

_COS_SQL = (
    "list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * "
    "sqrt(list_dot_product(b.e, b.e)))"
)


# ---------------------------------------------------------------------------
# v01 — brute-force cosine top-k: 5 query vectors against all candidates
# ---------------------------------------------------------------------------
@register(
    "v01_cosine_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT qid, vid, sim, rank FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vid, {_COS_SQL} AS sim,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
  FROM (SELECT * FROM v WHERE vec_id < 5) a
  JOIN v b ON a.vec_id <> b.vec_id
) t
WHERE rank <= 10
ORDER BY qid, rank
""",
)
def v01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    candidates = table_parallel(spark, sf_dir, "embeddings", "vec_id").select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec")
    )
    return (
        cosine_topk(queries, candidates, k=10)
        .select("qid", "vid", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v02 — embedding-cosine near-dup pairs above a threshold (corpus has no
# planted dups — max pairwise sim ≈ 0.51 — so 0.4 yields a small non-empty
# result; the operator itself is threshold-parametric)
# ---------------------------------------------------------------------------
@register(
    "v02_embedding_near_dups",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a, b.label AS label_b,
       {_COS_SQL} AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_COS_SQL} > 0.4
ORDER BY id_a, id_b
""",
)
def v02_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"), F.col("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"), F.col("embedding").alias("eb")
    )
    sim = cosine(as_double(F.col("ea")), as_double(F.col("eb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") > 0.4)
        .select("id_a", "id_b", "label_a", "label_b", "sim")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# v03 — label centroid similarity: per-label mean vector is NOT
# cross-engine float-safe (sum order), so this aggregates deterministic
# per-pair sims instead: average cosine of each label pair's cross vectors,
# rounded — still exercises the grouped-vector-analytics pattern.
# ---------------------------------------------------------------------------
@register(
    "v03_label_pair_affinity",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 200)
SELECT a.label AS label_a, b.label AS label_b,
       COUNT(*) AS n_pairs,
       FLOOR(CAST(SUM(CAST({_COS_SQL} AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 10000) / 10000 AS avg_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
""",
)
def v03_label_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200).select(
        "vec_id", "label", "embedding"
    )
    a = e.select(F.col("vec_id").alias("ida"), F.col("label").alias("label_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("idb"), F.col("label").alias("label_b"), F.col("embedding").alias("eb"))
    sim_dec = cosine(as_double(F.col("ea")), as_double(F.col("eb"))).cast("decimal(18,9)")
    return (
        a.join(b, (F.col("ida") < F.col("idb")) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.floor(F.sum(sim_dec).cast("double") / F.count("*") * 10000) / 10000).alias("avg_sim"),
        )
        .orderBy("label_a", "label_b")
    )


# ---------------------------------------------------------------------------
# v04 — bucketed ANN (IVF/LSH scale path): coordinate-sign coarse buckets
# (deterministic hyperplanes = axes of the first 4 dims), then exact cosine
# top-k WITHIN the query's bucket — each query scans ~1/16th of the corpus.
# Recall tradeoff vs v01's exact scan is the standard IVF nprobe=1 contract.
# ---------------------------------------------------------------------------
_BUCKET_SQL = (
    "(CASE WHEN e[1] > 0 THEN 1 ELSE 0 END + CASE WHEN e[2] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN e[3] > 0 THEN 4 ELSE 0 END + CASE WHEN e[4] > 0 THEN 8 ELSE 0 END)"
)


@register(
    "v04_bucketed_ann",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket FROM embeddings)
SELECT qid, vid, sim, rank FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vid, {_COS_SQL} AS sim,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
  FROM (SELECT * FROM v WHERE vec_id < 5) a
  JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
) t
WHERE rank <= 10
ORDER BY qid, rank
""",
)
def v04_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    def bucket(vec):
        out = F.lit(0)
        for j in range(4):
            out = out + F.when(
                F.element_at(vec, j + 1).cast("double") > 0, F.lit(2**j)
            ).otherwise(F.lit(0))
        return out

    e = table_parallel(spark, sf_dir, "embeddings", "vec_id").withColumn(
        "bucket", bucket(F.col("embedding"))
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    candidates = e.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("cvec"),
        F.col("bucket").alias("cbucket"),
    )
    joined = candidates.join(
        F.broadcast(queries),
        (F.col("qbucket") == F.col("cbucket")) & (F.col("qid") != F.col("vid")),
    )
    sims = joined.select(
        "qid", "vid", cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))).alias("sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v05 — per-label centroid + dispersion via grouped applyInPandas (the
# Arrow-grouped escape hatch; float reductions are deterministic through
# in-group sorting but not SQL-expressible — rows-only check, like m02)
# ---------------------------------------------------------------------------
@register("v05_label_centroids")
def v05_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.pandas_ops import label_centroids

    e = table(spark, sf_dir, "embeddings")
    return (
        label_centroids(e)
        .select("label", "n", F.size("centroid").alias("dim"), "mean_dist", "max_dist")
        .orderBy("label")
    )
