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


# ---------------------------------------------------------------------------
# Embedding validity gate (round 7, adversarial-corpus hardening). Two
# classes of corrupt embedding row are treated as invalid INPUT and
# excluded from every vector-family read (and from every oracle, which
# reads the same gated subquery, so both engines agree row-for-row):
#
# - ZERO-NORM vectors (a failed upstream model call): cosine and every
#   normalized-dot semantic is 0/0 on them — ANSI Spark raises
#   DIVIDE_BY_ZERO, DuckDB folds to NaN, and NaN's sort position then
#   diverges between engines. The norm test is the deterministic
#   left-to-right fold both engines share (functions/similarity.dot).
#   NOTE: a NaN coordinate is NOT caught by the > 0 test — both Spark and
#   DuckDB order NaN greater than any number, so `NaN > 0` is TRUE in
#   both; NaN/inf rows are excluded by the UPPER bound instead
#   (`NaN <= _EMB_MAX_SUMSQ` is false in both engines). Do not relax the
#   magnitude bound believing the norm test alone catches NaN.
# - OUT-OF-DOMAIN magnitudes (||v|| > 150, incl. any +-inf coordinate):
#   real embedding models emit unit-ish coordinates; the exact-integer
#   kernels (v17 Lloyd at scale 1e6, the PQ codebooks) quantize to BIGINT
#   assuming bounded coordinates, and a corrupt 1e30 coordinate overflows
#   the integer domain (ANSI ARITHMETIC_OVERFLOW / DuckDB bigint error).
#   ||v|| <= 150 bounds every coordinate by 150, keeping the worst
#   squared-distance fold at 64 * (2*150*1e6)^2 = 5.8e18 < 2^63.
#
# Both tests read off the SAME single sumsq fold (0 < sumsq <= 150^2), so
# the gate costs one O(dim) pass per row — measured: the earlier two-fold
# form (separate norm + exists(|x|>bound)) doubled v01's candidate-scan
# cost; this form is one fold. A NaN/inf coordinate makes sumsq NaN/inf,
# which fails the range test in both engines identically.
# ---------------------------------------------------------------------------
_EMB_MAX_SUMSQ = 150.0 * 150.0


def _nz(df: DataFrame) -> DataFrame:
    from delta_lake_spark.functions.similarity import as_double, dot

    v = as_double(F.col("embedding"))
    sumsq = dot(v, v)
    return df.filter((sumsq > 0) & (sumsq <= F.lit(_EMB_MAX_SUMSQ)))


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
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings)
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
    e = _nz(table(spark, sf_dir, "embeddings"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    candidates = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec")
    )
    return (
        cosine_topk(queries, candidates, k=10)
        .select("qid", "vid", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v02 — embedding-cosine near-dup pairs via hyperplane-LSH candidate
# generation: 16 seeded hyperplane sign bits per vector, banded 8x2; vectors
# sharing any band bucket become candidate pairs; exact cosine verifies
# candidates against the threshold.  NO all-pairs join anywhere — the only
# joins are equi-joins on (band, key) and on vec_id, so the plan stays
# hash/sort-merge (a test asserts no BroadcastNestedLoopJoin).  At 100 TB
# the knobs scale the same shape: more hyperplanes + wider band keys shrink
# buckets, candidate fetch stays two id-equi-joins.  Recall at the 0.4
# threshold is 1-(1-p^2)^8 with p = 1 - acos(sim)/pi (~98%); the oracle
# replicates the exact seeded hyperplanes so both engines surface the
# identical candidate set (the d06 MinHash pattern).
#
# (Corpus has no planted dups — max pairwise sim ~0.51 — so 0.4 yields a
# small non-empty result; threshold and banding are parametric.)
# ---------------------------------------------------------------------------
_EMB_DIM = 64
_N_BANDS, _BAND_BITS = 8, 2


def _v02_oracle() -> str:
    from delta_lake_spark.functions.similarity import hyperplanes

    sig = " + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(x) for x in p)}]) > 0"
        f" THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(hyperplanes(_EMB_DIM))
    )
    cos = (
        "list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e)) * "
        "sqrt(list_dot_product(vb.e, vb.e)))"
    )
    return f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
s AS (SELECT vec_id, ({sig}) AS sig FROM v),
bands AS (SELECT vec_id, r.range AS band,
                 (sig >> (r.range * {_BAND_BITS})) & {(1 << _BAND_BITS) - 1} AS key
          FROM s, range({_N_BANDS}) r),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b, va.label AS label_a, vb.label AS label_b, {cos} AS sim
FROM cand c
JOIN v va ON va.vec_id = c.id_a
JOIN v vb ON vb.vec_id = c.id_b
WHERE {cos} > 0.4
ORDER BY id_a, id_b
"""


@register("v02_embedding_near_dups", oracle=_v02_oracle())
def v02_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.similarity import hyperplane_signature

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        "vec_id", "label", "embedding"
    )
    sig = e.select(
        "vec_id", hyperplane_signature("embedding", dim=_EMB_DIM).alias("sig")
    )
    mask = (1 << _BAND_BITS) - 1
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * _BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"), F.col("embedding").alias("ea")
    )
    vb = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"), F.col("embedding").alias("eb")
    )
    sim = cosine(as_double(F.col("ea")), as_double(F.col("eb")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
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
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings WHERE vec_id < 200)
SELECT a.label AS label_a, b.label AS label_b,
       COUNT(*) AS n_pairs,
       FLOOR(CAST(SUM(CAST({_COS_SQL} AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 10000) / 10000 AS avg_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
""",
)
def v03_label_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _nz(table(spark, sf_dir, "embeddings")).filter(F.col("vec_id") < 200).select(
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
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings)
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

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).withColumn(
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
# v06 — multi-probe bucketed ANN: v04's IVF shape with nprobe=5.  Each query
# probes its own coarse bucket PLUS the 4 buckets at Hamming distance 1
# (one sign-bit flip each) — the standard multi-probe LSH recall fix for
# queries near a hyperplane boundary, still scanning only 5/16 of the
# corpus.  Buckets partition the candidates exactly, and the 5 probe keys
# are distinct, so no candidate duplicates and no DISTINCT is needed: the
# plan stays a single equi-join (probe_bucket = candidate_bucket) against
# a broadcast query side — identical shape at 100x with more buckets.
# ---------------------------------------------------------------------------
@register(
    "v06_multiprobe_ann",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
q AS (SELECT vec_id, e, xor(bucket, m.flip) AS probe
      FROM v, (SELECT unnest([0, 1, 2, 4, 8]) AS flip) m
      WHERE vec_id < 5)
SELECT qid, vid, sim, rank FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vid, {_COS_SQL} AS sim,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
  FROM q a JOIN v b ON a.probe = b.bucket AND a.vec_id <> b.vec_id
) t
WHERE rank <= 10
ORDER BY qid, rank
""",
)
def v06_multiprobe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    def bucket(vec):
        out = F.lit(0)
        for j in range(4):
            out = out + F.when(
                F.element_at(vec, j + 1).cast("double") > 0, F.lit(2**j)
            ).otherwise(F.lit(0))
        return out

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).withColumn(
        "bucket", bucket(F.col("embedding"))
    )
    probes = (
        e.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in (0, 1, 2, 4, 8)])
            ).alias("probe"),
        )
    )
    candidates = e.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("cvec"),
        F.col("bucket").alias("cbucket"),
    )
    joined = candidates.join(
        F.broadcast(probes),
        (F.col("probe") == F.col("cbucket")) & (F.col("qid") != F.col("vid")),
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
# d11 — embedding-cosine near-dup DEDUP: v02's LSH candidate pipeline, then
# the greedy keep-lowest-id rule (d09's text-side pattern applied to
# vectors): any vector appearing as the higher id of a near-dup pair is
# dropped, survivors carry forward.  One extra anti-join on vec_id beyond
# v02 — no new shuffle shape, scales exactly as v02 does.
# ---------------------------------------------------------------------------
def _d11_oracle() -> str:
    pairs = _v02_oracle().rsplit("SELECT c.id_a", 1)[0]  # CTE prefix (v, s, bands, cand)
    cos = (
        "list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e)) * "
        "sqrt(list_dot_product(vb.e, vb.e)))"
    )
    return f"""{pairs.rstrip()},
dups AS (SELECT DISTINCT c.id_b FROM cand c
         JOIN v va ON va.vec_id = c.id_a
         JOIN v vb ON vb.vec_id = c.id_b
         WHERE {cos} > 0.4)
SELECT v.vec_id, v.label FROM v
WHERE v.vec_id NOT IN (SELECT id_b FROM dups)
ORDER BY v.vec_id
"""


@register("d11_embedding_dedup_survivors", oracle=_d11_oracle())
def d11_embedding_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = v02_embedding_near_dups(spark, sf_dir)
    dups = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select("vec_id", "label")
    return e.join(dups, "vec_id", "left_anti").orderBy("vec_id")


# ---------------------------------------------------------------------------
# v05 — per-label centroid + dispersion via grouped applyInPandas (the
# Arrow-grouped escape hatch; float reductions are deterministic through
# in-group sorting but not SQL-expressible — rows-only check, like m02)
# ---------------------------------------------------------------------------
@register("v05_label_centroids")
def v05_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.pandas_ops import label_centroids

    e = _nz(table(spark, sf_dir, "embeddings"))
    return (
        label_centroids(e)
        .select("label", "n", F.size("centroid").alias("dim"), "mean_dist", "max_dist")
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# v07 — ANN quality metric: recall@10 of the bucketed ANN paths against the
# exact scan, per query.  Composes the v01 (exact), v04 (nprobe=1) and v06
# (nprobe=5) plans and counts ground-truth hits — the measurement loop any
# production ANN deployment runs to tune nprobe/bucket count.  Output is
# integer hit counts out of 10 (hash-stable).
# ---------------------------------------------------------------------------
@register(
    "v07_ann_recall",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
exact AS (
  SELECT qid, vid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS vid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
    FROM (SELECT * FROM v WHERE vec_id < 5) a
    JOIN v b ON a.vec_id <> b.vec_id
  ) t WHERE rank <= 10
),
ivf1 AS (
  SELECT qid, vid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS vid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
    FROM (SELECT * FROM v WHERE vec_id < 5) a
    JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  ) t WHERE rank <= 10
),
ivf5 AS (
  SELECT qid, vid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS vid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
    FROM (SELECT vec_id, e, xor(bucket, m.flip) AS bucket
          FROM v, (SELECT unnest([0, 1, 2, 4, 8]) AS flip) m
          WHERE vec_id < 5) a
    JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  ) t WHERE rank <= 10
)
SELECT e.qid,
       COUNT(*)      AS n_exact,
       COUNT(i1.vid) AS hits_nprobe1,
       COUNT(i5.vid) AS hits_nprobe5
FROM exact e
LEFT JOIN ivf1 i1 ON i1.qid = e.qid AND i1.vid = e.vid
LEFT JOIN ivf5 i5 ON i5.qid = e.qid AND i5.vid = e.vid
GROUP BY e.qid
ORDER BY e.qid
""",
)
def v07_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scored pass for all three retrieval paths (r10, guide §1.2 "don't
    # compute things you throw away"): composing v01+v04+v06 verbatim paid
    # THREE corpus scans and three cosine passes, but the bucket-matched
    # (v04) and multiprobe (v06) candidate sets are strict SUBSETS of the
    # exact all-pairs set — xor flips are distinct, so a candidate matches
    # at most one probe and per-pair rows never duplicate.  Score the
    # 5-query x corpus pairs once, persist the (qid, vid, sim, buckets)
    # frame, and derive each path's top-10 as a filter + the SAME
    # rank window (WindowGroupLimit prunes to k per map partition).
    # Alternating-process A/B at sf0.1 (warm medians, 3 cycles):
    # 0.97/0.97/1.05 -> 0.51/0.59/0.69 s.
    from pyspark.sql.window import Window

    from delta_lake_spark.functions.similarity import as_double, cosine

    def bucket(vec):
        out = F.lit(0)
        for j in range(4):
            out = out + F.when(
                F.element_at(vec, j + 1).cast("double") > 0, F.lit(2**j)
            ).otherwise(F.lit(0))
        return out

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).withColumn(
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
    scored = (
        candidates.crossJoin(F.broadcast(queries))
        .filter(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))).alias(
                "sim"
            ),
            "qbucket",
            "cbucket",
        )
        .persist()
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")

    def top10(df):
        return (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("qid", "vid")
        )

    exact = top10(scored)
    ivf1 = top10(scored.filter(F.col("qbucket") == F.col("cbucket"))).select(
        F.col("qid").alias("q1"), F.col("vid").alias("v1")
    )
    probes = F.array(
        *[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in (0, 1, 2, 4, 8)]
    )
    ivf5 = top10(
        scored.filter(F.array_contains(probes, F.col("cbucket")))
    ).select(F.col("qid").alias("q5"), F.col("vid").alias("v5"))
    return (
        exact.join(
            ivf1, (F.col("qid") == F.col("q1")) & (F.col("vid") == F.col("v1")), "left"
        )
        .join(
            ivf5, (F.col("qid") == F.col("q5")) & (F.col("vid") == F.col("v5")), "left"
        )
        .groupBy("qid")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("v1").alias("hits_nprobe1"),
            F.count("v5").alias("hits_nprobe5"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# v08 — scalar-quantized (int8) ANN: normalize -> floor(v*127) int8 codes ->
# integer-dot coarse scan (top-40 per query) -> exact-cosine re-rank of the
# candidate set (top-10).  The production memory-reduction path: the coarse
# scan touches 4x fewer bytes than float32 and stays in whole-stage codegen
# as pure integer arithmetic; full-precision vectors are fetched by id
# equi-join only for the 40-candidate re-rank.  At 100 TB this composes with
# the v04 IVF buckets (quantized codes inside each bucket).
# Reference analog: the ANN surface of SURVEY.md §7.8 (extension family).
# ---------------------------------------------------------------------------
_QUANT_C = 40  # coarse candidates per query before exact re-rank

_Q_SQL = "list_transform(e, x -> CAST(FLOOR(x / sqrt(list_dot_product(e, e)) * 127.0) AS INT))"
_QDOT_SQL = (
    "CAST(list_dot_product(list_transform(a.q, x -> CAST(x AS DOUBLE)), "
    "list_transform(b.q, x -> CAST(x AS DOUBLE))) AS BIGINT)"
)


@register(
    "v08_quantized_ann",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
n AS (SELECT vec_id, e, {_Q_SQL} AS q FROM v),
coarse AS (
  SELECT qid, vid, qscore FROM (
    SELECT qid, vid, qscore,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qscore DESC, vid) AS crank
    FROM (
      SELECT a.vec_id AS qid, b.vec_id AS vid, {_QDOT_SQL} AS qscore
      FROM (SELECT * FROM n WHERE vec_id < 5) a
      JOIN n b ON a.vec_id <> b.vec_id
    ) raw
  ) ranked WHERE crank <= {_QUANT_C}
),
rerank AS (
  SELECT c.qid, c.vid, c.qscore,
         list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e)) *
         sqrt(list_dot_product(vb.e, vb.e))) AS sim
  FROM coarse c
  JOIN v va ON va.vec_id = c.qid
  JOIN v vb ON vb.vec_id = c.vid
)
SELECT qid, vid, qscore, sim, rank FROM (
  SELECT qid, vid, qscore, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rank
  FROM rerank
) t WHERE rank <= 10
ORDER BY qid, rank
""",
)
def v08_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from delta_lake_spark.functions.similarity import qdot, quantize_int8

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select("vec_id", "embedding")
    codes = e.select("vec_id", quantize_int8(F.col("embedding")).alias("q"))
    queries = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    # Coarse stage: int8 codes only — the 4x-smaller scan.
    coarse_w = Window.partitionBy("qid").orderBy(F.desc("qscore"), "vid")
    coarse = (
        codes.select(F.col("vec_id").alias("vid"), F.col("q").alias("cq"))
        .crossJoin(F.broadcast(queries))
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid", qdot(F.col("qq"), F.col("cq")).alias("qscore"))
        .withColumn("crank", F.row_number().over(coarse_w))
        .filter(F.col("crank") <= _QUANT_C)
        .drop("crank")
    )
    # Re-rank stage: fetch full-precision vectors for the candidate set only.
    va = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    vb = e.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec"))
    rerank_w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    return (
        coarse.join(va, "qid")
        .join(vb, "vid")
        .withColumn("sim", cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))))
        .withColumn("rank", F.row_number().over(rerank_w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid", "qscore", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v09 — distributed spherical k-means (semantic clustering): k=8 centroids
# seeded from the lowest vec_ids, 2 Lloyd iterations, final assignment.
# The corpus-shaping step of a training-data pipeline (topic bucketing /
# SemDeDup-style cluster-then-dedup).  Scale shape: centroids (k rows) are
# broadcast so assignment never shuffles the corpus; each update is ONE
# shuffle with k*dim groups — constant reduce size at any corpus scale.
# Determinism: dot folds are the bit-identical-with-DuckDB primitive,
# centroid means are decimal-summed (order-independent) and rounded to 6
# decimals before feeding the next iteration (see functions/clustering.py).
# The oracle unrolls the same two iterations as CTE pairs.
# ---------------------------------------------------------------------------
_KM_K, _KM_ITERS = 8, 2


def _km_cos(v: str, c: str) -> str:
    return (
        f"list_dot_product({v}.e, {c}.c) / (sqrt(list_dot_product({v}.e, {v}.e))"
        f" * sqrt(list_dot_product({c}.c, {c}.c)))"
    )


def _km_ctes(k: int = _KM_K, iters: int = _KM_ITERS, dim: int = _EMB_DIM) -> tuple[list[str], str]:
    """The unrolled Lloyd-iteration CTE chain shared by the v09 and d15
    oracles; returns (ctes, name-of-final-centroid-CTE)."""
    cos = _km_cos
    ctes = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings)",
        f"c0 AS (SELECT vec_id AS cl, e AS c FROM v WHERE vec_id < {k})",
    ]
    for it in range(1, iters + 1):
        prev_c, a, c = f"c{it - 1}", f"a{it}", f"c{it}"
        ctes.append(
            f"""{a} AS (
  SELECT vec_id, cl FROM (
    SELECT v.vec_id, {prev_c}.cl,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {cos('v', prev_c)} DESC, {prev_c}.cl) AS rnk
    FROM v CROSS JOIN {prev_c}) t
  WHERE rnk = 1)"""
        )
        ctes.append(
            f"""{c} AS (
  SELECT cl, list(m ORDER BY i) AS c FROM (
    SELECT {a}.cl, t.i,
           ROUND(CAST(SUM(CAST(v.e[t.i] AS DECIMAL(20,12))) AS DOUBLE)
                 / COUNT(*), 6) AS m
    FROM v JOIN {a} USING (vec_id) CROSS JOIN range(1, {dim + 1}) t(i)
    GROUP BY {a}.cl, t.i) d
  GROUP BY cl)"""
        )
    return ctes, f"c{iters}"


def _v09_oracle() -> str:
    ctes, final_c = _km_ctes()
    cos = _km_cos
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vec_id, cl, sim FROM (
  SELECT v.vec_id, {final_c}.cl, {cos('v', final_c)} AS sim,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY {cos('v', final_c)} DESC, {final_c}.cl) AS rnk
  FROM v CROSS JOIN {final_c}) t
WHERE rnk = 1
ORDER BY vec_id
"""
    )


def _spherical_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v09 spherical k-means assignment (vec_id, cl, sim), built once per
    session and shared by its whole consumer family (v09/v10/d15/s06).

    spherical_kmeans runs driver-side centroid collects per Lloyd round, so
    CacheManager plan-equality alone cannot share the work across consumers —
    each would re-run the collects.  The session memo runs Lloyd once; the
    persisted assignment (3 small columns) is what all four queries scan.
    """
    from delta_lake_spark.functions.clustering import spherical_kmeans
    from delta_lake_spark.ops.session_cache import session_cached

    def build() -> DataFrame:
        e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id"))
        return spherical_kmeans(e, k=_KM_K, iters=_KM_ITERS)

    return session_cached(
        spark, ("spherical_assignment", sf_dir, _KM_K, _KM_ITERS), build
    )


@register("v09_kmeans_clusters", oracle=_v09_oracle())
def v09_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spherical_assignment(spark, sf_dir).orderBy("vec_id")


# ---------------------------------------------------------------------------
# d15 — SemDeDup semantic deduplication: exact cosine dedup scoped WITHIN the
# v09 k-means clusters (Abbas et al. 2023's cluster-then-dedup recipe).  The
# pair join is an EQUI-join on the cluster id — never corpus-cartesian — so
# per-cluster work is (n/k)^2; at production scale k grows with the corpus to
# hold cluster size constant (k ~ n/1000), keeping per-cluster cost flat
# while clusters dedup in parallel.  The LSH path (v02/d11) is the
# alternative when clustering isn't wanted; this one also yields the cluster
# label for downstream cluster-balanced sampling.  Survivors = lowest id per
# near-dup relation (drop the higher id of every >0.4-cosine in-cluster pair).
# ---------------------------------------------------------------------------
_SEM_THR = 0.4


def _d15_oracle() -> str:
    ctes, final_c = _km_ctes()
    cos = _km_cos
    pair_cos = (
        "list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e))"
        " * sqrt(list_dot_product(vb.e, vb.e)))"
    )
    ctes.append(
        f"""fa AS (
  SELECT vec_id, cl FROM (
    SELECT v.vec_id, {final_c}.cl,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {cos('v', final_c)} DESC, {final_c}.cl) AS rnk
    FROM v CROSS JOIN {final_c}) t
  WHERE rnk = 1)"""
    )
    ctes.append(
        f"""dups AS (
  SELECT DISTINCT b.vec_id AS id_b
  FROM fa a JOIN fa b ON a.cl = b.cl AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
  WHERE {pair_cos} > {_SEM_THR})"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT fa.vec_id, fa.cl
FROM fa LEFT JOIN dups ON fa.vec_id = dups.id_b
WHERE dups.id_b IS NULL
ORDER BY fa.vec_id
"""
    )


@register("d15_semantic_dedup", oracle=_d15_oracle())
def d15_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id"))
    v = e.select("vec_id", as_double(F.col("embedding")).alias("e"))
    # fa is referenced three times (both pair sides + the anti-join left);
    # the session-cached assignment is already persisted, so every reference
    # reads the cached 3-column frame and Lloyd never re-runs.
    fa = _spherical_assignment(spark, sf_dir).select("vec_id", "cl")
    a = fa.select(F.col("vec_id").alias("id_a"), F.col("cl").alias("cl_a"))
    b = fa.select(F.col("vec_id").alias("id_b"), F.col("cl").alias("cl_b"))
    va = v.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    vb = v.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    dups = (
        a.join(b, (F.col("cl_a") == F.col("cl_b")) & (F.col("id_a") < F.col("id_b")))
        .join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine(F.col("ea"), F.col("eb")) > _SEM_THR)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return fa.join(dups, "vec_id", "left_anti").orderBy("vec_id")


# ---------------------------------------------------------------------------
# s06 — cluster-balanced sampling: up to M representatives per v09 k-means
# cluster, chosen content-addressed (md5 bucket of vec_id) so the sample is
# stable under repartition/re-run and identical cross-engine.  The standard
# companion to SemDeDup: balanced cluster coverage for curriculum mixing or
# eval-set construction instead of frequency-biased uniform sampling.
#
# Scale shape: assignment never shuffles the corpus (broadcast centroids);
# the candidate thinning is a shuffle-free hash filter (rate chosen so
# ~M*safety rows per cluster survive), and only the thinned set hits the
# per-cluster ranking window — so the window input is a small fraction of
# the corpus and the cl-keyed skew of a full-corpus window never happens.
# ---------------------------------------------------------------------------
_S06_M, _S06_RATE_BP = 32, 2000


def _s06_oracle() -> str:
    from delta_lake_spark.functions.sampling import hash_bucket_sql

    ctes, final_c = _km_ctes()
    cos = _km_cos
    bucket = hash_bucket_sql("vec_id", "s06")
    ctes.append(
        f"""fa AS (
  SELECT vec_id, cl FROM (
    SELECT v.vec_id, {final_c}.cl,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {cos('v', final_c)} DESC, {final_c}.cl) AS rnk
    FROM v CROSS JOIN {final_c}) t
  WHERE rnk = 1)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT cl, vec_id, rnk FROM (
  SELECT cl, vec_id,
         ROW_NUMBER() OVER (PARTITION BY cl ORDER BY {bucket}, vec_id) AS rnk
  FROM fa WHERE {bucket} < {_S06_RATE_BP}) t
WHERE rnk <= {_S06_M}
ORDER BY cl, rnk
"""
    )


@register("s06_cluster_balanced_sample", oracle=_s06_oracle())
def s06_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from delta_lake_spark.functions.sampling import hash_bucket

    fa = _spherical_assignment(spark, sf_dir).select("vec_id", "cl")
    b = hash_bucket("vec_id", "s06")
    thinned = fa.withColumn("b", b).filter(F.col("b") < _S06_RATE_BP)
    rnk = F.row_number().over(Window.partitionBy("cl").orderBy("b", "vec_id"))
    return (
        thinned.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= _S06_M)
        .select("cl", "vec_id", "rnk")
        .orderBy("cl", "rnk")
    )


# ---------------------------------------------------------------------------
# v10 — cluster-quality report: per-cluster population, mean and worst
# cosine-to-centroid after the v09 run — the measurement loop that tunes k
# and iteration count (the v07/d14 analog for clustering).  Mean follows the
# registry decimal rule (exact decimal sum, double division, floor to 4dp);
# min is a raw double (deterministic: same inputs, same fold).  One k-group
# aggregate over the assignment — nothing here grows with corpus size
# except the single map-side-combined shuffle.
# ---------------------------------------------------------------------------
def _v10_oracle() -> str:
    ctes, final_c = _km_ctes()
    cos = _km_cos
    ctes.append(
        f"""fa AS (
  SELECT vec_id, cl, sim FROM (
    SELECT v.vec_id, {final_c}.cl, {cos('v', final_c)} AS sim,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {cos('v', final_c)} DESC, {final_c}.cl) AS rnk
    FROM v CROSS JOIN {final_c}) t
  WHERE rnk = 1)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT cl, COUNT(*) AS n,
       FLOOR(CAST(SUM(CAST(sim AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 10000) / 10000 AS mean_sim,
       MIN(sim) AS worst_sim
FROM fa
GROUP BY cl
ORDER BY cl
"""
    )


@register("v10_cluster_quality", oracle=_v10_oracle())
def v10_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    fa = _spherical_assignment(spark, sf_dir)
    return (
        fa.groupBy("cl")
        .agg(
            F.count("*").alias("n"),
            (
                F.floor(
                    F.sum(F.col("sim").cast("decimal(18,9)")).cast("double")
                    / F.count("*")
                    * 10000
                )
                / 10000
            ).alias("mean_sim"),
            F.min("sim").alias("worst_sim"),
        )
        .orderBy("cl")
    )


# ---------------------------------------------------------------------------
# v14 — hard-negative mining (contrastive-training prep): for each query
# vector, the top-5 most-similar vectors carrying a DIFFERENT label — the
# embeddings most likely to confuse a contrastive or retrieval model, which
# is exactly what in-batch-negative pipelines mine for.  Same asymmetric
# shape as v01: the bounded query set broadcasts, the corpus side streams
# through once, the label inequality rides the join condition so no
# same-label pair is ever scored.  At 100 TB the query set stays bounded
# (negatives are mined per training batch) and the scan parallelizes over
# the corpus; for unbounded query sets the v04 bucketed-ANN path applies.
# ---------------------------------------------------------------------------
@register(
    "v14_hard_negatives",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings)
SELECT qid, q_label, vid, n_label, sim, rank FROM (
  SELECT a.vec_id AS qid, a.label AS q_label,
         b.vec_id AS vid, b.label AS n_label, {_COS_SQL} AS sim,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
  FROM (SELECT * FROM v WHERE vec_id < 8) a
  JOIN v b ON b.label <> a.label
) t
WHERE rank <= 5
ORDER BY qid, rank
""",
)
def v14_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _nz(table(spark, sf_dir, "embeddings"))
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qvec"),
    )
    cands = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        F.col("vec_id").alias("vid"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("cvec"),
    )
    sims = (
        cands.join(
            F.broadcast(queries), F.col("n_label") != F.col("q_label")
        )
        .select(
            "qid",
            "q_label",
            "vid",
            "n_label",
            cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "q_label", "vid", "n_label", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v11 — Matryoshka-style truncated-dimension ANN: the coarse scan ranks by
# cosine over only the FIRST 16 embedding dimensions (MRL-trained models
# front-load information, so a prefix is a usable cheap proxy), keeps the
# top-40 per query, then re-ranks exactly on the full vectors for the
# final top-10.  The dimension-reduction counterpart of v08's precision
# reduction (int8): the coarse stage reads 1/4 of the floats per vector
# and stays a pure fold; full vectors are equi-joined in for candidates
# only.  Composes with the v04 IVF buckets the same way.
# ---------------------------------------------------------------------------
_MRL_DIMS = 16
_MRL_C = 40

_PSIM_SQL = (
    "list_dot_product(a.pe, b.pe) / "
    "(sqrt(list_dot_product(a.pe, a.pe)) * sqrt(list_dot_product(b.pe, b.pe)))"
)


@register(
    "v11_matryoshka_ann",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
p AS (SELECT vec_id, e, list_slice(e, 1, {_MRL_DIMS}) AS pe FROM v),
coarse AS (
  SELECT qid, vid, psim FROM (
    SELECT qid, vid, psim,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY psim DESC, vid) AS crank
    FROM (
      SELECT a.vec_id AS qid, b.vec_id AS vid, {_PSIM_SQL} AS psim
      FROM (SELECT * FROM p WHERE vec_id < 5) a
      JOIN p b ON a.vec_id <> b.vec_id
    ) raw
  ) ranked WHERE crank <= {_MRL_C}
),
rerank AS (
  SELECT c.qid, c.vid, c.psim,
         list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e)) *
         sqrt(list_dot_product(vb.e, vb.e))) AS sim
  FROM coarse c
  JOIN v va ON va.vec_id = c.qid
  JOIN v vb ON vb.vec_id = c.vid
)
SELECT qid, vid, psim, sim, rank FROM (
  SELECT qid, vid, psim, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rank
  FROM rerank
) t WHERE rank <= 10
ORDER BY qid, rank
""",
)
def v11_matryoshka_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        "vec_id", "embedding"
    )
    p = e.select(
        "vec_id", F.slice(as_double(F.col("embedding")), 1, _MRL_DIMS).alias("pe")
    )
    queries = p.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("pe").alias("qp")
    )
    coarse_w = Window.partitionBy("qid").orderBy(F.desc("psim"), "vid")
    coarse = (
        p.select(F.col("vec_id").alias("vid"), F.col("pe").alias("cp"))
        .crossJoin(F.broadcast(queries))
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid", cosine(F.col("qp"), F.col("cp")).alias("psim"))
        .withColumn("crank", F.row_number().over(coarse_w))
        .filter(F.col("crank") <= _MRL_C)
        .drop("crank")
    )
    va = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    vb = e.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec"))
    rerank_w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    return (
        coarse.join(va, "qid")
        .join(vb, "vid")
        .withColumn(
            "sim", cosine(as_double(F.col("qvec")), as_double(F.col("cvec")))
        )
        .withColumn("rank", F.row_number().over(rerank_w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid", "psim", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v12 — retrieval-quality evaluation: nDCG@10 of the exact cosine ranking
# against label-match relevance (a candidate is "relevant" to a query if
# it shares the query's label).  The position discounts 1/log2(i+1) are
# precomputed INTEGER milli-weights (10 literals shared by both engines),
# so DCG, ideal DCG (prefix sums, capped at the query's relevant count),
# and the final basis-point ratio are all exact integer arithmetic —
# hash-stable where naive float nDCG would not be.  Complements v07
# (recall@k) with the graded-ranking metric an embedding-model eval needs.
# Scale shape: identical to v01 (broadcast query set over the corpus, one
# per-query top-k), plus a corpus-wide per-query relevant count.
# ---------------------------------------------------------------------------
_NDCG_W = [1000000, 630929, 500000, 430676, 386852, 356207, 333333, 315464, 301029, 289064]
_NDCG_P = [1000000, 1630929, 2130929, 2561605, 2948457, 3304664, 3637997, 3953461, 4254490, 4543554]


@register(
    "v12_ndcg_eval",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
scored AS (
  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS vid, b.label AS clabel,
         {_COS_SQL} AS sim
  FROM (SELECT * FROM v WHERE vec_id < 5) a
  JOIN v b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qid, qlabel, clabel,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rnk
  FROM scored
),
dcg AS (
  SELECT qid,
         CAST(SUM(CASE WHEN clabel = qlabel
                       THEN ({_NDCG_W})[CAST(rnk AS INTEGER)] ELSE 0 END)
              AS BIGINT) AS dcg_milli
  FROM ranked WHERE rnk <= 10 GROUP BY qid
),
rtot AS (
  SELECT qid, CAST(COUNT(*) FILTER (WHERE clabel = qlabel) AS BIGINT) AS n_rel
  FROM scored GROUP BY qid
)
SELECT r.qid, r.n_rel, d.dcg_milli,
       CASE WHEN r.n_rel > 0
            THEN ({_NDCG_P})[CAST(LEAST(r.n_rel, 10) AS INTEGER)]
            ELSE 0 END AS idcg_milli,
       CASE WHEN r.n_rel > 0
            THEN CAST((d.dcg_milli * 10000)
                 // ({_NDCG_P})[CAST(LEAST(r.n_rel, 10) AS INTEGER)] AS BIGINT)
            ELSE 0 END AS ndcg_bp
FROM rtot r JOIN dcg d ON d.qid = r.qid
ORDER BY r.qid
""",
)
def v12_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        "vec_id", "label", "embedding"
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
    )
    scored = (
        e.select(
            F.col("vec_id").alias("vid"),
            F.col("label").alias("clabel"),
            F.col("embedding").alias("cvec"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "qlabel",
            "vid",
            "clabel",
            cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    weights = F.lit(_NDCG_W)
    dcg = (
        ranked.filter(F.col("rnk") <= 10)
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(
                    F.col("clabel") == F.col("qlabel"),
                    F.element_at(weights, F.col("rnk").cast("int")),
                ).otherwise(0)
            ).cast("long").alias("dcg_milli")
        )
    )
    rtot = scored.groupBy("qid").agg(
        F.count(F.when(F.col("clabel") == F.col("qlabel"), 1))
        .cast("long")
        .alias("n_rel")
    )
    prefix = F.lit(_NDCG_P)
    idcg = F.when(
        F.col("n_rel") > 0,
        F.element_at(prefix, F.least(F.col("n_rel"), F.lit(10)).cast("int")),
    ).otherwise(0)
    return (
        rtot.join(dcg, "qid")
        .withColumn("idcg_milli", idcg.cast("long"))
        .withColumn(
            "ndcg_bp",
            F.when(
                F.col("n_rel") > 0,
                F.expr("CAST((dcg_milli * 10000) DIV idcg_milli AS BIGINT)"),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .select("qid", "n_rel", "dcg_milli", "idcg_milli", "ndcg_bp")
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# v13 — FILTERED ANN (the vector-DB "filtered search" problem): top-10
# neighbors among only the candidates satisfying a metadata predicate
# (label % 3 = 0, ~1/3 of the corpus).  Shape decision this query exists to
# pin: the filter applies BEFORE the bucket probe (pre-filtering), so the
# top-k is exact within the filtered subset — post-filtering (top-k first,
# then discard) silently returns < k or worse neighbors when the predicate
# is selective.  Multi-probe (nprobe=5, v06's recall fix) compensates the
# thinner buckets.  Plan: one equi-join of a broadcast 25-row probe side
# against the filtered corpus — the filter pushes into the parquet scan.
# ---------------------------------------------------------------------------
@register(
    "v13_filtered_ann",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e, {_BUCKET_SQL} AS bucket FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
q AS (SELECT vec_id, e, xor(bucket, m.flip) AS probe
      FROM v, (SELECT unnest([0, 1, 2, 4, 8]) AS flip) m
      WHERE vec_id < 5)
SELECT qid, vid, sim, rank FROM (
  SELECT a.vec_id AS qid, b.vec_id AS vid, {_COS_SQL} AS sim,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
  FROM q a JOIN v b ON a.probe = b.bucket AND a.vec_id <> b.vec_id
  WHERE b.label % 3 = 0
) t
WHERE rank <= 10
ORDER BY qid, rank
""",
)
def v13_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    def bucket(vec):
        out = F.lit(0)
        for j in range(4):
            out = out + F.when(
                F.element_at(vec, j + 1).cast("double") > 0, F.lit(2**j)
            ).otherwise(F.lit(0))
        return out

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).withColumn(
        "bucket", bucket(F.col("embedding"))
    )
    probes = (
        e.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.explode(
                F.array(*[F.expr(f"bucket ^ {flip}") for flip in (0, 1, 2, 4, 8)])
            ).alias("probe"),
        )
    )
    # metadata predicate applied BEFORE the probe join: pushes to the scan
    candidates = e.filter(F.col("label") % 3 == 0).select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("cvec"),
        F.col("bucket").alias("cbucket"),
    )
    joined = candidates.join(
        F.broadcast(probes),
        (F.col("probe") == F.col("cbucket")) & (F.col("qid") != F.col("vid")),
    )
    sims = joined.select(
        "qid",
        "vid",
        cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))).alias("sim"),
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
# v15 — label-diversified top-k (retrieval diversification): rank candidates
# per query by cosine, keep only the BEST candidate per label, then the
# global top-5 of those survivors — the "at most one result per
# source/domain/cluster" constraint dedup-aware RAG retrieval applies so one
# dominant domain can't fill the whole context window.  Unlike greedy MMR
# (iterative, order-dependent) this diversification is a pure composition
# of two window ranks, so it is exactly SQL-expressible and oracle-checked.
# Same asymmetric scale shape as v01: bounded query set broadcasts, corpus
# streams once; both windows partition by (qid[, label]) — never global.
# ---------------------------------------------------------------------------
@register(
    "v15_label_diversified_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid, b.label AS label, {_COS_SQL} AS sim,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id, b.label
                            ORDER BY {_COS_SQL} DESC, b.vec_id) AS lbl_rank
  FROM (SELECT * FROM v WHERE vec_id < 5) a
  JOIN v b ON a.vec_id <> b.vec_id
)
SELECT qid, vid, label, sim, rank FROM (
  SELECT qid, vid, label, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rank
  FROM scored WHERE lbl_rank = 1
) t
WHERE rank <= 5
ORDER BY qid, rank
""",
)
def v15_label_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _nz(table(spark, sf_dir, "embeddings"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cands = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        F.col("vec_id").alias("vid"),
        F.col("label").alias("label"),
        F.col("embedding").alias("cvec"),
    )
    scored = (
        cands.join(F.broadcast(queries), F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            "label",
            cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))).alias("sim"),
        )
    )
    w_lbl = Window.partitionBy("qid", "label").orderBy(F.desc("sim"), "vid")
    w_all = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    return (
        scored.withColumn("lbl_rank", F.row_number().over(w_lbl))
        .filter(F.col("lbl_rank") == 1)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= 5)
        .select("qid", "vid", "label", "sim", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v16 — approximate k-NN GRAPH construction (the seed structure for
# graph-based ANN: NN-descent / HNSW layer-0 start): for EVERY vector,
# its top-3 most-similar neighbors among hyperplane-LSH bucket mates.
# Reuses v02's seeded 16-bit signature, banded 4x4 (16 buckets per band
# instead of v02's 4 — a graph build trades recall for candidate volume,
# the d14 band-tuning tradeoff applied; an NN-descent pass would recover
# missed edges) — both engines replicate
# the hyperplanes exactly, so the approximate graph is bit-identical and
# oracle-checkable (the v02/d06 pattern).  Nodes whose buckets surface
# fewer than 3 mates keep fewer edges — the documented LSH approximation
# an NN-descent refinement pass would iterate on.
#
# Scale shape: band explode is O(N * bands); candidate generation is the
# band equi-join (never all-pairs — plan-audited like v02); per-node top-3
# is a (src)-partitioned window over candidates only.  The graph build is
# the corpus-side analog of v04's query-side probe: every stage shuffles
# on ids or band keys, nothing global.
# ---------------------------------------------------------------------------
_V16_N_BANDS, _V16_BAND_BITS = 4, 4


def _v16_oracle() -> str:
    from delta_lake_spark.functions.similarity import hyperplanes

    sig = " + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(x) for x in p)}]) > 0"
        f" THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(hyperplanes(_EMB_DIM))
    )
    cos = (
        "list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e)) * "
        "sqrt(list_dot_product(vb.e, vb.e)))"
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
s AS (SELECT vec_id, ({sig}) AS sig FROM v),
bands AS (SELECT vec_id, r.range AS band,
                 (sig >> (r.range * {_V16_BAND_BITS})) & {(1 << _V16_BAND_BITS) - 1} AS key
          FROM s, range({_V16_N_BANDS}) r),
cand AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS nbr
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.vec_id <> b.vec_id),
scored AS (
  SELECT c.src, c.nbr, {cos} AS sim,
         ROW_NUMBER() OVER (PARTITION BY c.src ORDER BY {cos} DESC, c.nbr) AS rank
  FROM cand c
  JOIN v va ON va.vec_id = c.src
  JOIN v vb ON vb.vec_id = c.nbr
)
SELECT src, nbr, sim, rank FROM scored WHERE rank <= 3
ORDER BY src, rank
"""


@register("v16_knn_graph", oracle=_v16_oracle())
def v16_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from delta_lake_spark.functions.similarity import hyperplane_signature

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        "vec_id", "embedding"
    )
    sig = e.select(
        "vec_id", hyperplane_signature("embedding", dim=_EMB_DIM).alias("sig")
    )
    mask = (1 << _V16_BAND_BITS) - 1
    # persisted: the band frame feeds BOTH self-join sides — without it the
    # 16x64-term signature folds run twice (the d06/d21 persist convention)
    bands = sig.persist().select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * _V16_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(_V16_N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("nbr"))
        .distinct()
    )
    from delta_lake_spark.functions.similarity import dot, l2_norm

    # per-vector norms computed once (each row's norm serves every pair);
    # dot/(ns*nn) is the identical IEEE expression tree to dot/(sqrt*sqrt)
    ed = e.select("vec_id", as_double(F.col("embedding")).alias("ed"))
    va = ed.select(
        F.col("vec_id").alias("src"),
        F.col("ed").alias("es"),
        l2_norm(F.col("ed")).alias("ns"),
    )
    vb = ed.select(
        F.col("vec_id").alias("nbr"),
        F.col("ed").alias("en"),
        l2_norm(F.col("ed")).alias("nn"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), "nbr")
    return (
        cand.join(va, "src")
        .join(vb, "nbr")
        .withColumn("sim", dot(F.col("es"), F.col("en")) / (F.col("ns") * F.col("nn")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("src", "nbr", "sim", "rank")
        .orderBy("src", "rank")
    )


# ---------------------------------------------------------------------------
# v17 — EXACT-integer k-means (Lloyd) over the embedding corpus: k=8
# centroids seeded from the first 8 vectors, two assignment passes with one
# centroid update between them, everything in quantized integer micro-units
# so assignments, centroid updates, and inertia are bit-identical across
# engines and partitionings (float k-means is neither — summation order
# changes centroids).  Position vs v09: v09 is SPHERICAL k-means (cosine
# assignment, the text-embedding convention) whose cross-engine determinism
# comes from decimal-sum centroids rounded to 6 dp; v17 is EUCLIDEAN Lloyd
# whose determinism is stronger — every distance, centroid component, and
# the inertia objective are exact integers, which is what lets d21 implement
# SemDeDup's centroid-distance keep rule bit-exactly.  Seeding also differs:
# v09 seeds from hyperplane structure, v17 from the first k data points
# (the classic Forgy choice).
#
# Scale shape: centroids are k x dim METADATA (8x64 here) — each assignment
# pass is an embarrassingly-parallel map with the centroid table inlined as
# literals (zero joins, zero shuffles), exactly how Spark MLlib broadcasts
# centers; the update is ONE (cid, dim)-keyed partial-aggregated shuffle of
# bounded k*dim output, collected driver-side (512 rows — the same bounded
# collect every k-means implementation does between iterations).  The
# DuckDB oracle unrolls both passes as chained CTEs (q73's bounded-iteration
# pattern); centroid division truncates toward zero in both engines (probed:
# DuckDB `//` and Spark `div` both give -7/2 = -3).
# ---------------------------------------------------------------------------
_V17_K = 8
_V17_SCALE = 1_000_000


def _v17_ctes() -> str:
    """The shared unrolled Lloyd chain (quantize -> seed -> assign ->
    update -> assign); v17 aggregates it, d21 deduplicates within it."""
    return f"""v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(FLOOR(x * {_V17_SCALE}) AS BIGINT)) AS q
  FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings
),
vd AS (SELECT vec_id, r.range AS d, q[r.range + 1] AS x FROM v, range({_EMB_DIM}) r),
c0 AS (SELECT vec_id AS cid, d, x AS cx FROM vd WHERE vec_id < {_V17_K}),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vd.vec_id, c0.cid,
           ROW_NUMBER() OVER (PARTITION BY vd.vec_id
                              ORDER BY SUM((x - cx) * (x - cx)), c0.cid) AS rn
    FROM vd JOIN c0 USING (d)
    GROUP BY vd.vec_id, c0.cid
  ) WHERE rn = 1
),
u1 AS (
  SELECT cid, d, SUM(x) AS sx, COUNT(*) AS n
  FROM a1 JOIN vd USING (vec_id) GROUP BY cid, d
),
c1 AS (
  SELECT c0.cid, c0.d, COALESCE(u1.sx // u1.n, c0.cx) AS cx
  FROM c0 LEFT JOIN u1 ON u1.cid = c0.cid AND u1.d = c0.d
),
a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vd.vec_id, c1.cid, SUM((x - cx) * (x - cx)) AS dist,
           ROW_NUMBER() OVER (PARTITION BY vd.vec_id
                              ORDER BY SUM((x - cx) * (x - cx)), c1.cid) AS rn
    FROM vd JOIN c1 USING (d)
    GROUP BY vd.vec_id, c1.cid
  ) WHERE rn = 1
)"""


def _v17_oracle() -> str:
    return f"""
WITH {_v17_ctes()}
SELECT CAST(cid AS BIGINT)     AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(vec_id) AS BIGINT) AS member_id_sum,
       CAST(SUM(dist) AS BIGINT)   AS inertia
FROM a2 GROUP BY cid ORDER BY cluster_id
"""


def _quantized_vectors(spark: SparkSession, sf_dir: str):
    # session-memoized + persisted: v17's Lloyd rounds scan this 3x, and the
    # cached relation is shared across the whole exact-integer family (v17/
    # v18/v19/v20/v21/d21) within a session — the spherical_kmeans `v`
    # persist rationale, applied to the quantized projection.  The memo (vs
    # the previous bare .persist() + CacheManager plan-equality) also stops
    # each consumer re-registering an already-cached plan.
    from delta_lake_spark.ops.session_cache import session_cached

    def build():
        return _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
            "vec_id",
            F.transform(
                as_double(F.col("embedding")),
                lambda x: F.floor(x * F.lit(float(_V17_SCALE))).cast("long"),
            ).alias("q"),
        )

    return session_cached(spark, ("quantized_vectors", sf_dir, _V17_SCALE), build)


def _assign_to_centroids(vec: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """Map-side nearest-centroid assignment: centroids inlined as literals
    (k x dim metadata), argmin via array_min over (dist, cid) structs —
    exact integer comparison, lower cid wins ties."""
    choices = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("q"),
                        F.array(*[F.lit(int(c)) for c in cents[cid]]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(cid).alias("cid"),
            )
            for cid in sorted(cents)
        ]
    )
    best = F.array_min(choices)
    return vec.select(
        "vec_id", "q", best["cid"].alias("cid"), best["dist"].alias("dist")
    )


def _trunc_div(s: int, n: int) -> int:
    """Integer division truncating toward zero — the semantics BOTH engines
    use (DuckDB `//`, Spark `div`); Python's `//` floors, so spell it out."""
    q = abs(s) // n
    return -q if s < 0 else q


def _kmeans_final_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q, cid, dist) after seed -> assign -> update -> assign,
    session-memoized: the two driver-side collects (seed rows + Lloyd
    update) run once per session; v17 and d21 both consume the persisted
    assignment instead of re-running them."""
    from delta_lake_spark.ops.session_cache import session_cached

    def build() -> DataFrame:
        vec = _quantized_vectors(spark, sf_dir)
        # seed centroids: the first k vectors (k x dim metadata collect)
        c0_rows = vec.filter(F.col("vec_id") < _V17_K).collect()
        cents = {int(r["vec_id"]): list(r["q"]) for r in c0_rows}
        # one Lloyd update: (cid, dim)-keyed partial agg, k*dim rows collected
        a1 = _assign_to_centroids(vec, cents)
        upd = (
            a1.select("cid", F.posexplode("q").alias("d", "x"))
            .groupBy("cid", "d")
            .agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
            .collect()
        )
        new_cents = {cid: list(v) for cid, v in cents.items()}
        for r in upd:
            new_cents[int(r["cid"])][int(r["d"])] = _trunc_div(
                int(r["sx"]), int(r["n"])
            )
        return _assign_to_centroids(vec, new_cents)

    return session_cached(
        spark, ("kmeans_final_assignment", sf_dir, _V17_K, _V17_SCALE), build
    )


@register("v17_kmeans_exact", oracle=_v17_oracle())
def v17_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    a2 = _kmeans_final_assignment(spark, sf_dir)
    return (
        a2.groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("vec_id").cast("bigint").alias("member_id_sum"),
            F.sum("dist").cast("bigint").alias("inertia"),
        )
        .select(F.col("cid").cast("bigint").alias("cluster_id"), "n_members", "member_id_sum", "inertia")
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# d21 — SemDeDup with the PAPER'S keep rule (Abbas et al. 2023 §2: within a
# near-duplicate relation, keep the example with the LOWEST similarity to
# the cluster centroid — favoring diversity at the cluster edge).  d15
# already implements the cluster-then-dedup recipe with the simple
# lowest-id keep over v09's spherical clusters; d21 is the keep-rule-
# faithful variant, and it exists BECAUSE of v17: the paper's rule needs a
# centroid distance per member, and v17's exact-integer centroids make
# that distance an exact integer — so "which member is closer to the
# centroid" is bit-decidable across engines, where a float centroid would
# make the keep decision itself 1-ulp-flaky.  Per qualifying in-cluster
# pair (cosine > threshold), the member CLOSER to the centroid is dropped
# (ties: the higher id), mirroring the paper's farthest-kept semantics.
#
# Scale shape: assignment is the v17 map (zero shuffles); the
# within-cluster self-join is an equi-join on cid whose fan-out is
# SUM(cluster_size^2) — the SemDeDup contract is that k grows with the
# corpus to bound cluster sizes (k ~ N/target_size), which this plan
# inherits directly; cosine verification runs only on in-cluster pairs.
# No global pair surface exists anywhere.
# ---------------------------------------------------------------------------
_D21_TH = 0.4


def _d21_oracle() -> str:
    cos = (
        "list_dot_product(ea.e, eb.e) / (sqrt(list_dot_product(ea.e, ea.e)) * "
        "sqrt(list_dot_product(eb.e, eb.e)))"
    )
    return f"""
WITH {_v17_ctes()},
ve AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
dropped AS (
  SELECT DISTINCT CASE WHEN a.dist < b.dist THEN a.vec_id
                       WHEN b.dist < a.dist THEN b.vec_id
                       ELSE GREATEST(a.vec_id, b.vec_id) END AS vec_id
  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN ve ea ON ea.vec_id = a.vec_id
  JOIN ve eb ON eb.vec_id = b.vec_id
  WHERE {cos} > {_D21_TH}
)
SELECT v.vec_id, ve.label, CAST(v.cid AS BIGINT) AS cluster_id,
       CAST(v.dist AS BIGINT) AS centroid_dist
FROM a2 v JOIN ve ON ve.vec_id = v.vec_id
WHERE v.vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY v.vec_id
"""


@register("d21_semantic_dedup_survivors", oracle=_d21_oracle())
def d21_semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.similarity import dot, l2_norm

    assign = _kmeans_final_assignment(spark, sf_dir).select("vec_id", "cid", "dist")
    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    )
    # persist: BOTH self-join sides read this frame — without it the whole
    # k-means assignment chain (2 passes + the update collect) re-runs per
    # side.  Norms are precomputed per VECTOR (each row's norm serves every
    # pair it joins into); dot/(na*nb) is the identical IEEE expression tree
    # to the oracle's dot/(sqrt(aa)*sqrt(bb)).
    m = (
        assign.join(e, "vec_id")
        .select("vec_id", "label", "cid", "dist", "e", l2_norm(F.col("e")).alias("nrm"))
        .persist()
    )
    a = m.select(
        F.col("cid"),
        F.col("vec_id").alias("id_a"),
        F.col("dist").alias("dist_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("nrm_a"),
    )
    b = m.select(
        F.col("cid"),
        F.col("vec_id").alias("id_b"),
        F.col("dist").alias("dist_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nrm_b"),
    )
    # the paper's keep rule: the pair member closer to the centroid drops
    # (exact-integer distances make this decidable); ties drop the higher id
    loser = (
        F.when(F.col("dist_a") < F.col("dist_b"), F.col("id_a"))
        .when(F.col("dist_b") < F.col("dist_a"), F.col("id_b"))
        .otherwise(F.greatest("id_a", "id_b"))
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            dot(F.col("ea"), F.col("eb")) / (F.col("nrm_a") * F.col("nrm_b"))
            > _D21_TH
        )
        .select(loser.alias("vec_id"))
        .distinct()
    )
    return (
        m.join(dropped, "vec_id", "left_anti")
        .select(
            "vec_id",
            "label",
            F.col("cid").cast("bigint").alias("cluster_id"),
            F.col("dist").cast("bigint").alias("centroid_dist"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# v18 — product-quantization ANN (the FAISS PQ/ADC technique): split the 64
# dims into 8 subspaces of 8, give each subspace an 8-entry codebook (seeded
# from the first 8 vectors' subvectors — static PQ; v17 shows the trained
# path), compress every vector to 8 one-byte codes, and answer queries with
# ASYMMETRIC DISTANCE COMPUTATION — the query precomputes a per-subspace
# lookup table of distances to every codebook entry, and each candidate's
# distance is just 8 table lookups summed.  The compression complement of
# v04's IVF bucketing, v08's int8 scalar quantization, and v11's dimension
# truncation; everything in v17's exact integer micro-units so codes, LUTs,
# and ADC distances are bit-identical across engines.
#
# Scale shape: encoding is a zero-shuffle map (codebook = k x dim literals);
# the query side broadcasts a 5-row LUT frame (n_queries x 8 x 8 integers);
# candidates stream once through a broadcast join computing 8 array lookups
# per pair — the corpus is never joined to itself and never re-shuffled.
# At 100 TB the codes table is ~64x smaller than the raw vectors, which is
# the reason PQ exists.
# ---------------------------------------------------------------------------
_PQ_SUBS = 8  # subspaces
_PQ_SUBDIM = _EMB_DIM // _PQ_SUBS
_PQ_K = 8  # codes per subspace
_PQ_NQ = 5  # query vectors


def _pq_ctes() -> str:
    """Shared DuckDB CTE prefix: quantize -> codebook -> codes -> query LUTs
    -> ADC distances (used by v18's top-k and v19's shortlist+rerank)."""
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(FLOOR(x * {_V17_SCALE}) AS BIGINT)) AS q
  FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings
),
vd AS (SELECT vec_id, r.range AS d, q[r.range + 1] AS x FROM v, range({_EMB_DIM}) r),
cb AS (SELECT vec_id AS c, d, x AS cx FROM vd WHERE vec_id < {_PQ_K}),
codes AS (
  SELECT vec_id, s, c FROM (
    SELECT vd.vec_id, vd.d // {_PQ_SUBDIM} AS s, cb.c,
           ROW_NUMBER() OVER (PARTITION BY vd.vec_id, vd.d // {_PQ_SUBDIM}
                              ORDER BY SUM((x - cx) * (x - cx)), cb.c) AS rn
    FROM vd JOIN cb USING (d)
    GROUP BY vd.vec_id, vd.d // {_PQ_SUBDIM}, cb.c
  ) WHERE rn = 1
),
lut AS (
  SELECT vd.vec_id AS qid, vd.d // {_PQ_SUBDIM} AS s, cb.c,
         SUM((x - cx) * (x - cx)) AS dist
  FROM vd JOIN cb USING (d)
  WHERE vd.vec_id < {_PQ_NQ}
  GROUP BY vd.vec_id, vd.d // {_PQ_SUBDIM}, cb.c
),
adc AS (
  SELECT lut.qid, codes.vec_id AS vid, SUM(lut.dist) AS adc_dist
  FROM codes JOIN lut ON lut.s = codes.s AND lut.c = codes.c
  WHERE codes.vec_id <> lut.qid
  GROUP BY lut.qid, codes.vec_id
)
"""


def _v18_oracle() -> str:
    return (
        _pq_ctes()
        + """
SELECT qid, vid, CAST(adc_dist AS BIGINT) AS adc_dist, rank FROM (
  SELECT qid, vid, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS rank
  FROM adc
) t WHERE rank <= 10
ORDER BY qid, rank
"""
    )


def _pq_adc(spark: SparkSession, sf_dir: str, ivf: bool = False):
    """Quantized vectors + the PQ asymmetric-distance frame (qid, vid,
    adc_dist) shared by v18 (top-k), v19 (shortlist + exact rerank), and —
    with ``ivf=True`` — v21 (IVF-PQ: ADC computed only within the query's
    coarse bucket, so each query scans one inverted list instead of the
    whole code table)."""
    vec = _quantized_vectors(spark, sf_dir)
    cb_rows = vec.filter(F.col("vec_id") < _PQ_K).collect()
    cb = {int(r["vec_id"]): list(r["q"]) for r in cb_rows}

    # The codebook rides as ONE literal nested array CB[s][c][j] and the
    # row's subvectors as qs[s][j]; codes/LUT are nested higher-order
    # transforms over them.  A flat expression formulation (512 inlined
    # element_at terms per projection) overflows whole-stage codegen's
    # method limit and falls back to interpreted eval — measured 5x slower
    # than this HOF form at sf0.1.
    cb_col = F.array(
        *[
            F.array(
                *[
                    F.array(
                        *[
                            F.lit(int(cb[c][s * _PQ_SUBDIM + j]))
                            for j in range(_PQ_SUBDIM)
                        ]
                    )
                    for c in range(_PQ_K)
                ]
            )
            for s in range(_PQ_SUBS)
        ]
    )
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(_PQ_SUBS - 1)),
        lambda s: F.slice(F.col("q"), (s * _PQ_SUBDIM + 1).cast("int"), _PQ_SUBDIM),
    )
    base = vec.withColumn("qs", subs).withColumn("cbl", cb_col)

    def sqd(qsub, cbsub):
        return F.aggregate(
            F.zip_with(qsub, cbsub, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def per_subspace(inner):
        return F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_SUBS - 1)),
            lambda s: inner(
                F.element_at(F.col("qs"), (s + 1).cast("int")),
                F.element_at(F.col("cbl"), (s + 1).cast("int")),
            ),
        )

    codes_col = per_subspace(
        lambda qsub, cbs: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_K - 1)),
                lambda c: F.struct(
                    sqd(qsub, F.element_at(cbs, (c + 1).cast("int"))).alias("dist"),
                    c.cast("int").alias("c"),
                ),
            )
        )["c"]
    )
    lut_col = per_subspace(
        lambda qsub, cbs: F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_K - 1)),
            lambda c: sqd(qsub, F.element_at(cbs, (c + 1).cast("int"))),
        )
    )
    # IVF coarse bucket on the QUANTIZED integers (sign of q[1..4]):
    # integer comparisons, so bucket membership is bit-decidable in both
    # engines (doubles in [0, 1/scale) floor to 0 and land deterministically)
    bucket_col = sum(
        (
            F.when(F.element_at(F.col("q"), j + 1) > 0, F.lit(2**j)).otherwise(
                F.lit(0)
            )
            for j in range(4)
        ),
        F.lit(0),
    )
    cand = base.select(
        F.col("vec_id").alias("vid"),
        codes_col.alias("codes"),
        bucket_col.alias("cbucket"),
    )
    qdf = base.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("qid"),
        lut_col.alias("lut"),
        bucket_col.alias("qbucket"),
    )
    join_cond = (
        (F.col("cbucket") == F.col("qbucket")) & (F.col("vid") != F.col("qid"))
        if ivf
        else (F.col("vid") != F.col("qid"))
    )
    adc = (
        cand.join(F.broadcast(qdf), join_cond)
        .select(
            "qid",
            "vid",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("lut"),
                    lambda c, l: F.element_at(l, c + 1),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    return vec, adc


@register("v18_pq_ann", oracle=_v18_oracle())
def v18_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _, adc = _pq_adc(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy("adc_dist", "vid")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid", "adc_dist", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v19 — PQ shortlist + EXACT rerank: the two-stage serving pattern FAISS
# deploys in production (coarse ADC recall, exact precision).  The PQ ADC
# stage (v18's machinery) nominates a 50-candidate shortlist per query —
# cheap, compressed-domain, but lossy — and the rerank stage recomputes
# TRUE squared distances only for shortlisted pairs, fixing every ordering
# mistake quantization introduced inside the shortlist.  All exact integer
# micro-units, so shortlist membership AND the reranked order are
# bit-identical across engines.
#
# Scale shape: stage 1 is v18's broadcast-LUT scan (corpus streams once);
# stage 2 touches only n_queries x 50 pairs — the bounded query-vector
# frame broadcasts, and the full-precision vectors are fetched by ONE
# vid equi-join (at 100 TB: the point lookups against the uncompressed
# store that make rerank affordable).  No window over the corpus: ranks
# partition by qid, a bounded key.
# ---------------------------------------------------------------------------
_PQ_SHORTLIST = 50


def _v19_oracle() -> str:
    return (
        _pq_ctes()
        + f"""
, short AS (
  SELECT qid, vid FROM (
    SELECT qid, vid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS arank
    FROM adc
  ) t WHERE arank <= {_PQ_SHORTLIST}
),
exact AS (
  SELECT s.qid, s.vid, SUM((a.x - b.x) * (a.x - b.x)) AS exact_dist
  FROM short s
  JOIN vd a ON a.vec_id = s.qid
  JOIN vd b ON b.vec_id = s.vid AND b.d = a.d
  GROUP BY s.qid, s.vid
)
SELECT qid, vid, CAST(exact_dist AS BIGINT) AS exact_dist, rank FROM (
  SELECT qid, vid, exact_dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY exact_dist, vid) AS rank
  FROM exact
) t WHERE rank <= 10
ORDER BY qid, rank
"""
    )


@register("v19_pq_shortlist_rerank", oracle=_v19_oracle())
def v19_pq_shortlist_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    vec, adc = _pq_adc(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy("adc_dist", "vid")
    short = (
        adc.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= _PQ_SHORTLIST)
        .select("qid", "vid")
    )
    qvecs = vec.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    cand = vec.select(F.col("vec_id").alias("vid"), F.col("q").alias("cq"))
    exact = (
        short.join(F.broadcast(qvecs), "qid")
        .join(cand, "vid")
        .select(
            "qid",
            "vid",
            F.aggregate(
                F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("exact_dist"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy("exact_dist", "vid")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid", "exact_dist", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v21 — IVF-PQ ANN (the full FAISS IVFPQ index shape): the coarse IVF
# quantizer (v04's deterministic sign buckets, here on the exact-integer
# quantized vectors) partitions the code table into inverted lists, and
# the PQ/ADC machinery (v18) scores ONLY the query's own list (nprobe=1).
# This is the composition production vector stores actually deploy — the
# bucket bounds the scan, the codes bound the bytes — completing the
# family: v04 IVF alone, v18 PQ alone, v19 PQ+exact-rerank, v21 IVF+PQ.
# Recall vs v18 is the standard nprobe=1 trade, measurable with v07's
# methodology.
#
# Scale shape: encoding stays a zero-shuffle map; the query side is a
# 5-row broadcast carrying (LUT, bucket); candidates stream once through
# a broadcast join whose bucket equality prunes ~15/16 of pairs BEFORE
# the 8-lookup ADC sum; ranks partition by qid.  At 100 TB the inverted
# lists would be bucket-partitioned storage (VectorIndex's layout) and
# nprobe=1 reads one partition per query.
# ---------------------------------------------------------------------------
def _v21_oracle() -> str:
    bucket = (
        "(CASE WHEN q[1] > 0 THEN 1 ELSE 0 END + CASE WHEN q[2] > 0 THEN 2 ELSE 0 END"
        " + CASE WHEN q[3] > 0 THEN 4 ELSE 0 END + CASE WHEN q[4] > 0 THEN 8 ELSE 0 END)"
    )
    return (
        _pq_ctes()
        + f"""
, bk AS (SELECT vec_id, {bucket} AS bucket FROM v),
adcb AS (
  SELECT adc.qid, adc.vid, adc.adc_dist
  FROM adc
  JOIN bk bq ON bq.vec_id = adc.qid
  JOIN bk bc ON bc.vec_id = adc.vid AND bc.bucket = bq.bucket
)
SELECT qid, vid, CAST(adc_dist AS BIGINT) AS adc_dist, rank FROM (
  SELECT qid, vid, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS rank
  FROM adcb
) t WHERE rank <= 10
ORDER BY qid, rank
"""
    )


@register("v21_ivfpq_ann", oracle=_v21_oracle())
def v21_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _, adc = _pq_adc(spark, sf_dir, ivf=True)
    w = Window.partitionBy("qid").orderBy("adc_dist", "vid")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid", "adc_dist", "rank")
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# v20 — RANGE search (FAISS range_search): every corpus vector within a
# fixed exact-integer squared distance of each query — the "all matches
# above threshold" retrieval mode top-k cannot express (dedup-threshold
# lookups, radius joins, recall-oriented eval sets).  Distances in v17's
# micro-unit integers, so membership is bit-decidable across engines.
#
# Scale shape: the bounded query-vector set broadcasts; the corpus streams
# once through the distance filter (no shuffle at all — plan-asserted).
# The LSH/IVF bucketed variants (v02/v04) are the recall-traded scale path;
# this is the exact one and it is still linear, not quadratic.
# ---------------------------------------------------------------------------
_V20_RADIUS = 1_450_000_000_000  # ~1.2 in cosine-space at micro-unit scale
_V20_NQ = 5


def _v20_oracle() -> str:
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(FLOOR(x * {_V17_SCALE}) AS BIGINT)) AS q
  FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings
),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
         list_sum(list_transform(range({_EMB_DIM}),
                  i -> (a.q[i+1] - b.q[i+1]) * (a.q[i+1] - b.q[i+1]))) AS dist
  FROM v a, v b
  WHERE a.vec_id < {_V20_NQ} AND b.vec_id <> a.vec_id
)
SELECT qid, vid, CAST(dist AS BIGINT) AS dist
FROM pairs WHERE dist <= {_V20_RADIUS}
ORDER BY qid, dist, vid
"""


@register("v20_range_search", oracle=_v20_oracle())
def v20_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    vec = _quantized_vectors(spark, sf_dir)
    # the bounded query side comes from a plain scan (no input-split
    # repartition — it broadcasts whole anyway)
    queries = _nz(table(spark, sf_dir, "embeddings")).filter(
        F.col("vec_id") < _V20_NQ
    ).select(
        F.col("vec_id").alias("qid"),
        F.transform(
            as_double(F.col("embedding")),
            lambda x: F.floor(x * F.lit(float(_V17_SCALE))).cast("long"),
        ).alias("qq"),
    )
    cand = vec.select(F.col("vec_id").alias("vid"), F.col("q").alias("cq"))
    dist = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(F.broadcast(queries), F.col("vid") != F.col("qid"))
        .select("qid", "vid", dist.alias("dist"))
        .filter(F.col("dist") <= _V20_RADIUS)
        .orderBy("qid", "dist", "vid")
    )


# ---------------------------------------------------------------------------
# v22 — HYBRID retrieval via Reciprocal Rank Fusion (RRF, the standard
# lexical+vector fusion rule: score = sum over systems of 1/(60 + rank)):
# the lexical leg is t13's certified integer BM25 over the fixed 5-query
# set; the vector leg is v01's certified cosine top-k, with query_id k
# retrieving by example from embedding k-1 (query-by-example hybrid).  Both
# legs contribute their top-20; fusion happens in exact integers
# (1000000 div (60 + rank)) so the fused ranking is bit-identical across
# engines — floats only ever ORDER the vector leg, which the v01 family
# already certifies as bit-stable.
#
# Scale shape: each leg keeps its own certified plan (broadcast query set
# against the postings / candidate scan; per-query top-k windows over
# matched rows only); the fusion full-outer join runs over two
# (n_queries x k)-row frames — bounded, never corpus-sized.
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_LIST = 20


def _v22_oracle() -> str:
    from delta_lake_spark.queries.text import _BM25_CTES

    return f"""
WITH {_BM25_CTES},
lexr AS (
  SELECT query_id, doc_id, lrnk FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS lrnk
    FROM bm25) t
  WHERE lrnk <= {_RRF_LIST}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
vrank AS (
  SELECT query_id, doc_id, vrnk FROM (
    SELECT a.vec_id + 1 AS query_id, b.vec_id AS doc_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {_COS_SQL} DESC, b.vec_id) AS vrnk
    FROM (SELECT * FROM v WHERE vec_id < 5) a
    JOIN v b ON a.vec_id <> b.vec_id) t
  WHERE vrnk <= {_RRF_LIST}
),
fused AS (
  SELECT query_id, doc_id,
         CAST(COALESCE(lrnk, 0) AS BIGINT) AS lex_rank,
         CAST(COALESCE(vrnk, 0) AS BIGINT) AS vec_rank,
         CAST(COALESCE(1000000 // ({_RRF_K} + lrnk), 0)
              + COALESCE(1000000 // ({_RRF_K} + vrnk), 0) AS BIGINT)
           AS rrf_micro
  FROM lexr FULL JOIN vrank USING (query_id, doc_id)
)
SELECT query_id, doc_id, lex_rank, vec_rank, rrf_micro, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_micro DESC, doc_id) AS rank
  FROM fused) t
WHERE rank <= 10
ORDER BY query_id, rank
"""


@register("v22_rrf_hybrid_search", oracle=_v22_oracle())
def v22_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from delta_lake_spark.queries.text import bm25_scores

    lex_w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    lexr = (
        bm25_scores(spark, sf_dir)
        .withColumn("lrnk", F.row_number().over(lex_w))
        .filter(F.col("lrnk") <= _RRF_LIST)
        .select("query_id", "doc_id", "lrnk")
    )
    e = _nz(table(spark, sf_dir, "embeddings"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    candidates = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec")
    )
    vrank = cosine_topk(queries, candidates, k=_RRF_LIST).select(
        (F.col("qid") + 1).alias("query_id"),
        F.col("vid").alias("doc_id"),
        F.col("rank").alias("vrnk"),
    )
    fused = lexr.join(vrank, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.expr("CAST(COALESCE(lrnk, 0) AS BIGINT)").alias("lex_rank"),
        F.expr("CAST(COALESCE(vrnk, 0) AS BIGINT)").alias("vec_rank"),
        F.expr(
            f"CAST(COALESCE(1000000 div ({_RRF_K} + lrnk), 0)"
            f" + COALESCE(1000000 div ({_RRF_K} + vrnk), 0) AS BIGINT)"
        ).alias("rrf_micro"),
    )
    fuse_w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), "doc_id"
    )
    return (
        fused.withColumn("rank", F.row_number().over(fuse_w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf_micro", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# v23 — int8-SQ recall audit (completes the eval family: v07 measures the
# IVF buckets, v10 the k-means clusters, v23 the scalar quantizer): per
# query, recall@10 of (a) the RAW int8 integer-dot ranking — the pure
# quantization loss if codes alone served results — and (b) v08's
# production path (top-40 coarse candidates, exact re-rank) against the
# exact cosine top-10.  The gap between the two columns is exactly what
# the re-rank stage buys; the tuning loop any SQ deployment runs before
# picking its candidate budget.  Output is integer hit counts / recall bp
# (hash-stable; the float sims only ORDER the legs, v01-certified).
#
# Scale shape: composes the certified v01/v08 plans (broadcast query sets,
# corpus streamed once per leg); the audit joins are (queries x 10)-row
# frames.
# ---------------------------------------------------------------------------
@register(
    "v23_sq_recall",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) > 0 AND list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) <= 22500.0) embeddings),
n AS (SELECT vec_id, e, {_Q_SQL} AS q FROM v),
exact AS (
  SELECT qid, vid FROM (
    SELECT a.vec_id AS qid, b.vec_id AS vid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
    FROM (SELECT * FROM v WHERE vec_id < 5) a
    JOIN v b ON a.vec_id <> b.vec_id
  ) t WHERE rank <= 10
),
coarse AS (
  SELECT qid, vid, qscore,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qscore DESC, vid) AS crank
  FROM (
    SELECT a.vec_id AS qid, b.vec_id AS vid, {_QDOT_SQL} AS qscore
    FROM (SELECT * FROM n WHERE vec_id < 5) a
    JOIN n b ON a.vec_id <> b.vec_id
  ) raw
),
raw10 AS (SELECT qid, vid FROM coarse WHERE crank <= 10),
rerank AS (
  SELECT qid, vid FROM (
    SELECT c.qid, c.vid,
           ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY
             list_dot_product(va.e, vb.e) / (sqrt(list_dot_product(va.e, va.e)) *
             sqrt(list_dot_product(vb.e, vb.e))) DESC, c.vid) AS rank
    FROM (SELECT qid, vid FROM coarse WHERE crank <= {_QUANT_C}) c
    JOIN v va ON va.vec_id = c.qid
    JOIN v vb ON vb.vec_id = c.vid
  ) t WHERE rank <= 10
)
SELECT e.qid,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(r10.vid) AS BIGINT) AS hits_raw_codes,
       CAST(COUNT(rr.vid) AS BIGINT) AS hits_reranked,
       CAST((COUNT(r10.vid) * 10000) // COUNT(*) AS BIGINT) AS recall_raw_bp,
       CAST((COUNT(rr.vid) * 10000) // COUNT(*) AS BIGINT) AS recall_rerank_bp
FROM exact e
LEFT JOIN raw10 r10 ON r10.qid = e.qid AND r10.vid = e.vid
LEFT JOIN rerank rr ON rr.qid = e.qid AND rr.vid = e.vid
GROUP BY e.qid
ORDER BY e.qid
""",
)
def v23_sq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from delta_lake_spark.functions.similarity import qdot, quantize_int8

    e = _nz(table_parallel(spark, sf_dir, "embeddings", "vec_id")).select(
        "vec_id", "embedding"
    )
    # exact leg (v01 semantics)
    queries_f = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cands_f = e.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec")
    )
    exact = cosine_topk(queries_f, cands_f, k=10).select("qid", "vid")
    # quantized legs (v08 semantics)
    codes = e.select("vec_id", quantize_int8(F.col("embedding")).alias("q"))
    queries_q = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    coarse_w = Window.partitionBy("qid").orderBy(F.desc("qscore"), "vid")
    coarse = (
        codes.select(F.col("vec_id").alias("vid"), F.col("q").alias("cq"))
        .crossJoin(F.broadcast(queries_q))
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid", qdot(F.col("qq"), F.col("cq")).alias("qscore"))
        .withColumn("crank", F.row_number().over(coarse_w))
        .filter(F.col("crank") <= _QUANT_C)
    )
    raw10 = coarse.filter(F.col("crank") <= 10).select("qid", "vid")
    rerank_w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    rerank = (
        coarse.select("qid", "vid")
        .join(queries_f, "qid")
        .join(cands_f, "vid")
        .withColumn(
            "sim", cosine(as_double(F.col("qvec")), as_double(F.col("cvec")))
        )
        .withColumn("rank", F.row_number().over(rerank_w))
        .filter(F.col("rank") <= 10)
        .select("qid", "vid")
    )
    r10 = raw10.withColumnRenamed("vid", "rvid")
    rr = rerank.withColumnRenamed("vid", "xvid")
    return (
        exact.join(
            r10,
            (exact["qid"] == r10["qid"]) & (exact["vid"] == r10["rvid"]),
            "left",
        )
        .drop(r10["qid"])
        .join(
            rr,
            (exact["qid"] == rr["qid"]) & (exact["vid"] == rr["xvid"]),
            "left",
        )
        .drop(rr["qid"])
        .groupBy(exact["qid"])
        .agg(
            F.count("*").cast("bigint").alias("n_exact"),
            F.count("rvid").cast("bigint").alias("hits_raw_codes"),
            F.count("xvid").cast("bigint").alias("hits_reranked"),
            F.expr(
                "CAST((COUNT(rvid) * 10000) div COUNT(*) AS BIGINT)"
            ).alias("recall_raw_bp"),
            F.expr(
                "CAST((COUNT(xvid) * 10000) div COUNT(*) AS BIGINT)"
            ).alias("recall_rerank_bp"),
        )
        .orderBy("qid")
    )
