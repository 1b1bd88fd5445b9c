"""Deterministic-sampling queries over the documents table (training-data
pipeline surface; see functions/sampling.py for why content-addressed
sampling replaces df.sample at scale).

Both queries are pure per-row map + (for s02) one shuffle on the stratum
key — no collect, no driver-side randomness, reproducible on any cluster
layout, and exactly replicable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_spark.catalog import table, table_parallel
from delta_lake_spark.functions.sampling import (
    hash_bucket,
    hash_bucket_sql,
    keep_fraction,
    split_assign,
)
from delta_lake_spark.queries.registry import register

# Per-language keep rates in basis points of 10000 (stratified downsampling:
# keep half the English corpus, a fifth of everything else).
_RATES = {"en": 5000}
_DEFAULT_RATE = 2000

_RATE_SQL = (
    "CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END"
)
_SAMPLE_B = hash_bucket_sql("doc_id", "sample")
_SPLIT_B = hash_bucket_sql("doc_id", "split")


# ---------------------------------------------------------------------------
# s01 — stratified hash sampling + train/val/test split assignment.
# Each document's fate is a pure function of doc_id: stable across re-runs,
# partitionings, and engines.  Zero shuffles (orderBy is presentation-only).
# ---------------------------------------------------------------------------
@register(
    "s01_hash_split_sample",
    oracle=f"""
SELECT doc_id, lang,
       {_SAMPLE_B} AS sample_bucket,
       CASE WHEN {_SPLIT_B} < 9000 THEN 'train'
            WHEN {_SPLIT_B} < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents
WHERE {_SAMPLE_B} < {_RATE_SQL}
ORDER BY doc_id
""",
)
def s01_hash_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", _RATES["en"]).otherwise(_DEFAULT_RATE)
    return (
        d.filter(keep_fraction("doc_id", rate, "sample"))
        .select(
            "doc_id",
            "lang",
            hash_bucket("doc_id", "sample").alias("sample_bucket"),
            split_assign("doc_id").alias("split"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# s02 — fixed-size stratified sample: exactly k docs per (lang, source)
# stratum, chosen by hash order (deterministic "random" order with a doc_id
# tie-break).  One shuffle on the stratum key; per-stratum state is a
# row_number counter, so skewed strata cost sort-of-stratum, not memory.
# ---------------------------------------------------------------------------
@register(
    "s02_fixed_size_stratified",
    oracle=f"""
SELECT lang, source, doc_id, rnk FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY {_SAMPLE_B}, doc_id) AS rnk
  FROM documents
)
WHERE rnk <= 5
ORDER BY lang, source, rnk
""",
)
def s02_fixed_size_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        hash_bucket("doc_id", "sample"), "doc_id"
    )
    return (
        d.select("lang", "source", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
        .orderBy("lang", "source", "rnk")
    )


# ---------------------------------------------------------------------------
# s03 — source-temperature mixture: per-source keep rates (the "mixture
# weights" step of a training-data recipe — upsample rare/high-quality
# sources, downsample bulk ones).  Rates here derive from the source id
# (mod-4 temperature ladder 100%/50%/25%/12.5%); in production the rate
# column joins in from a weights table — identical plan shape (per-row
# hash test, zero shuffles before the reporting aggregate).
# ---------------------------------------------------------------------------
_S03_RATES = [10000, 5000, 2500, 1250]
_S03_RATE_SQL = (
    "CASE (CAST(substr(source, 4) AS INT) % 4) "
    + " ".join(f"WHEN {i} THEN {r}" for i, r in enumerate(_S03_RATES))
    + " END"
)


@register(
    "s03_source_mixture",
    oracle=f"""
SELECT source,
       {_S03_RATE_SQL} AS rate_bp,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {hash_bucket_sql("doc_id", "mix")} < {_S03_RATE_SQL}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
ORDER BY source
""",
)
def s03_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    rate = src_num % 4
    for i, r in enumerate(_S03_RATES):
        rate = F.when(src_num % 4 == i, r) if i == 0 else rate.when(src_num % 4 == i, r)
    kept = keep_fraction("doc_id", rate, "mix")
    return (
        d.groupBy("source")
        .agg(
            F.first(rate).alias("rate_bp"),
            F.count("*").alias("n_total"),
            F.sum(kept.cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# s04 — length-weighted (importance) sampling: each document's keep
# probability is proportional to its length, capped at 1 — the standard
# tokens-proportional downsampling used when mixing corpora so that long
# documents aren't under-represented per-token.  Per-ROW continuous weight
# (vs s03's per-stratum rates); still content-addressed: the decision is a
# pure function of (doc_id, weight), stable under repartition and identical
# across engines.  Zero shuffles — a scan with two cheap column expressions.
# ---------------------------------------------------------------------------
_S04_CAP_CHARS = 2000  # docs at/above this length are always kept


@register(
    "s04_length_weighted_sample",
    oracle=f"""
SELECT doc_id, n_chars,
       LEAST(n_chars * {10000 // _S04_CAP_CHARS}, 10000) AS weight_bp,
       {hash_bucket_sql('doc_id', 'wsample')} AS bucket
FROM documents
WHERE {hash_bucket_sql('doc_id', 'wsample')}
      < LEAST(n_chars * {10000 // _S04_CAP_CHARS}, 10000)
ORDER BY doc_id
""",
)
def s04_length_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    weight_bp = F.least(
        F.col("n_chars") * (10000 // _S04_CAP_CHARS), F.lit(10000)
    )
    return (
        d.filter(keep_fraction("doc_id", weight_bp, "wsample"))
        .select(
            "doc_id",
            "n_chars",
            weight_bp.alias("weight_bp"),
            hash_bucket("doc_id", "wsample").alias("bucket"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# s05 — per-source document cap (the "per-domain cap" of web-corpus
# pipelines: no single crawl domain / data source may dominate the mix).
# Within each source, keep the top-K documents by quality score with a
# content-addressed tie-break (md5 of normalized text, then doc_id) so the
# survivor set is stable under re-partitioning and re-crawls.  One windowed
# rank per source partition — a single shuffle on source, the same plan at
# 100 TB (hot sources are bounded by K, so no partition outgrows K rows
# post-filter).
# ---------------------------------------------------------------------------
_S05_CAP = 15


def _s05_oracle() -> str:
    from delta_lake_spark.queries.text import _NORM_SQL, _QUALITY_SQL

    return f"""
SELECT source, doc_id, quality, rk FROM (
  SELECT source, doc_id, {_QUALITY_SQL} AS quality,
         ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY {_QUALITY_SQL} DESC, md5({_NORM_SQL}), doc_id) AS rk
  FROM documents
) t
WHERE rk <= {_S05_CAP}
ORDER BY source, rk
"""


@register("s05_per_source_cap", oracle=_s05_oracle())
def s05_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.text import fingerprint, quality_score

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), fingerprint("text"), "doc_id"
    )
    return (
        d.select("source", "doc_id", quality_score("text").alias("quality"), "text")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _S05_CAP)
        .select("source", "doc_id", "quality", "rk")
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# s07 — deterministic training-shard assignment: a seeded GLOBAL shuffle of
# the corpus (order by md5 of the doc key — the content-addressed analog of
# "shuffle the dataset once before training") packed into fixed-size shards
# of 64 documents, yielding (doc_id, shard_id, pos) — the writer manifest a
# training-data exporter needs for reproducible shard files.
#
# Scale shape: the global order is materialized by ops.ranking.
# global_row_number (range repartition + per-partition offset prefix sums),
# NOT a single-partition window — the ranking runs P-way parallel and the
# pseudo-random md5 key makes the range partitions uniformly loaded, so the
# plan survives a 100x corpus.  (Presentation ORDER BY is driver-side-only.)
# ---------------------------------------------------------------------------
_SHARD_DOCS = 64


@register(
    "s07_training_shards",
    oracle=f"""
SELECT doc_id,
       CAST((rn - 1) // {_SHARD_DOCS} AS BIGINT) AS shard_id,
       CAST((rn - 1) % {_SHARD_DOCS} AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) t ORDER BY shard_id, pos
""",
)
def s07_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.ops.ranking import global_row_number

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))).alias(
            "_shuffle_key"
        ),
    )
    ranked = global_row_number(d, ["_shuffle_key", "doc_id"], out_col="rn")
    return (
        ranked.select(
            "doc_id",
            F.expr(f"(rn - 1) div {_SHARD_DOCS}").cast("long").alias("shard_id"),
            ((F.col("rn") - 1) % _SHARD_DOCS).cast("long").alias("pos"),
        )
        .orderBy("shard_id", "pos")
    )


# ---------------------------------------------------------------------------
# s08 — curriculum sampling by quality decile: score every document with
# t03's integer quality score, place it in a global decile (exact NTILE
# over (quality, doc_id) via the funnel-free distributed ranking — no
# single-partition stage), then keep a decile-dependent fraction
# (top decile 100% ... bottom 10%) chosen content-addressed, so the
# sample is reproducible and partition-independent.  This is the
# quality-curriculum mixing step of a training-data pipeline: later
# epochs upweight high-quality strata by re-running with a steeper
# schedule.  Output is the per-decile audit (kept/total/rate).
# ---------------------------------------------------------------------------
_S08_RATES_BP = [1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000, 10000]


def _s08_oracle() -> str:
    from delta_lake_spark.functions.sampling import hash_bucket_sql
    from delta_lake_spark.queries.text import _QUALITY_SQL

    keep_b = hash_bucket_sql("doc_id", "curr")
    rate_case = "CASE decile " + " ".join(
        f"WHEN {i + 1} THEN {bp}" for i, bp in enumerate(_S08_RATES_BP)
    ) + " END"
    return f"""
WITH scored AS (
  SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents
),
ranked AS (
  SELECT doc_id, quality,
         NTILE(10) OVER (ORDER BY quality, doc_id) AS decile
  FROM scored
),
flagged AS (
  SELECT decile, quality, ({keep_b} < {rate_case}) AS kept FROM ranked
)
SELECT CAST(decile AS BIGINT) AS decile,
       {rate_case.replace('decile', 'flagged.decile')} AS rate_bp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
       CAST(MIN(quality) AS BIGINT) AS min_quality,
       CAST(MAX(quality) AS BIGINT) AS max_quality
FROM flagged GROUP BY decile ORDER BY decile
"""


@register("s08_curriculum_sample", oracle=_s08_oracle())
def s08_curriculum_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.sampling import hash_bucket
    from delta_lake_spark.functions.text import quality_score
    from delta_lake_spark.ops.ranking import global_ntile

    d = table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", quality_score("text").alias("quality")
    )
    ranked = global_ntile(d, 10, ["quality", "doc_id"], out_col="decile")
    rate = F.element_at(F.lit(_S08_RATES_BP), F.col("decile").cast("int"))
    flagged = ranked.select(
        "decile",
        "quality",
        rate.alias("rate_bp"),
        (hash_bucket("doc_id", "curr") < rate).alias("kept"),
    )
    return (
        flagged.groupBy("decile", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
            F.min("quality").cast("long").alias("min_quality"),
            F.max("quality").cast("long").alias("max_quality"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("rate_bp").cast("long").alias("rate_bp"),
            "n_docs",
            "n_kept",
            "min_quality",
            "max_quality",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# s09 — leakage-safe train/val/test split: the split key is the document's
# exact-dup FINGERPRINT (md5 of normalized text), not its id, so every copy
# of a duplicated document provably lands in the same split — the standard
# guard against train/test contamination that per-doc hashing cannot give
# (a doc_id split scatters byte-identical copies across splits; the model
# then "generalizes" to its own training data).  One groupBy on fp for
# group sizes + one split-keyed agg; the fingerprint/split decision is pure
# per-row map, content-addressed, partition-count-independent (reuses
# s01's bucket idiom and t01's fingerprint).  straddling_groups is the
# invariant column: a group whose members see >1 split — 0 by construction,
# and the oracle recomputes it rather than trusting it.
# ---------------------------------------------------------------------------
_FP_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), "
    "'\\s+', ' ', 'g')))"
)
_FP_SPLIT_B = hash_bucket_sql("fp", "split")


@register(
    "s09_leakage_safe_split",
    oracle=f"""
WITH d AS (SELECT doc_id, {_FP_SQL} AS fp FROM documents),
g AS (SELECT fp, COUNT(*) AS gsz,
             COUNT(DISTINCT CASE WHEN {_FP_SPLIT_B} < 9000 THEN 'train'
                                 WHEN {_FP_SPLIT_B} < 9500 THEN 'val'
                                 ELSE 'test' END) AS n_splits
      FROM d GROUP BY fp),
j AS (SELECT d.doc_id, d.fp, g.gsz, g.n_splits,
             CASE WHEN {_FP_SPLIT_B} < 9000 THEN 'train'
                  WHEN {_FP_SPLIT_B} < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM d JOIN g USING (fp))
SELECT split,
       CAST(COUNT(*) AS BIGINT)                                  AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT)                        AS n_groups,
       CAST(SUM(CASE WHEN gsz > 1 THEN 1 ELSE 0 END) AS BIGINT)  AS n_dup_docs,
       CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                                 AS straddling_docs
FROM j GROUP BY split ORDER BY split
""",
)
def s09_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.text import fingerprint

    d = table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fp")
    )
    d = d.withColumn("split", split_assign("fp"))
    g = d.groupBy("fp").agg(
        F.count(F.lit(1)).alias("gsz"),
        F.countDistinct("split").alias("n_splits"),
    )
    return (
        d.join(g, "fp")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("fp").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("gsz") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("straddling_docs"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# s10 — weighted (probability-proportional-to-size) Poisson sample.
#
# The reference's sampling surface is uniform (deltalake.ipynb has no
# weighted variant); a training-data pipeline needs PPS sampling — pick
# documents with probability proportional to a weight (here n_chars, the
# token-mass proxy) so a token-budget sample covers the corpus mass, not the
# document count.
#
# Scale design: the classic exponential-keys scheme (Efraimidis-Spirakis,
# u^(1/w) top-k) needs a global TakeOrdered AND libm pow/ln, whose 1-ulp
# engine differences break cross-engine verification.  Poisson PPS instead:
# include a row iff  u48 * W < k * w * 2^48, where u48 is a 48-bit
# content-addressed uniform (md5, partitioning-independent — see
# functions/sampling.py), W = total weight, k = expected sample size.
# Inclusion probability = min(1, k*w/W) per row, no sort, no coordination —
# one scalar broadcast + an embarrassingly-parallel filter, the shape that
# survives 100 TB.  All arithmetic is EXACT integer math (decimal(38,0) in
# Spark, HUGEINT in DuckDB): bit-identical selection in both engines; the
# probability cap at 1 is automatic (u48 < 2^48 always).
# ---------------------------------------------------------------------------
_PPS_K = 200  # expected sample size
_PPS_U48 = "(('0x' || substr(md5('pps:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)"


@register(
    "s10_weighted_pps_sample",
    oracle=f"""
WITH tot AS (SELECT SUM(n_chars) AS w_total FROM documents)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight
FROM documents, tot
WHERE {_PPS_U48}::HUGEINT * w_total::HUGEINT
      < {_PPS_K}::HUGEINT * n_chars::HUGEINT * (1::HUGEINT << 48)
ORDER BY doc_id
""",
)
def s10_weighted_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # 48-bit content-addressed uniform, exact decimal (fits decimal(20,0))
    u48 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("pps:"), F.col("doc_id").cast("string"))), 1, 12),
            16,
            10,
        )
        .cast("decimal(20,0)")
    )
    # scalar total weight, broadcast via a 1-row cross join (no collect on a
    # hot path; the scalar agg is the same shape the oracle's subquery plans)
    tot = d.agg(F.sum("n_chars").cast("decimal(18,0)").alias("w_total"))
    two48 = F.lit(2**48).cast("decimal(18,0)")
    k = F.lit(_PPS_K).cast("decimal(18,0)")
    return (
        d.crossJoin(F.broadcast(tot))
        .filter(
            u48 * F.col("w_total")
            < k * F.col("n_chars").cast("decimal(18,0)") * two48
        )
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("weight"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# s11 — deterministic epoch shuffle (training-data loading order): every
# epoch the corpus is re-ordered by md5(seed || doc_id) and assigned an
# exact global position 1..N — the "seeded global shuffle" every trainer
# needs for reproducible runs and mid-epoch resume (position is the
# checkpoint cursor).  Spark has no scalable ROW_NUMBER() OVER (ORDER BY
# ...) — the naive window is a single-partition stage — so positions come
# from ops.ranking.global_row_number: range-partition by the shuffle key,
# per-partition row_number, plus broadcast partition offsets.  Changing
# the seed string reshuffles; the hash makes order independent of input
# partitioning (reshard-safe, like s01).
# ---------------------------------------------------------------------------
_S11_SEED = "epoch1:"


@register(
    "s11_epoch_shuffle",
    oracle=f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5('{_S11_SEED}' || CAST(doc_id AS VARCHAR)), doc_id)
       AS BIGINT) AS position,
       doc_id, source,
       md5('{_S11_SEED}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
ORDER BY position
""",
)
def s11_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.ops.ranking import global_row_number

    d = table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(_S11_SEED), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return (
        global_row_number(d, ["shuffle_key", "doc_id"], out_col="position")
        .select(
            F.col("position").cast("bigint").alias("position"),
            "doc_id",
            "source",
            "shuffle_key",
        )
        .orderBy("position")
    )


# ---------------------------------------------------------------------------
# s12 — data-mixture PLANNING (the DoReMi-style recipe step BEFORE s03's
# keep-rate application): given target mixture weights per source and a
# global token budget, compute each source's available tokens, exact
# integer weight share, token target, and repeat factor (>10000 bp =
# upsampling / multiple epochs over that source; <10000 bp = subsampling).
# Weights here derive from the source id (the same mod-4 ladder s03 uses,
# +1 so nothing zeroes out); in production they join in from a recipe
# table — identical plan.  All shares are exact integer floor divisions
# over a broadcast 1-row totals frame; one groupBy(source) shuffle total.
# ---------------------------------------------------------------------------
_S12_BUDGET = 1_000_000  # global token budget for the mixture plan
_S12_W_SQL = "(CAST(substr(source, 4) AS INT) % 4 + 1)"


@register(
    "s12_mixture_plan",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         {_S12_W_SQL} AS w,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS avail_tokens
  FROM documents
  GROUP BY source
),
tot AS (SELECT SUM(w) AS w_tot FROM per_source)
SELECT source,
       avail_tokens,
       CAST((w * 10000) // w_tot AS BIGINT) AS weight_bp,
       CAST(({_S12_BUDGET} * w) // w_tot AS BIGINT) AS target_tokens,
       CAST(((({_S12_BUDGET} * w) // w_tot) * 10000) // avail_tokens AS BIGINT)
         AS repeat_bp
FROM per_source, tot
ORDER BY source
""",
)
def s12_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = (F.substring("source", 4, 10).cast("int") % 4 + 1).alias("w")
    per_source = d.groupBy("source").agg(
        F.first(w).alias("w"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("avail_tokens"),
    )
    tot = per_source.agg(F.sum("w").alias("w_tot"))
    return (
        per_source.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "avail_tokens",
            "CAST((w * 10000) div w_tot AS BIGINT) AS weight_bp",
            f"CAST(({_S12_BUDGET} * w) div w_tot AS BIGINT) AS target_tokens",
            f"CAST(((({_S12_BUDGET} * w) div w_tot) * 10000) div avail_tokens AS BIGINT)"
            " AS repeat_bp",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# s13 — DSIR-style importance weighting (Xie et al., "Data Selection for
# Language Models via Importance Resampling"): score every raw-corpus doc by
# how target-like its hashed n-gram feature distribution is, so a later
# sampling pass can up-weight target-domain-looking data.  Target = the
# 'en' slice (stand-in for the high-quality target corpus); raw = the whole
# corpus.  Features are word bigrams hashed into 256 buckets; each bucket
# carries an add-one-smoothed target/raw rate ratio in EXACT milli-units
# (cross-multiplied integer division — the log-likelihood-ratio sum of the
# paper would ride float ln(), which is not cross-engine-reproducible); a
# doc's score is the average bucket ratio over its bigram OCCURRENCES.
#
# Scale shape: the bigram explode is map-side; bucket rates are ONE bounded
# aggregate (256 rows — broadcast back, like t23's vocabulary scalars);
# per-doc scoring is one doc-keyed aggregate; top-100 is
# TakeOrderedAndProject.  All arithmetic decimal(38,0) / HUGEINT so the
# same expressions survive 100-TB counts without bigint overflow.
# ---------------------------------------------------------------------------
_S13_BUCKETS = 256
_S13_TARGET_LANG = "en"


def _s13_oracle() -> str:
    from delta_lake_spark.queries.text import _NORM_SQL, _NTOK_SQL

    grams = (
        "list_transform(range(1, greatest(len(ws) - 1, 0) + 1), "
        "i -> ws[i] || ' ' || ws[i + 1])"
    )
    bucket = (
        "(('0x' || substr(md5('dsir:' || gram), 1, 6))::BIGINT "
        f"% {_S13_BUCKETS})"
    )
    return f"""
WITH g AS (
  SELECT doc_id, lang, unnest({grams}) AS gram
  FROM (SELECT doc_id, lang, {_NTOK_SQL} AS ws
        FROM documents)
),
b AS (SELECT doc_id, lang, {bucket} AS bucket FROM g),
rates AS (
  SELECT bucket,
         COUNT(*) AS rc,
         SUM(CASE WHEN lang = '{_S13_TARGET_LANG}' THEN 1 ELSE 0 END) AS tc
  FROM b GROUP BY bucket
),
tot AS (SELECT SUM(rc) AS rtot, SUM(tc) AS ttot FROM rates),
ratio AS (
  SELECT bucket,
         (1000::HUGEINT * (tc + 1)::HUGEINT * rtot::HUGEINT) //
         ((rc + 1)::HUGEINT * ttot::HUGEINT) AS r_milli
  FROM rates, tot
)
SELECT doc_id, any_value(b.lang) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(r_milli) AS BIGINT) AS score,
       CAST(SUM(r_milli) // COUNT(*) AS BIGINT) AS score_milli_avg
FROM b JOIN ratio USING (bucket)
GROUP BY doc_id
ORDER BY score_milli_avg DESC, doc_id
LIMIT 100
"""


@register("s13_dsir_importance", oracle=_s13_oracle())
def s13_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.dedup_sql import token_shingle_seq_sql

    d = table_parallel(spark, sf_dir, "documents", "doc_id")
    grams = d.selectExpr(
        "doc_id", "lang", f"explode({token_shingle_seq_sql('text', 2)}) AS gram"
    )
    b = grams.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("gram"))), 1, 6), 16, 10)
            .cast("long")
            % _S13_BUCKETS
        ).alias("bucket"),
    )
    rates = b.groupBy("bucket").agg(
        F.count("*").alias("rc"),
        F.sum(
            F.when(F.col("lang") == _S13_TARGET_LANG, 1).otherwise(0)
        ).alias("tc"),
    )
    tot = rates.agg(
        F.sum("rc").cast("decimal(38,0)").alias("rtot"),
        F.sum("tc").cast("decimal(38,0)").alias("ttot"),
    )
    dec = "decimal(38,0)"
    ratio = (
        rates.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                f"(CAST(1000 AS {dec}) * CAST(tc + 1 AS {dec}) * rtot) div "
                f"(CAST(rc + 1 AS {dec}) * ttot)"
            ).alias("r_milli"),
        )
    )
    return (
        b.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("r_milli").cast("bigint").alias("score"),
            F.expr("CAST(SUM(r_milli) div COUNT(*) AS BIGINT)").alias(
                "score_milli_avg"
            ),
        )
        .orderBy(F.col("score_milli_avg").desc(), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# p04 — mixture-plan MATERIALIZATION: apply s12's DoReMi-style plan to the
# corpus — every document is replicated ``repeat_bp`` times with stochastic
# rounding (full copies = repeat_bp div 10000; the fractional residual
# becomes one extra copy for a content-addressed ``residual-bp`` share of
# docs), the copies are materialized by an explode, and the per-source
# achieved token mass is certified against the plan's target.  This is the
# step between planning (s12) and packing (t09/p02): >10000 bp sources
# upsample (multi-epoch), <10000 bp sources subsample, and the achieved/
# target ratio shows the discretization error the trainer will actually see.
#
# Scale shape: the plan is a bounded per-source frame (broadcast back); the
# copies explode is linear with fan-out bounded by the largest repeat
# factor (a corpus-mixture constant, not data-dependent); the final
# aggregate is source-keyed.  Content-addressed residual selection is
# partition-count-independent (reshard-safe like s01).
# ---------------------------------------------------------------------------
def _p04_oracle() -> str:
    from delta_lake_spark.functions.sampling import hash_bucket_sql

    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    bucket = hash_bucket_sql("doc_id", "mixcopy")
    return f"""
WITH per_source AS (
  SELECT source, {_S12_W_SQL} AS w,
         CAST(SUM({toks}) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(w) AS w_tot FROM per_source),
plan AS (
  SELECT source,
         CAST(({_S12_BUDGET} * w) // w_tot AS BIGINT) AS target_tokens,
         CAST(((({_S12_BUDGET} * w) // w_tot) * 10000) // avail_tokens AS BIGINT)
           AS repeat_bp
  FROM per_source, tot
),
doc_copies AS (
  SELECT d.doc_id, d.source, {toks} AS n_toks,
         (p.repeat_bp // 10000)
           + CASE WHEN {bucket} < p.repeat_bp % 10000 THEN 1 ELSE 0 END AS copies
  FROM documents d JOIN plan p USING (source)
),
materialized AS (
  SELECT doc_id, source, n_toks, t.c AS copy_idx
  FROM doc_copies, LATERAL unnest(generate_series(1, copies)) AS t(c)
)
SELECT p.source,
       p.target_tokens,
       CAST(COALESCE(SUM(m.n_toks), 0) AS BIGINT)       AS achieved_tokens,
       CAST(COALESCE(COUNT(m.doc_id), 0) AS BIGINT)     AS n_rows,
       CAST((COALESCE(SUM(m.n_toks), 0) * 10000) // p.target_tokens AS BIGINT)
         AS achieved_bp
FROM plan p LEFT JOIN materialized m USING (source)
GROUP BY p.source, p.target_tokens
ORDER BY p.source
"""


@register("p04_mixture_materialization", oracle=_p04_oracle())
def p04_mixture_materialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.sampling import hash_bucket

    d = table_parallel(spark, sf_dir, "documents", "doc_id")
    plan = s12_mixture_plan(spark, sf_dir).select(
        "source", "target_tokens", "repeat_bp"
    )
    doc_copies = d.join(F.broadcast(plan), "source").select(
        "doc_id",
        "source",
        "target_tokens",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
        (
            F.expr("repeat_bp div 10000")
            + F.when(
                hash_bucket("doc_id", "mixcopy") < F.col("repeat_bp") % 10000, 1
            ).otherwise(0)
        ).alias("copies"),
    )
    # copies can be 0 for downsampled sources; Spark's sequence(1, 0) would
    # DESCEND ([1, 0]) instead of emitting nothing, so gate the explode
    materialized = doc_copies.filter(F.col("copies") >= 1).select(
        "doc_id",
        "source",
        "target_tokens",
        "n_toks",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("copy_idx"),
    )
    achieved = materialized.groupBy("source").agg(
        F.sum("n_toks").alias("ach"), F.count("*").alias("nr")
    )
    return (
        plan.join(achieved, "source", "left")
        .select(
            "source",
            "target_tokens",
            F.coalesce("ach", F.lit(0)).cast("bigint").alias("achieved_tokens"),
            F.coalesce("nr", F.lit(0)).cast("bigint").alias("n_rows"),
            F.expr(
                "CAST((COALESCE(ach, 0) * 10000) div target_tokens AS BIGINT)"
            ).alias("achieved_bp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# s14 — Neyman-allocation stratified sample PLAN: split a 1000-doc sampling
# budget across sources proportional to N_h * sd_h (stratum size x std dev
# of n_chars) — the minimum-variance allocation for stratified estimation
# (Neyman 1934), vs s02's equal-size strata.  High-variance sources get
# proportionally more of the budget.
#
# Exactness: the variance numerator n*SUM(x^2) - SUM(x)^2 is exact integer
# arithmetic (decimal(38,0) / HUGEINT so a 100-TB corpus cannot overflow);
# sd_milli takes ONE correctly-rounded IEEE sqrt + one multiply + one
# divide + floor on identical integer inputs — bit-identical across
# engines (t27/q39 precedent).  Allocations are cross-multiplied integer
# division against the summed weights.
#
# Scale shape: one bounded groupBy(source) aggregate with map-side
# partials; the weight total broadcasts back as a 1-row frame.  Nothing
# else touches the corpus.
# ---------------------------------------------------------------------------
@register(
    "s14_neyman_allocation",
    oracle="""
WITH m AS (
  SELECT source,
         CAST(COUNT(*) AS HUGEINT) AS n_docs,
         CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sum_c,
         CAST(SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sumsq
  FROM documents GROUP BY source
),
sd AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs * sumsq - sum_c * sum_c AS DOUBLE)) * 1000 / n_docs) AS BIGINT) AS sd_milli
  FROM m
),
w AS (
  SELECT source, n_docs, sd_milli,
         CAST(n_docs AS HUGEINT) * sd_milli AS weight
  FROM sd
),
tot AS (SELECT SUM(weight) AS total_w FROM w)
SELECT w.source,
       CAST(w.n_docs AS BIGINT)   AS n_docs,
       w.sd_milli                 AS sd_milli,
       CAST((1000 * w.weight) // t.total_w AS BIGINT)  AS alloc_docs,
       CAST((10000 * w.weight) // t.total_w AS BIGINT) AS weight_bp
FROM w CROSS JOIN tot t
ORDER BY w.source
""",
)
def s14_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count("*").cast("decimal(38,0)").alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("sum_c"),
        F.sum(
            F.col("n_chars").cast("decimal(38,0)")
            * F.col("n_chars").cast("decimal(38,0)")
        ).alias("sumsq"),
    )
    sd = m.select(
        "source",
        "n_docs",
        F.expr(
            "CAST(FLOOR(SQRT(CAST(n_docs * sumsq - sum_c * sum_c AS DOUBLE))"
            " * 1000 / n_docs) AS BIGINT)"
        ).alias("sd_milli"),
    )
    w = sd.select(
        "source",
        "n_docs",
        "sd_milli",
        (F.col("n_docs") * F.col("sd_milli")).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("total_w"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("bigint"),
            "sd_milli",
            F.expr("CAST((1000 * weight) div total_w AS BIGINT)").alias(
                "alloc_docs"
            ),
            F.expr("CAST((10000 * weight) div total_w AS BIGINT)").alias(
                "weight_bp"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# s15 — leakage-safe k-fold cross-validation assignment: every document
# lands in one of 5 folds keyed on its normalized-content FINGERPRINT
# (t01's md5 canonical form), so byte-near duplicates can never straddle
# a train/eval boundary — the same leakage rule as s09's split, at CV
# granularity.  The report shows each fold's doc/token mass and its
# deviation from a perfect 1/k share in bp (the balance check before
# trusting the folds).
#
# Scale shape: fold id is a per-row md5 (zero shuffle); one bounded
# (fold) aggregate + broadcast totals.  Content-addressed, so reshard/
# re-run/partition-count changes cannot move a document between folds.
# ---------------------------------------------------------------------------
_S15_K = 5


def _s15_oracle() -> str:
    norm = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))"
    bucket = (
        f"(('0x' || substr(md5('fold:' || md5({norm})), 1, 8))::BIGINT % {_S15_K})"
    )
    return f"""
WITH f AS (
  SELECT {bucket} AS fold, len({_TOKENS_SQL_S15}) AS toks
  FROM documents
),
tot AS (SELECT COUNT(*) AS n, SUM(toks) AS t FROM f)
SELECT CAST(f.fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f.toks) AS BIGINT) AS n_tokens,
       CAST((10000 * COUNT(*)) // tot.n AS BIGINT) AS doc_share_bp,
       CAST((10000 * COUNT(*)) // tot.n - 10000 // {_S15_K} AS BIGINT) AS balance_dev_bp
FROM f CROSS JOIN tot
GROUP BY f.fold, tot.n, tot.t
ORDER BY fold
"""


_TOKENS_SQL_S15 = (
    "(CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END)"
)


@register("s15_kfold_assignment", oracle=_s15_oracle())
def s15_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.text import fingerprint, token_count

    d = table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), fingerprint("text"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _S15_K
    )
    f = d.select(fold.alias("fold"), token_count("text").cast("long").alias("toks"))
    tot = f.agg(F.count("*").alias("n"), F.sum("toks").alias("t"))
    return (
        f.groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("fold").cast("bigint"),
            "n_docs",
            "n_tokens",
            F.expr("CAST((10000 * n_docs) div n AS BIGINT)").alias("doc_share_bp"),
            F.expr(
                f"CAST((10000 * n_docs) div n - 10000 div {_S15_K} AS BIGINT)"
            ).alias("balance_dev_bp"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# s16 — epoch-ANNEALED mixture schedule: the curriculum-scheduling layer s12
# stops short of.  Real pretraining runs anneal their source mixture across
# epochs — start near-uniform (coverage / warm-up), end at the
# quality/size-derived weights (exploitation); published schedules (e.g.
# Doremi-style reweighting, staged curricula) are per-epoch weight tables
# exactly like this.  The anneal is LINEAR interpolation between the
# uniform weight and s12's source weight over E epochs in exact integer
# milli-units (a temperature-style w^(1/T) would ride float pow — not
# cross-engine-reproducible), so every per-epoch weight, share, and token
# target is hash-exact.
#
# Scale shape: one per-source aggregate over the corpus (same single
# shuffle as s12), cross-joined with a LITERAL epoch range and a broadcast
# 1-row total — the schedule itself is (n_sources x E) metadata.
# ---------------------------------------------------------------------------
_S16_EPOCHS = 4
_S16_BUDGET = 1_000_000  # tokens per epoch


@register(
    "s16_annealed_mixture_schedule",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         {_S12_W_SQL} AS w,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS avail_tokens
  FROM documents
  GROUP BY source
),
tot AS (SELECT SUM(w) AS w_tot, COUNT(*) AS n_src FROM per_source),
sched AS (
  SELECT s.source, s.avail_tokens, e.range AS epoch,
         -- alpha ramps 0 -> 1000 milli across epochs 0..E-1
         (e.range * 1000) // ({_S16_EPOCHS} - 1) AS alpha_milli,
         -- blended weight in milli-units: (1-a)*uniform + a*weighted,
         -- uniform = w_tot/n_src so both terms share the w_tot denominator
         ((1000 - (e.range * 1000) // ({_S16_EPOCHS} - 1)) * w_tot) // n_src
           + ((e.range * 1000) // ({_S16_EPOCHS} - 1)) * s.w AS blend_milli
  FROM per_source s, tot, range({_S16_EPOCHS}) e
),
norm AS (SELECT epoch, SUM(blend_milli) AS blend_tot FROM sched GROUP BY epoch)
SELECT sched.epoch,
       sched.source,
       CAST(sched.alpha_milli AS BIGINT)  AS alpha_milli,
       CAST((sched.blend_milli * 10000) // norm.blend_tot AS BIGINT) AS weight_bp,
       CAST(({_S16_BUDGET} * sched.blend_milli) // norm.blend_tot AS BIGINT)
         AS target_tokens,
       CAST((({_S16_BUDGET} * sched.blend_milli) // norm.blend_tot) * 10000
            // sched.avail_tokens AS BIGINT) AS repeat_bp
FROM sched JOIN norm USING (epoch)
ORDER BY epoch, source
""",
)
def s16_annealed_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = (F.substring("source", 4, 10).cast("int") % 4 + 1).alias("w")
    per_source = d.groupBy("source").agg(
        F.first(w).alias("w"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("avail_tokens"),
    )
    tot = per_source.agg(F.sum("w").alias("w_tot"), F.count("*").alias("n_src"))
    epochs = spark.range(_S16_EPOCHS).select(F.col("id").alias("epoch"))
    sched = (
        per_source.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(epochs))
        .selectExpr(
            "source",
            "avail_tokens",
            "epoch",
            f"(epoch * 1000) div ({_S16_EPOCHS} - 1) AS alpha_milli",
            f"((1000 - (epoch * 1000) div ({_S16_EPOCHS} - 1)) * w_tot) div n_src"
            f" + ((epoch * 1000) div ({_S16_EPOCHS} - 1)) * w AS blend_milli",
        )
    )
    norm = sched.groupBy(F.col("epoch").alias("n_epoch")).agg(
        F.sum("blend_milli").alias("blend_tot")
    )
    return (
        sched.join(F.broadcast(norm), sched.epoch == F.col("n_epoch"))
        .selectExpr(
            "epoch",
            "source",
            "CAST(alpha_milli AS BIGINT) AS alpha_milli",
            "CAST((blend_milli * 10000) div blend_tot AS BIGINT) AS weight_bp",
            f"CAST(({_S16_BUDGET} * blend_milli) div blend_tot AS BIGINT)"
            " AS target_tokens",
            f"CAST((({_S16_BUDGET} * blend_milli) div blend_tot) * 10000"
            " div avail_tokens AS BIGINT) AS repeat_bp",
        )
        .orderBy("epoch", "source")
    )


# ---------------------------------------------------------------------------
# s17 — TEMPERATURE-scaled mixture (the mC4/XLM-R alpha-sampling rule):
# source weights proportional to (token count)^alpha with alpha = 0.5,
# flattening the natural distribution so long-tail sources are upsampled
# without letting any single giant source dominate an epoch.  alpha = 0.5
# makes the weight FLOOR(SQRT(tokens)) — sqrt is correctly rounded IEEE in
# both engines and the operand is an exact integer, so the floored weight
# (and therefore every share below) is bit-identical without any float
# accumulation.  Shares and the upsampling boost are exact integer floor
# divisions over a broadcast 1-row totals frame.
#
# Scale shape: one groupBy(source) shuffle (bounded arity), a 1-row totals
# aggregate broadcast back — identical plan to s12's mixture planning.
# ---------------------------------------------------------------------------
@register(
    "s17_temperature_mixture",
    oracle="""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents
  GROUP BY source
),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(SQRT(n_tokens)) AS BIGINT) AS wgt
  FROM per_source
),
tot AS (SELECT SUM(n_tokens) AS tok_tot, SUM(wgt) AS w_tot FROM w)
SELECT source, n_docs, n_tokens,
       CAST((n_tokens * 10000) // tok_tot AS BIGINT) AS nat_share_bp,
       CAST((wgt * 10000) // w_tot AS BIGINT) AS temp_share_bp,
       CAST(((wgt * 10000) // w_tot) * 1000
            // GREATEST((n_tokens * 10000) // tok_tot, 1) AS BIGINT)
         AS boost_milli
FROM w, tot
ORDER BY source
""",
)
def s17_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table_parallel(spark, sf_dir, "documents", "doc_id")
    per_source = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(
            "CAST(SUM(size(split(trim(text), '\\\\s+'))) AS BIGINT)"
        ).alias("n_tokens"),
    )
    w = per_source.withColumn(
        "wgt", F.expr("CAST(FLOOR(SQRT(n_tokens)) AS BIGINT)")
    )
    tot = w.agg(
        F.sum("n_tokens").alias("tok_tot"), F.sum("wgt").alias("w_tot")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "n_docs",
            "n_tokens",
            "CAST((n_tokens * 10000) div tok_tot AS BIGINT) AS nat_share_bp",
            "CAST((wgt * 10000) div w_tot AS BIGINT) AS temp_share_bp",
            "CAST(((wgt * 10000) div w_tot) * 1000"
            " div GREATEST((n_tokens * 10000) div tok_tot, 1) AS BIGINT)"
            " AS boost_milli",
        )
        .orderBy("source")
    )
