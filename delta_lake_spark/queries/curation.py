"""End-to-end corpus-curation pipeline as ONE oracle-checked query: the
composition a training-data run actually executes —

    near-dedup (MinHash LSH + exact-Jaccard verify, d09)
    -> quality gate (t03's integer score)
    -> deterministic train/val/test split (s01's content-addressed hash)
    -> per-split corpus stats

Every stage is an operator certified on its own elsewhere in the registry;
this query certifies the COMPOSITION (stage interfaces, no row leaks
between gates) against a single DuckDB oracle built from the same SQL
mirrors.  Plan shape: the LSH dedup's banded self-join is the only
shuffle-heavy stage; quality/split are map-side; the final agg is 3 groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table_parallel
from delta_lake_spark.queries.registry import register

_MIN_QUALITY = 70
_DEDUP_TH = 8000


def _p01_oracle() -> str:
    from delta_lake_spark.functions.sampling import hash_bucket_sql
    from delta_lake_spark.queries.dedup import _BAND_SELECTS, _SHINGLES_SQL, _SIG_COLS
    from delta_lake_spark.queries.text import _QUALITY_SQL, _TOKENS_SQL

    split_b = hash_bucket_sql("doc_id", "split")
    return f"""
WITH base AS ({_SHINGLES_SQL}),
sigs AS (SELECT doc_id, sh, {_SIG_COLS} FROM base),
banded AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT id_b
  FROM cand JOIN base x ON x.doc_id = id_a JOIN base y ON y.doc_id = id_b
  WHERE FLOOR(len(list_intersect(x.sh, y.sh)) * 10000.0 /
        (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))) >= {_DEDUP_TH}
),
kept AS (
  SELECT doc_id,
         CASE WHEN {split_b} < 9000 THEN 'train'
              WHEN {split_b} < 9500 THEN 'val'
              ELSE 'test' END AS split,
         len({_TOKENS_SQL}) AS n_toks
  FROM documents d
  WHERE len(regexp_split_to_array(trim(d.text), '\\s+')) >= 3
    AND d.doc_id NOT IN (SELECT id_b FROM verified)
    AND {_QUALITY_SQL} >= {_MIN_QUALITY}
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM kept GROUP BY split ORDER BY split
"""


@register("p01_curation_pipeline", oracle=_p01_oracle())
def p01_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.dedup import near_dedup
    from delta_lake_spark.functions.sampling import split_assign
    from delta_lake_spark.functions.text import quality_score, token_count

    docs = table_parallel(spark, sf_dir, "documents", "doc_id").filter(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 3
    )
    survivors = near_dedup(docs, "doc_id", "text", min_jaccard_bp=_DEDUP_TH)
    kept = survivors.filter(quality_score("text") >= _MIN_QUALITY).select(
        "doc_id",
        split_assign("doc_id").alias("split"),
        token_count("text").alias("n_toks"),
    )
    return (
        kept.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
        )
        .orderBy("split")
    )
