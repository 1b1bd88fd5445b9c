"""Multimodal-column queries: binary payload metadata (oracle-checked) and
the stubbed decode/feature pipeline (mapInPandas — not SQL-expressible, so
rows-only checked; the driver records the weaker gate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table, table_parallel
from delta_lake_spark.functions.multimodal import (
    decode_frames,
    payload_sha256,
    payload_size,
    with_payload,
)
from delta_lake_spark.queries.registry import register


# ---------------------------------------------------------------------------
# m01 — binary payload metadata: size, content hash, sniffed type
# (the typed-metadata side of the multimodal pattern; all JVM built-ins)
# ---------------------------------------------------------------------------
@register(
    "m01_payload_metadata",
    oracle="""
SELECT doc_id,
       octet_length(encode(text))                         AS payload_bytes,
       sha256(text)                                       AS payload_sha256,
       CASE ascii(substr(text, 1, 1)) % 3
         WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
       END                                                AS media_type
FROM documents
ORDER BY doc_id
""",
)
def m01_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
    first = F.ascii(F.substring("text", 1, 1))
    media = (
        F.when(first % 3 == 0, F.lit("image"))
        .when(first % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return d.select(
        "doc_id",
        payload_size("payload").alias("payload_bytes"),
        payload_sha256("payload").alias("payload_sha256"),
        media.alias("media_type"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# m02 — stubbed decode + frame-sample + feature-extract over mapInPandas.
# No oracle: the Arrow-batched python stage is not SQL-expressible (the
# driver records a rows-only check).  Aggregated to stay schema-stable.
# ---------------------------------------------------------------------------
@register("m02_frame_features")
def m02_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
    frames = decode_frames(d)
    return (
        frames.groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_frames").alias("total_frames"),
            F.min(F.element_at("features", 1)).alias("min_bytes"),
            F.max(F.element_at("features", 1)).alias("max_bytes"),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# m03 — frame sampling: the cardinality-expanding multimodal stage (one row
# per sampled frame).  Rows-only like m02 (Arrow-batched python); the
# differential unit test in test_pandas_ops.py checks the stub against a
# pure-python recomputation.  Aggregated per doc bucket for schema
# stability.
# ---------------------------------------------------------------------------
@register("m03_sampled_frames")
def m03_sampled_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import sample_frames

    d = with_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
    frames = sample_frames(d, every_k=4)
    return (
        frames.groupBy((F.col("doc_id") % 10).alias("doc_bucket"))
        .agg(
            F.count("*").alias("n_frames_sampled"),
            F.sum("frame_sum").alias("sum_bytes"),
            F.max("frame_idx").alias("max_frame_idx"),
        )
        .orderBy("doc_bucket")
    )


# ---------------------------------------------------------------------------
# m04 — byte-level payload digest over mapInArrow (the zero-pandas Arrow
# hatch: RecordBatches in, RecordBatches out — right for binary-heavy
# stages where pandas boxing of bytes dominates).  Rows-only checked like
# m02/m03 (python stage); differentially tested against a driver-side
# replica of the same digest.
# ---------------------------------------------------------------------------
@register("m04_arrow_digest")
def m04_arrow_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import arrow_payload_digest

    d = with_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
    return arrow_payload_digest(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# m05 — perceptual-hash near-duplicate media pairs: the multimodal twin of
# the d06/d12 dedup shapes.  Stub decode (mapInPandas, codec seam) -> JVM
# aHash -> 4x16-bit pigeonhole bands -> equi-join -> exact bit_count
# Hamming verify.  Rows-only by construction (the decode is an
# Arrow-pandas stage); the full pipeline is python-differential-tested
# (tests/test_pandas_ops.py) and the band join is plan-asserted equi-only.
# ---------------------------------------------------------------------------
@register("m05_phash_near_dups")
def m05_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import phash_near_dup_pairs

    d = with_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
    return phash_near_dup_pairs(d, max_hamming=3)


# ---------------------------------------------------------------------------
# m06 — REAL codec decode stats (pure-stdlib BMP/WAV parsing inside the
# mapInPandas stage — functions/codecs.py): per-modality aggregates of
# features extracted by genuine byte-level parsing (BMP headers + padded
# BGR rows, WAV PCM frames), all exact integers.  No oracle (byte codecs
# are not SQL-expressible; rows-only driver check) — the python
# differential test re-derives every aggregate with the same codecs driver-
# side (tests/test_pandas_ops.py).
# ---------------------------------------------------------------------------
@register("m06_stdlib_codec_stats")
def m06_stdlib_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import real_media_stats

    d = table_parallel(spark, sf_dir, "documents", "doc_id")
    stats = real_media_stats(d)
    return (
        stats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("payload_bytes").cast("bigint").alias("total_bytes"),
            F.sum("width").cast("bigint").alias("sum_width"),
            F.sum("mean_r_milli").cast("bigint").alias("sum_mean_r_milli"),
            F.sum("duration_ms").cast("bigint").alias("sum_duration_ms"),
            F.sum("rms_milli").cast("bigint").alias("sum_rms_milli"),
            F.max("peak").alias("max_peak"),
        )
        .orderBy("media_type")
    )
