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
# m02 — decode + frame-sample + feature-extract over mapInPandas, on
# GENUINE media bytes: with_media_payload carries real encoded BMP/WAV
# payloads through Arrow and decode_frames parses them with the stdlib
# codecs (magic-byte sniffing; the deterministic stub survives only as the
# unknown-format fallback — VERDICT r4 task 8).  No oracle: the
# Arrow-batched python stage is not SQL-expressible (the driver records a
# rows-only check).  Aggregated to stay schema-stable.
# ---------------------------------------------------------------------------
@register("m02_frame_features")
def m02_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import with_media_payload

    d = with_media_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
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
# per sampled frame), on GENUINE media bytes — pixel-row frames for BMP
# payloads, PCM-sample-window frames for WAV (format-aware framing in
# functions/multimodal._payload_frames; byte windows only for unknown
# formats).  Rows-only like m02 (Arrow-batched python); the differential
# unit test in test_pandas_ops.py re-derives every frame with the same
# codecs driver-side.  Aggregated per doc bucket for schema stability.
# ---------------------------------------------------------------------------
@register("m03_sampled_frames")
def m03_sampled_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import (
        sample_frames,
        with_media_payload,
    )

    d = with_media_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
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


# ---------------------------------------------------------------------------
# m07 — content-addressed chunk dedup report: split every payload into
# fixed 64-byte chunks, content-address them (the restic/borg/CAS storage
# model), and report per media type how many physical chunks a
# deduplicating store would actually keep — logical vs physical bytes and
# the dedup saving in basis points.  The storage-planning complement of
# m01's per-payload metadata (doc-level duplicates are rare; chunk-level
# sharing is where multimodal stores reclaim space).
#
# Scale shape: chunking is a per-row array transform (zero shuffle);
# the distinct-chunk count is one (media_type, chunk-hash) distinct with
# map-side combine — hashes shuffle, payload bytes never do.
# ---------------------------------------------------------------------------
@register(
    "m07_chunk_dedup_report",
    oracle="""
WITH chunks AS (
  SELECT CASE ascii(substr(text, 1, 1)) % 3
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
         END AS media_type,
         unnest(list_transform(range(CAST(ceil(length(text) / 64.0) AS BIGINT)),
                i -> substr(text, CAST(i * 64 + 1 AS BIGINT), 64))) AS chunk
  FROM documents WHERE length(text) > 0
),
hashed AS (
  SELECT media_type, md5(chunk) AS h, length(chunk) AS nbytes FROM chunks
),
phys AS (
  SELECT media_type, h, MIN(nbytes) AS nbytes, COUNT(*) AS refs
  FROM hashed GROUP BY media_type, h
)
SELECT media_type,
       CAST(SUM(refs) AS BIGINT)                          AS logical_chunks,
       CAST(COUNT(*) AS BIGINT)                           AS physical_chunks,
       CAST(SUM(refs * nbytes) AS BIGINT)                 AS logical_bytes,
       CAST(SUM(nbytes) AS BIGINT)                        AS physical_bytes,
       CAST(10000 - (10000 * SUM(nbytes)) // SUM(refs * nbytes) AS BIGINT) AS saving_bp
FROM phys GROUP BY media_type ORDER BY media_type
""",
)
def m07_chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table_parallel(spark, sf_dir, "documents", "doc_id").filter(
        F.length("text") > 0
    )
    first = F.ascii(F.substring("text", 1, 1))
    media = (
        F.when(first % 3 == 0, F.lit("image"))
        .when(first % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    chunks = d.select(
        media.alias("media_type"),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.length("text") / F.lit(64.0)).cast("int") - 1,
                ),
                lambda i: F.substring(
                    F.col("text"), (i * 64 + 1).cast("int"), 64
                ),
            )
        ).alias("chunk"),
    )
    hashed = chunks.select(
        "media_type", F.md5("chunk").alias("h"), F.length("chunk").alias("nbytes")
    )
    phys = hashed.groupBy("media_type", "h").agg(
        F.min("nbytes").alias("nbytes"), F.count("*").alias("refs")
    )
    return (
        phys.groupBy("media_type")
        .agg(
            F.sum("refs").cast("bigint").alias("logical_chunks"),
            F.count("*").cast("bigint").alias("physical_chunks"),
            F.sum(F.col("refs") * F.col("nbytes"))
            .cast("bigint")
            .alias("logical_bytes"),
            F.sum("nbytes").cast("bigint").alias("physical_bytes"),
        )
        .select(
            "media_type",
            "logical_chunks",
            "physical_chunks",
            "logical_bytes",
            "physical_bytes",
            F.expr(
                "CAST(10000 - (10000 * physical_bytes) div logical_bytes AS BIGINT)"
            ).alias("saving_bp"),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# m08 — media HEADER AUDIT, oracle-checked end to end (upgrades the
# multimodal family beyond rows-only): with_media_payload synthesizes
# genuine BMP/WAV bytes (pure functions of doc_id), Spark parses the REAL
# bytes JVM-side (little-endian header fields via substring/hex/conv on the
# BINARY column — no python in the parse path), and the DuckDB oracle
# states the CLOSED-FORM truth from doc_id arithmetic alone, never seeing a
# byte.  Any drift in the encoder, the Arrow binary transfer, or the
# byte-offset parsing breaks the hash match — this is the decode-path
# certification the codec stubs could not give.
#
# Scale shape: one mapInPandas synthesis pass (the object-store read seam),
# a per-row JVM header parse (zero shuffle), one bounded groupBy(media_type)
# aggregate.
# ---------------------------------------------------------------------------
def _le_int(col: str, pos: int, nbytes: int) -> str:
    """SQL for the little-endian unsigned int at 1-based byte ``pos``."""
    parts = ", ".join(
        f"hex(substring({col}, {pos + i}, 1))" for i in range(nbytes - 1, -1, -1)
    )
    return f"CAST(conv(concat({parts}), 16, 10) AS BIGINT)"


@register(
    "m08_media_header_audit",
    oracle="""
WITH synth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
           AS media_type,
         8 + doc_id % 5 AS w,
         8 + doc_id % 3 AS h,
         64 + doc_id % 32 AS n_samp
  FROM documents
),
sized AS (
  SELECT media_type,
         CASE WHEN media_type = 'image/bmp'
              THEN 54 + ((w * 3 + 3) // 4) * 4 * h
              ELSE 44 + 2 * n_samp END AS payload_bytes,
         CASE WHEN media_type = 'image/bmp' THEN w ELSE 8000 END AS primary_dim,
         CASE WHEN media_type = 'image/bmp' THEN w * h ELSE n_samp END AS units
  FROM synth
)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(SUM(payload_bytes) AS BIGINT) AS total_payload_bytes,
       CAST(MIN(primary_dim) AS BIGINT) AS min_primary_dim,
       CAST(MAX(primary_dim) AS BIGINT) AS max_primary_dim,
       CAST(SUM(units) AS BIGINT) AS total_units
FROM sized
GROUP BY media_type
ORDER BY media_type
""",
)
def m08_media_header_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_spark.functions.multimodal import with_media_payload

    d = with_media_payload(table_parallel(spark, sf_dir, "documents", "doc_id"))
    # real byte-level header parsing, JVM-side: BMP width/height are LE
    # int32 at offsets 19/23 (1-based); the canonical 44-byte WAV header
    # puts the sample rate at 25 and the data-chunk byte count at 41.
    parsed = d.selectExpr(
        "media_type",
        "CAST(length(payload) AS BIGINT) AS payload_bytes",
        f"CASE WHEN media_type = 'image/bmp' THEN {_le_int('payload', 19, 4)} "
        f"     ELSE {_le_int('payload', 25, 4)} END AS primary_dim",
        f"CASE WHEN media_type = 'image/bmp' "
        f"     THEN {_le_int('payload', 19, 4)} * {_le_int('payload', 23, 4)} "
        f"     ELSE {_le_int('payload', 41, 4)} div 2 END AS units",
    )
    return (
        parsed.groupBy("media_type")
        .agg(
            F.count("*").cast("bigint").alias("n_payloads"),
            F.sum("payload_bytes").cast("bigint").alias("total_payload_bytes"),
            F.min("primary_dim").cast("bigint").alias("min_primary_dim"),
            F.max("primary_dim").cast("bigint").alias("max_primary_dim"),
            F.sum("units").cast("bigint").alias("total_units"),
        )
        .orderBy("media_type")
    )
