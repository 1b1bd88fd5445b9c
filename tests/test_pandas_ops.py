"""Pandas escape-hatch tests: the vectorized UDF agrees with an equivalent
JVM expression; the grouped centroid op agrees with driver-side numpy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.functions.pandas_ops import bpe_ish_token_count, label_centroids
from tests.conftest import SF_SMOKE


def test_pandas_udf_matches_jvm_expression(spark):
    d = table(spark, SF_SMOKE, "documents").limit(200)
    jvm = (
        F.regexp_count("text", F.lit(r"[A-Za-z]+"))
        + F.regexp_count("text", F.lit(r"[0-9]+"))
        + F.regexp_count("text", F.lit(r"[^\sA-Za-z0-9]"))
    ).cast("long")
    rows = d.select(
        bpe_ish_token_count("text").alias("py"), jvm.alias("jvm")
    ).collect()
    assert rows and all(r["py"] == r["jvm"] for r in rows)


def test_label_centroids_match_numpy(spark):
    e = table(spark, SF_SMOKE, "embeddings")
    got = {r["label"]: r for r in label_centroids(e).collect()}
    pdf = e.select("vec_id", "label", "embedding").toPandas()
    for label, grp in pdf.groupby("label"):
        grp = grp.sort_values("vec_id")
        mat = np.array(grp["embedding"].to_list(), dtype="float64")
        centroid = mat.mean(axis=0)
        dists = np.linalg.norm(mat - centroid, axis=1)
        r = got[label]
        assert r["n"] == len(grp)
        assert np.allclose(r["centroid"], centroid)
        assert abs(r["mean_dist"] - dists.mean()) < 1e-9
        assert abs(r["max_dist"] - dists.max()) < 1e-9


def test_sample_frames_unknown_bytes_fallback_matches_python(spark):
    """Unknown-format payloads (text bytes) still frame as fixed byte
    windows — the stub fallback of the format-aware framing."""
    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.multimodal import sample_frames, with_payload
    from tests.conftest import SF_SMOKE

    d = with_payload(table(spark, SF_SMOKE, "documents")).filter(
        F.col("doc_id") < 20
    )
    got = sorted(
        map(tuple, sample_frames(d, every_k=4).collect())
    )
    want = []
    for r in d.select("doc_id", "payload").collect():
        b = bytes(r.payload)
        n_frames = len(b) // 100 + 1
        for i in range(0, n_frames, 4):
            chunk = b[i * 100 : (i + 1) * 100]
            want.append((r.doc_id, i, len(chunk), sum(chunk)))
    assert got == sorted(want)


def test_sample_frames_parses_genuine_media_bytes(spark):
    """m03's framing on real payloads: BMP frames are pixel ROWS (genuine
    header + padded-BGR-row parsing), WAV frames are PCM sample windows —
    re-derived driver-side with the same stdlib codecs, via an INDEPENDENT
    python replica (struct/wave directly, not the library under test)."""
    import struct
    import wave as wavemod
    import io

    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.codecs import synth_media_payload
    from delta_lake_spark.functions.multimodal import (
        sample_frames,
        with_media_payload,
    )
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 24)
    d = with_media_payload(docs)
    got = sorted(map(tuple, sample_frames(d, every_k=4).collect()))

    want = []
    for r in docs.select("doc_id").collect():
        media, payload = synth_media_payload(int(r.doc_id))
        frames = []
        if media == "image/bmp":
            width, height = struct.unpack_from("<ii", payload, 18)
            offset = struct.unpack_from("<2sIHHI", payload, 0)[4]
            row_size = (width * 3 + 3) & ~3
            rows = []
            for y in range(height):  # stored bottom-up
                base = offset + y * row_size
                rows.append(sum(payload[base : base + width * 3]))
            rows.reverse()
            frames = [(width * 3, s) for s in rows]
        else:
            with wavemod.open(io.BytesIO(payload), "rb") as w:
                n = w.getnframes()
                samples = struct.unpack(f"<{n}h", w.readframes(n))
            for i in range(0, max(n, 1), 100):
                win = samples[i : i + 100]
                frames.append((2 * len(win), sum(abs(s) for s in win)))
        for i in range(0, len(frames), 4):
            want.append((r.doc_id, i, frames[i][0], frames[i][1]))
    assert got == sorted(want) and got


def test_decode_frames_parses_genuine_media_bytes(spark):
    """m02's decode seam on real payloads: BMP rows decode through genuine
    header parsing (width/height/channel means), WAV through genuine PCM
    parsing (rate/duration/RMS) — checked against a driver-side decode of
    the same bytes; media_type comes from the MAGIC BYTES, not the stub."""
    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.codecs import (
        decode_bmp24,
        decode_wav_pcm16,
        synth_media_payload,
    )
    from delta_lake_spark.functions.multimodal import (
        decode_frames,
        with_media_payload,
    )
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 24)
    got = {
        r.doc_id: r
        for r in decode_frames(with_media_payload(docs)).collect()
    }
    assert len(got) == 24
    for r in docs.select("doc_id").collect():
        media, payload = synth_media_payload(int(r.doc_id))
        g = got[r.doc_id]
        assert g.features[0] == float(len(payload))
        if media == "image/bmp":
            d = decode_bmp24(payload)
            assert g.media_type == 0 and g.n_frames == d["height"]
            assert g.features[1:] == [
                float(d["width"]), float(d["height"]), float(d["mean_r_milli"])
            ]
        else:
            d = decode_wav_pcm16(payload)
            assert g.media_type == 1
            assert g.n_frames == d["n_samples"] // 160 + 1
            assert g.features[1:] == [
                float(d["sample_rate"]), float(d["duration_ms"]),
                float(d["rms_milli"]),
            ]


def test_arrow_digest_matches_driver_replica(spark):
    """m04's mapInArrow stage (RecordBatches in/out, no pandas) must agree
    byte-for-byte with the driver-side python replica of the digest."""
    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.multimodal import (
        _digest_one,
        arrow_payload_digest,
        with_payload,
    )

    d = with_payload(table(spark, SF_SMOKE, "documents"))
    got = {r.doc_id: r for r in arrow_payload_digest(d).collect()}
    src = d.select("doc_id", "payload").collect()
    assert len(got) == len(src) > 0
    for r in src:
        e = _digest_one(bytes(r.payload))
        g = got[r.doc_id]
        assert (g.payload_bytes, g.first_byte, g.last_byte, g.head_checksum) == e


def test_phash_near_dups_match_python_replica(spark):
    """m05's full pipeline (thumbnail decode -> aHash -> pigeonhole bands
    -> Hamming verify) must agree pair-for-pair with a brute-force python
    replica on the smoke corpus — including the pigeonhole guarantee that
    EVERY pair within the Hamming threshold is found by the banded join."""
    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.multimodal import (
        _fake_thumbnail,
        phash_near_dup_pairs,
        with_payload,
    )

    d = with_payload(table(spark, SF_SMOKE, "documents"))
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(d, max_hamming=3).collect()
    }

    def ahash_py(payload: bytes) -> int:
        cells = _fake_thumbnail(payload)
        mean = sum(cells) // len(cells)
        h = 0
        for i, c in enumerate(cells):
            if c > mean:
                h |= 1 << i
        return h - (1 << 64) if h >= (1 << 63) else h  # signed-64 view

    src = {r.doc_id: ahash_py(bytes(r.payload)) for r in d.select("doc_id", "payload").collect()}
    ids = sorted(src)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((src[a] ^ src[b]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                expected[(a, b)] = ham
    assert got == expected


def test_phash_band_join_is_equi_only(spark):
    from tests.test_plans import plan_of
    from delta_lake_spark.queries import QUERIES

    plan = plan_of(QUERIES["m05_phash_near_dups"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- real stdlib codecs (functions/codecs.py, m06) -------------------------


def test_bmp_roundtrip_hand_computed():
    from delta_lake_spark.functions.codecs import decode_bmp24, encode_bmp24

    rows = [[(10, 20, 30), (50, 60, 70)], [(90, 100, 110), (130, 140, 150)]]
    d = decode_bmp24(encode_bmp24(2, 2, rows))
    assert (d["width"], d["height"]) == (2, 2)
    assert d["mean_r_milli"] == (10 + 50 + 90 + 130) * 1000 // 4
    assert d["mean_g_milli"] == (20 + 60 + 100 + 140) * 1000 // 4
    assert d["mean_b_milli"] == (30 + 70 + 110 + 150) * 1000 // 4


def test_bmp_row_padding_survives():
    # width 3 -> 9 data bytes per row, padded to 12: the parser must honor
    # the 4-byte stride or every row after the first reads garbage
    from delta_lake_spark.functions.codecs import decode_bmp24, encode_bmp24

    rows = [[(x * 10 + y, 0, 0) for x in range(3)] for y in range(2)]
    d = decode_bmp24(encode_bmp24(3, 2, rows))
    assert d["mean_r_milli"] == (0 + 10 + 20 + 1 + 11 + 21) * 1000 // 6


def test_wav_roundtrip_hand_computed():
    import math

    from delta_lake_spark.functions.codecs import decode_wav_pcm16, encode_wav_pcm16

    samples = [0, 100, -200, 300]
    d = decode_wav_pcm16(encode_wav_pcm16(8000, samples))
    assert d["sample_rate"] == 8000 and d["n_samples"] == 4
    assert d["duration_ms"] == 4 * 1000 // 8000
    assert d["peak"] == 300
    assert d["rms_milli"] == math.isqrt(
        (0 + 100**2 + 200**2 + 300**2) * 1_000_000 // 4
    )


def test_m06_matches_pure_python_reference(spark):
    """The distributed decode (Arrow batches -> stdlib codec parse) must
    equal a driver-side loop running the identical codecs."""
    from delta_lake_spark.catalog import table
    from delta_lake_spark.functions.codecs import (
        decode_bmp24,
        decode_wav_pcm16,
        synth_media_payload,
    )
    from delta_lake_spark.queries import QUERIES

    got = {
        r.media_type: (
            r.n_items, r.total_bytes, r.sum_width, r.sum_mean_r_milli,
            r.sum_duration_ms, r.sum_rms_milli, r.max_peak,
        )
        for r in QUERIES["m06_stdlib_codec_stats"](spark, SF_SMOKE).collect()
    }

    agg = {}
    for (doc_id,) in table(spark, SF_SMOKE, "documents").select("doc_id").collect():
        mt, payload = synth_media_payload(doc_id)
        a = agg.setdefault(
            mt, {"n": 0, "bytes": 0, "w": 0, "r": 0, "dur": 0, "rms": 0, "peak": 0}
        )
        a["n"] += 1
        a["bytes"] += len(payload)
        if mt == "image/bmp":
            d = decode_bmp24(payload)
            a["w"] += d["width"]
            a["r"] += d["mean_r_milli"]
        else:
            d = decode_wav_pcm16(payload)
            a["dur"] += d["duration_ms"]
            a["rms"] += d["rms_milli"]
            a["peak"] = max(a["peak"], d["peak"])
    want = {
        mt: (
            a["n"], a["bytes"],
            a["w"] or None, a["r"] or None,
            a["dur"] or None, a["rms"] or None,
            a["peak"] or None,
        )
        for mt, a in agg.items()
    }
    assert got == want
