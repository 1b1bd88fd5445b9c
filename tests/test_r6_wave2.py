"""Semantic invariants for the r6 wave-2/3 queries (t30 / v22 / s17 / p05 / q106).

The oracle-parity sweep (test_oracle_parity.py) certifies Spark == DuckDB;
these tests pin the INTENT of each query so a future edit that changes both
sides in lockstep still trips an alarm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_spark.queries import QUERIES
from tests.conftest import SF_CORRECT


def test_t30_bins_partition_the_corpus(spark):
    rows = QUERIES["t30_calibration_bins"](spark, SF_CORRECT).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n_docs"] for r in rows)
    assert n == 500  # every document lands in exactly one bin
    # NTILE sizing: first N % 10 bins get one extra row
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert r["pos_rate_bp"] == r["n_pos"] * 10000 // r["n_docs"]
        assert r["min_score"] <= r["max_score"]
    # deciles are ordered by score: bin k's max never exceeds bin k+1's min
    # (ties may share a boundary score across adjacent bins)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score"] <= hi["min_score"]


def test_v22_fusion_members_come_from_a_leg(spark):
    out = QUERIES["v22_rrf_hybrid_search"](spark, SF_CORRECT).collect()
    assert {r["query_id"] for r in out} == {1, 2, 3, 4, 5}
    for r in out:
        # every fused doc was nominated by at least one leg
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0
        expect = 0
        if r["lex_rank"]:
            expect += 1000000 // (60 + r["lex_rank"])
        if r["vec_rank"]:
            expect += 1000000 // (60 + r["vec_rank"])
        assert r["rrf_micro"] == expect
    # per query: exactly 10 results, ranks 1..10, rrf non-increasing
    for q in range(1, 6):
        qr = sorted((r for r in out if r["query_id"] == q), key=lambda r: r["rank"])
        assert [r["rank"] for r in qr] == list(range(1, 11))
        assert all(a["rrf_micro"] >= b["rrf_micro"] for a, b in zip(qr, qr[1:]))
    # a doc present in BOTH legs must outrank the same-rank single-leg doc:
    # fusion actually fuses (at least one both-legs doc exists in the corpus)
    assert any(r["lex_rank"] > 0 and r["vec_rank"] > 0 for r in out)


def test_s17_temperature_flattens_the_mixture(spark):
    rows = QUERIES["s17_temperature_mixture"](spark, SF_CORRECT).collect()
    assert len(rows) == 20
    tot_nat = sum(r["nat_share_bp"] for r in rows)
    tot_temp = sum(r["temp_share_bp"] for r in rows)
    # floor-division shares sum to <= 10000 and within rounding slack
    assert 10000 - 20 <= tot_nat <= 10000
    assert 10000 - 20 <= tot_temp <= 10000
    # alpha=0.5 FLATTENS: the largest source's share shrinks, the smallest
    # source's share grows (strict when shares differ)
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["temp_share_bp"] <= big["nat_share_bp"]
    assert small["temp_share_bp"] >= small["nat_share_bp"]
    assert big["boost_milli"] <= 1000 <= small["boost_milli"]


def test_p05_purges_whole_duplicate_clusters(spark):
    from delta_lake_spark.functions.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )
    from delta_lake_spark.queries.curation import (
        _DEDUP_TH,
        _P05_SEED_MOD,
        _P05_SEED_REM,
    )

    out = {r["source"]: r for r in QUERIES["p05_forgetting_pipeline"](spark, SF_CORRECT).collect()}
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    # per-source doc conservation
    per_src = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(out) == set(per_src)
    for s, r in out.items():
        assert r["n_docs"] == per_src[s]
        # removal = seeds + non-seed expansion, and seeds are always purged
        assert r["n_removed"] == r["n_seeds"] + r["n_expanded"]
        assert r["n_after"] == r["n_docs"] - r["n_removed"]
    # independent closure check: recompute components and assert every
    # cluster containing a seed is fully inside the removed mass
    gated = docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
    pairs = minhash_candidate_pairs(gated, "doc_id", "text").filter(
        F.col("jaccard_bp") >= _DEDUP_TH
    )
    comps = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    seeds = {
        r["doc_id"]
        for r in docs.filter(
            F.col("doc_id") % _P05_SEED_MOD == _P05_SEED_REM
        ).collect()
    }
    seeded_components = {comps[d] for d in seeds if d in comps}
    expected_removed = seeds | {
        d for d, c in comps.items() if c in seeded_components
    }
    total_removed = sum(r["n_removed"] for r in out.values())
    assert total_removed == len(expected_removed)
    total_expanded = sum(r["n_expanded"] for r in out.values())
    assert total_expanded == len(expected_removed - seeds)


def test_q106_bands_conserve_customers(spark):
    rows = QUERIES["q106_k_anonymity"](spark, SF_CORRECT).collect()
    docs = spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
    n = docs.count()
    assert sum(r["n_rows"] for r in rows) == n  # every customer in one band
    order = [
        "1 (re-identifiable)",
        "2-4",
        "5-9",
        "10+",
    ]
    assert [r["size_band"] for r in rows] == [b for b in order if b in {x["size_band"] for x in rows}]
    for r in rows:
        assert r["n_classes"] >= 1
        # a size-1 class has exactly one sensitive value
        if r["size_band"] == "1 (re-identifiable)":
            assert r["n_rows"] == r["n_classes"]
            assert r["min_l_diversity"] == 1
            assert r["homogeneous_classes"] == r["n_classes"]
        assert 0 <= r["rows_bp"] <= 10000
        assert r["min_l_diversity"] >= 1


def test_t31_bands_partition_the_vocabulary(spark):
    rows = QUERIES["t31_zipf_rank_bands"](spark, SF_CORRECT).collect()
    # bands are contiguous powers of two from rank 1
    assert [r["band"] for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r["rank_lo"] >= 2 ** r["band"]
        assert r["rank_hi"] <= 2 ** (r["band"] + 1) - 1
        assert r["n_words"] == r["rank_hi"] - r["rank_lo"] + 1
    # ranks cover 1..vocab with no gaps across bands
    assert rows[0]["rank_lo"] == 1
    for a, b in zip(rows, rows[1:]):
        assert b["rank_lo"] == a["rank_hi"] + 1
    # occurrence shares sum to <= 10000 (floor division)
    assert sum(r["occ_share_bp"] for r in rows) <= 10000
    # rank-1 word is the most frequent: band 0 mean_rank_freq equals its freq
    assert rows[0]["n_words"] == 1


def test_v23_rerank_dominates_raw_codes(spark):
    rows = QUERIES["v23_sq_recall"](spark, SF_CORRECT).collect()
    assert [r["qid"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert r["n_exact"] == 10
        # the re-rank stage can only help: it reorders a superset of the
        # raw-code top-10 by the exact metric
        assert r["hits_reranked"] >= r["hits_raw_codes"]
        assert 0 <= r["hits_raw_codes"] <= 10
        assert r["recall_raw_bp"] == r["hits_raw_codes"] * 1000
        assert r["recall_rerank_bp"] == r["hits_reranked"] * 1000


def test_m08_header_parse_matches_python_decoders(spark):
    """The JVM byte-parse must agree with the stdlib decoders on the same
    payloads (a third, independent leg beside the closed-form oracle)."""
    from delta_lake_spark.functions.codecs import (
        decode_bmp24,
        decode_wav_pcm16,
        synth_media_payload,
    )

    rows = {r["media_type"]: r for r in QUERIES["m08_media_header_audit"](spark, SF_CORRECT).collect()}
    assert set(rows) == {"image/bmp", "audio/wav"}
    n_docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").count()
    assert rows["image/bmp"]["n_payloads"] + rows["audio/wav"]["n_payloads"] == n_docs
    # python-side ground truth over every doc id
    exp = {"image/bmp": [0, 0, 0], "audio/wav": [0, 0, 0]}  # n, bytes, units
    dims = {"image/bmp": [], "audio/wav": []}
    for i in range(n_docs):
        mt, payload = synth_media_payload(i)
        exp[mt][0] += 1
        exp[mt][1] += len(payload)
        if mt == "image/bmp":
            meta = decode_bmp24(payload)
            exp[mt][2] += meta["width"] * meta["height"]
            dims[mt].append(meta["width"])
        else:
            meta = decode_wav_pcm16(payload)
            exp[mt][2] += meta["n_samples"]
            dims[mt].append(meta["sample_rate"])
    for mt, r in rows.items():
        assert r["n_payloads"] == exp[mt][0]
        assert r["total_payload_bytes"] == exp[mt][1]
        assert r["total_units"] == exp[mt][2]
        assert r["min_primary_dim"] == min(dims[mt])
        assert r["max_primary_dim"] == max(dims[mt])
