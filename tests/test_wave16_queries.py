"""Hand-computed differential tests for the wave-16 operators (q82 interval
union, q83 MAD fences, t24 boilerplate mining, s13 DSIR weighting, v17
exact-integer k-means, d21 SemDeDup keep rule) — tiny corpora where the
expected output is derivable on paper, complementing the DuckDB oracle
parity."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    events = pa.table(
        {
            "event_id": list(range(1, len(rows) + 1)),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": [r[0] for r in rows],
            "event_type": [r[3] if len(r) > 3 else "a" for r in rows],
            "value": [float(r[2]) if len(r) > 2 else 1.0 for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))


def _write_docs(tmp_path, texts, langs=None, sources=None):
    docs = pa.table(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": langs or ["en"] * len(texts),
            "source": sources or ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))


def test_q82_touching_intervals_merge(spark, tmp_path):
    def ts(m, s=0):
        return datetime.datetime(2024, 1, 1, 0, m, s)

    # u1: events at 00:00, 00:03, 00:20 -> [0,5)+[3,8) merge (covered 8 min),
    #     [20,25) alone (5 min) -> 2 islands, 13 min covered, 3 events
    # u2: events at 00:00 and exactly 00:05 -> touching (s == prev end) MERGES
    #     -> 1 island [0,10), 10 min covered
    _write_events(
        tmp_path,
        [(1, ts(0)), (1, ts(3)), (1, ts(20)), (2, ts(0)), (2, ts(5))],
    )
    from delta_lake_spark.queries import QUERIES

    out = {
        r.user_id: (r.n_islands, r.covered_us, r.n_events)
        for r in QUERIES["q82_interval_union_coverage"](spark, str(tmp_path)).collect()
    }
    assert out == {
        1: (2, 13 * 60_000_000, 3),
        2: (1, 10 * 60_000_000, 2),
    }


def test_q83_mad_fences_catch_the_spike(spark, tmp_path):
    def ts(m):
        return datetime.datetime(2024, 1, 1, 0, m, 0)

    # values 1,2,3,4,100 -> median 3.00 (med_2c = 600 doubled cents),
    # deviations |2c-600| = [400,200,0,200,19400] -> MAD median 200
    # (mad_2c = 400); fence 2*dev2 > 1200 flags only the 100.00 spike.
    _write_events(
        tmp_path,
        [(1, ts(i), v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q83_mad_outliers"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n, r.med_2c, r.mad_2c, r.n_outliers, r.outlier_bp) == (
        5,
        600,
        400,
        1,
        2000,
    )


def test_t24_finds_the_shared_trigram(spark, tmp_path):
    # srcA: "a b c" appears in docs 1 and 2 (2 of 3 docs -> >= 10% and >= 2)
    # srcB: no repeated trigram -> all zeros
    _write_docs(
        tmp_path,
        ["a b c d", "x a b c", "p q r s", "m n o p", "q w e r"],
        sources=["A", "A", "A", "B", "B"],
    )
    from delta_lake_spark.queries import QUERIES

    out = {
        r.source: (r.n_docs, r.n_boiler_grams, r.boiler_doc_hits, r.affected_docs, r.affected_bp)
        for r in QUERIES["t24_boilerplate_ngrams"](spark, str(tmp_path)).collect()
    }
    assert out == {"A": (3, 1, 2, 2, 6666), "B": (2, 0, 0, 0, 0)}


def test_s13_uniform_target_means_unit_ratio(spark, tmp_path):
    # When EVERY doc is in the target slice, every bucket has tc == rc and
    # ttot == rtot, so each smoothed ratio is exactly 1000 milli — and so is
    # every per-doc average.  (The discriminating behavior is covered by the
    # DuckDB oracle at sf0.01.)
    _write_docs(tmp_path, ["a b c d", "b c a d", "d c b a"], langs=["en"] * 3)
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["s13_dsir_importance"](spark, str(tmp_path)).collect()
    assert len(rows) == 3
    assert all(r.score_milli_avg == 1000 for r in rows)
    assert all(r.score == 1000 * r.n_bigrams for r in rows)


def _write_embeddings(tmp_path, vecs, labels=None):
    emb = pa.table(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": labels or [0] * len(vecs),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))


def _unit(dim_idx: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * 64
    v[dim_idx] = scale
    return v


def test_v17_kmeans_hand_cluster(spark, tmp_path):
    # Seeds = vec_ids 0..7 (the 8 axis vectors).  vec 8 = 0.75*e0 and vec 9
    # = 0.5*e0 join cluster 0 (0.75/0.5 are float32-exact, so quantized
    # micro-units are exactly 750000/500000).  Updated centroid dim0 =
    # (1000000+750000+500000) div 3 = 750000; second assignment is stable.
    # Inertia c0 = (250000^2 + 0 + 250000^2) = 1.25e11.
    vecs = [_unit(i) for i in range(8)] + [_unit(0, 0.75), _unit(0, 0.5)]
    _write_embeddings(tmp_path, vecs)
    from delta_lake_spark.queries import QUERIES

    out = {
        r.cluster_id: (r.n_members, r.member_id_sum, r.inertia)
        for r in QUERIES["v17_kmeans_exact"](spark, str(tmp_path)).collect()
    }
    assert out[0] == (3, 0 + 8 + 9, 2 * 250_000**2)
    for cid in range(1, 8):
        assert out[cid] == (1, cid, 0)


def test_d21_keeps_the_member_farthest_from_centroid(spark, tmp_path):
    # Cluster 0 = {0 (1.0*e0), 8 (0.75*e0), 9 (0.5*e0)}, centroid dim0 =
    # 750000 -> distances 6.25e10 / 0 / 6.25e10.  All three pairs are
    # colinear (cosine exactly 1 > 0.4):
    #   (0,8): 8 is closer -> drop 8
    #   (0,9): tie -> drop the higher id 9
    #   (8,9): 8 is closer -> drop 8
    # Survivor of cluster 0 is vec 0 — the member FARTHEST from the
    # centroid, the paper's diversity-keeping rule (lowest-id would have
    # kept 0 here too, but 8 would survive pair (8,9) under it... the tie
    # and closer-drops pin the rule).  Axis seeds 1..7 survive untouched.
    vecs = [_unit(i) for i in range(8)] + [_unit(0, 0.75), _unit(0, 0.5)]
    _write_embeddings(tmp_path, vecs, labels=list(range(10)))
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["d21_semantic_dedup_survivors"](spark, str(tmp_path)).collect()
    got = {r.vec_id: (r.cluster_id, r.centroid_dist) for r in rows}
    assert sorted(got) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert got[0] == (0, 250_000**2)
    for cid in range(1, 8):
        assert got[cid][0] == cid


def test_trunc_div_matches_engine_semantics():
    from delta_lake_spark.queries.vector import _trunc_div

    # both DuckDB `//` and Spark `div` truncate toward zero (probed)
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3
    assert _trunc_div(-6, 3) == -2
    assert _trunc_div(0, 5) == 0


def test_t25_all_ties_means_auc_half(spark, tmp_path):
    # identical text -> identical scores -> every pos/neg pair is a tie ->
    # midrank U gives AUC exactly 0.5 (u2 = 2 * npos * nneg * 0.5)
    _write_docs(
        tmp_path,
        ["same words here okay"] * 4,
        langs=["en", "en", "fr", "de"],
    )
    from delta_lake_spark.queries import QUERIES

    r = QUERIES["t25_classifier_auc"](spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.u2 == 4  # 2*U where U = npos*nneg/2 = 2
    assert r.auc_bp == 5000


def test_t26_kappa_zero_for_constant_predictor_and_one_for_perfect(spark, tmp_path):
    from delta_lake_spark.queries import QUERIES

    # constant prediction (both docs scream English stopwords) over a 50/50
    # truth split: agreement 1/2 equals chance -> kappa exactly 0.
    # NOTE: each corpus gets its OWN directory — t26 persists its bounded
    # confusion frame, and overwriting the same path would let Spark's
    # cache manager serve the first corpus's cached plan for the second.
    a = tmp_path / "a"; a.mkdir()
    _write_docs(a, ["the and of to with"] * 2, langs=["en", "fr"])
    r = QUERIES["t26_langid_kappa"](spark, str(a)).collect()[0]
    assert (r.n_docs, r.n_agree, r.kappa_bp) == (2, 1, 0)

    # perfect agreement -> kappa exactly 10000
    b = tmp_path / "b"; b.mkdir()
    _write_docs(
        b,
        ["the and of to with", "el la de que los"],
        langs=["en", "es"],
    )
    r = QUERIES["t26_langid_kappa"](spark, str(b)).collect()[0]
    assert (r.n_docs, r.n_agree, r.kappa_bp) == (2, 2, 10000)


def test_q87_wau_covers_trailing_week(spark, tmp_path):
    def ts(day, h=12):
        return datetime.datetime(2024, 1, day, h, 0, 0)

    # u1 active day1 and day3; u2 active day3 only.  Observed range day1-3.
    #   day1: dau {u1}, wau {u1}
    #   day2: dau {},   wau {u1}           (u1's day1 covers it)
    #   day3: dau {u1,u2}, wau {u1,u2}
    _write_events(tmp_path, [(1, ts(1)), (1, ts(3)), (2, ts(3))])
    from delta_lake_spark.queries import QUERIES

    day0 = 19723  # 2024-01-01
    out = {
        r.day_idx: (r.dau, r.wau, r.stickiness_bp)
        for r in QUERIES["q87_rolling_active_users"](spark, str(tmp_path)).collect()
    }
    assert out == {
        day0: (1, 1, 10000),
        day0 + 1: (0, 1, 0),
        day0 + 2: (2, 2, 10000),
    }


def test_q86_flags_the_anomalous_week(spark, tmp_path):
    def ts(day):
        return datetime.datetime(2024, 1, day, 12, 0, 0)

    # Mondays 2024-01-01, -08, -15 with 4/4/1 events: baseline avg 3/wk,
    # |1*3-9|*2=12 > 9 flags week 3; |4*3-9|*2=6 <= 9 keeps weeks 1-2.
    rows = []
    for d, n in ((1, 4), (8, 4), (15, 1)):
        rows += [(u, ts(d)) for u in range(n)]
    _write_events(tmp_path, rows)
    from delta_lake_spark.queries import QUERIES

    r = QUERIES["q86_seasonal_deviation"](spark, str(tmp_path)).collect()
    assert len(r) == 1  # one event type, all on Mondays (dow 0)
    assert (r[0].dow, r[0].n_weeks, r[0].total_events, r[0].avg_weekly_milli,
            r[0].n_anomalous_weeks) == (0, 3, 9, 3000, 1)


def test_p04_downsampled_source_zero_copy_docs_drop(spark, tmp_path):
    # Force a genuinely downsampled source: the plan budget is 1M tokens,
    # so give src0 (w=1) MORE tokens than its budget share — repeat_bp
    # lands under 10000 and ~1/6 of its docs must contribute ZERO copies.
    # Spark's sequence(1, 0) DESCENDS ([1, 0]); without the copies >= 1
    # guard those docs would emit 2 phantom copies instead of none.
    texts, sources = [], []
    for i in range(2000):  # src0: w=1, 400k tokens total > ~333k share
        texts.append(("w" + str(i % 7) + " ") * 200)
        sources.append("src0")
    for i in range(10):    # src1: w=2, tiny -> heavy upsample
        texts.append("x y z")
        sources.append("src1")
    _write_docs(tmp_path, [t.strip() for t in texts], sources=sources)
    from delta_lake_spark.queries import QUERIES

    rows = {
        r.source: r
        for r in QUERIES["p04_mixture_materialization"](
            spark, str(tmp_path)
        ).collect()
    }
    r0 = rows["src0"]
    # downsampled: fewer materialized rows than documents (some docs got 0
    # copies), achieved mass within ~one doc of the target, never above
    # avail
    assert r0.n_rows < 2000
    assert r0.achieved_tokens < 400_000
    assert 9_000 <= r0.achieved_bp <= 11_000  # lands near the target
    assert rows["src1"].n_rows > 10  # the upsampled side multiplies
