"""Hand-computed differential tests for the wave-17 operators (q91 market
basket, q92 retention cohorts, q93 RFM segmentation, q94 repurchase
intervals, t28 lexical diversity, s14 Neyman allocation, v19 PQ shortlist
rerank) — tiny corpora where the expected output is derivable on paper,
complementing the DuckDB oracle parity."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _d(y, m, day):
    return datetime.datetime(y, m, day)


def _write_orders(tmp_path, rows):
    """rows: (orderkey, custkey, totalprice, date)"""
    orders = pa.table(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": [float(r[2]) for r in rows],
            "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))


def _write_lineitem(tmp_path, rows):
    """rows: (orderkey, partkey)"""
    li = pa.table(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
            "l_suppkey": [1] * len(rows),
            "l_linenumber": pa.array(range(1, len(rows) + 1), pa.int32()),
            "l_quantity": [1.0] * len(rows),
            "l_extendedprice": [10.0] * len(rows),
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": pa.array(
                [_d(2024, 1, 2)] * len(rows), pa.timestamp("us")
            ),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))


def _write_docs(tmp_path, texts, sources, n_chars=None):
    docs = pa.table(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources,
            "n_chars": n_chars or [len(t) for t in texts],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))


def test_q91_pair_lift_hand_computed(spark, tmp_path):
    # orders 1,2 both buy {10,20}; order 3 buys {10,30}; order 4 buys {40}.
    # Only (10,20) co-occurs >=2x.  N=4, c10=3, c20=2:
    #   support_bp = 10000*2/4 = 5000
    #   lift_milli = 1000*2*4 / (3*2) = 1333
    _write_lineitem(
        tmp_path,
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30), (4, 40)],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q91_market_basket_lift"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(10, 20, 2, 5000, 1333)]


def test_q91_duplicate_lines_count_once(spark, tmp_path):
    # the same part twice in one order is ONE basket item
    _write_lineitem(tmp_path, [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)])
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q91_market_basket_lift"](spark, str(tmp_path)).collect()
    # N=2, c10=2, c20=2, pair (10,20)=2: lift = 1000*2*2/(2*2) = 1000
    assert [tuple(r) for r in rows] == [(10, 20, 2, 10000, 1000)]


def test_q92_retention_matrix_hand_computed(spark, tmp_path):
    # c1: Jan'24, Feb'24, Apr'24; c2: Jan'24 only; c3: Feb'24 x2, Mar'24.
    _write_orders(
        tmp_path,
        [
            (1, 1, 10.0, _d(2024, 1, 5)),
            (2, 1, 10.0, _d(2024, 2, 9)),
            (3, 1, 10.0, _d(2024, 4, 1)),
            (4, 2, 10.0, _d(2024, 1, 20)),
            (5, 3, 10.0, _d(2024, 2, 2)),
            (6, 3, 10.0, _d(2024, 2, 25)),
            (7, 3, 10.0, _d(2024, 3, 3)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q92_retention_cohorts"](spark, str(tmp_path)).collect()
    got = [tuple(r) for r in rows]
    assert got == [
        (2024, 1, 0, 2, 10000),
        (2024, 1, 1, 1, 5000),
        (2024, 1, 3, 1, 5000),
        (2024, 2, 0, 1, 10000),
        (2024, 2, 1, 1, 10000),
    ]


def test_q93_distinct_rfm_maps_to_diagonal(spark, tmp_path):
    # customer k has k orders of 10.00 each, last order on day k ->
    # recency, frequency, monetary all rank k among n=5 ->
    # every score = ((k-1)*5) div 5 + 1 = k; segment_cents = k*1000.
    rows, ok = [], 1
    for k in range(1, 6):
        for j in range(k):
            rows.append((ok, k, 10.0, _d(2024, 1, k - j)))
            ok += 1
    _write_orders(tmp_path, rows)
    from delta_lake_spark.queries import QUERIES

    out = QUERIES["q93_rfm_segments"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in out] == [
        (k, k, k, 1, k * 1000) for k in range(1, 6)
    ]


def test_q94_interval_buckets_hand_computed(spark, tmp_path):
    # c1: two same-day orders, then +3d, then +37d; c2: +400d.
    _write_orders(
        tmp_path,
        [
            (1, 1, 10.0, _d(2024, 1, 1)),
            (2, 1, 10.0, _d(2024, 1, 1)),
            (3, 1, 10.0, _d(2024, 1, 4)),
            (4, 1, 10.0, _d(2024, 2, 10)),
            (5, 2, 10.0, _d(2023, 1, 1)),
            (6, 2, 10.0, _d(2024, 2, 5)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q94_repurchase_intervals"](spark, str(tmp_path)).collect()
    got = {r.bucket: (r.n_intervals, r.min_days, r.max_days, r.share_bp) for r in rows}
    assert got == {
        "a_same_day": (1, 0, 0, 2500),
        "b_week": (1, 3, 3, 2500),
        "d_quarter": (1, 37, 37, 2500),
        "f_over_year": (1, 400, 400, 2500),
    }


def test_t28_ttr_hand_computed(spark, tmp_path):
    # source A: "a b a" (2/3 -> 666 milli), "x x x x" (1/4 -> 250 milli);
    #   corpus: 7 tokens, vocab {a,b,x}=3 -> 4285 bp; doc mean (666+250)//2=458
    # source B: "p q" -> 1000 milli, corpus 10000 bp.
    _write_docs(tmp_path, ["a b a", "x x x x", "p q"], ["A", "A", "B"])
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["t28_lexical_diversity"](spark, str(tmp_path)).collect()
    got = [tuple(r) for r in rows]
    assert got == [
        ("A", 2, 7, 3, 4285, 458),
        ("B", 1, 2, 2, 10000, 1000),
    ]


def test_s14_zero_variance_stratum_gets_nothing(spark, tmp_path):
    # A: n_chars [10,10] -> sd 0 -> weight 0 -> alloc 0
    # B: n_chars [10,20] -> pop sd 5 -> sd_milli 5000, weight 2*5000
    _write_docs(
        tmp_path,
        ["aaaaaaaaaa", "bbbbbbbbbb", "cccccccccc", "dddddddddd"],
        ["A", "A", "B", "B"],
        n_chars=[10, 10, 10, 20],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["s14_neyman_allocation"](spark, str(tmp_path)).collect()
    got = [tuple(r) for r in rows]
    assert got == [
        ("A", 2, 0, 0, 0),
        ("B", 2, 5000, 1000, 10000),
    ]


def _numpy_pq_rerank(emb, nq=5, k=8, subs=8, subdim=8, shortlist=50, scale=1_000_000):
    """Integer replication of the v19 pipeline: quantize, static codebook
    (first k vectors), encode, ADC, shortlist, exact rerank."""
    q = np.floor(emb.astype(np.float64) * scale).astype(np.int64)
    cb = q[:k]  # (k, dim)
    n = q.shape[0]
    # codes[i][s] = argmin_c sum((q[i,sub]-cb[c,sub])^2), ties -> lower c
    codes = np.zeros((n, subs), dtype=np.int64)
    for s in range(subs):
        sl = slice(s * subdim, (s + 1) * subdim)
        d = ((q[:, None, sl] - cb[None, :, sl]) ** 2).sum(axis=2)  # (n, k)
        codes[:, s] = d.argmin(axis=1)  # argmin takes first (lowest c) on ties
    out = []
    for qid in range(nq):
        lut = np.zeros((subs, k), dtype=np.int64)
        for s in range(subs):
            sl = slice(s * subdim, (s + 1) * subdim)
            lut[s] = ((q[qid, sl][None, :] - cb[:, sl]) ** 2).sum(axis=1)
        adc = np.array(
            [lut[np.arange(subs), codes[v]].sum() for v in range(n)], dtype=np.int64
        )
        cands = [v for v in range(n) if v != qid]
        cands.sort(key=lambda v: (adc[v], v))
        short = cands[:shortlist]
        exact = {v: int(((q[qid] - q[v]) ** 2).sum()) for v in short}
        short.sort(key=lambda v: (exact[v], v))
        for rank, v in enumerate(short[:10], start=1):
            out.append((qid, v, exact[v], rank))
    return out


def test_v19_matches_numpy_differential(spark):
    sf = "/root/testdata/sf0.001"
    emb_tbl = pq.read_table(f"{sf}/embeddings.parquet")
    ids = emb_tbl.column("vec_id").to_numpy()
    order = np.argsort(ids)
    emb = np.stack(
        [np.asarray(x, dtype=np.float32) for x in emb_tbl.column("embedding").to_pylist()]
    )[order]
    expected = _numpy_pq_rerank(emb)

    from delta_lake_spark.queries import QUERIES

    got = [
        (r.qid, r.vid, r.exact_dist, r.rank)
        for r in QUERIES["v19_pq_shortlist_rerank"](spark, sf).collect()
    ]
    assert got == expected


def _write_embeddings(tmp_path, vecs):
    """vecs: dict vec_id -> 64-float list"""
    emb = pa.table(
        {
            "vec_id": list(vecs),
            "embedding": pa.array(
                [vecs[k] for k in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))


def test_v20_radius_membership_hand_computed(spark, tmp_path):
    # query 0 is the unit vector along dim 63 (a zero-vector query would be
    # excluded by the round-7 embedding validity gate — zero-norm rows are
    # invalid input engine-wide); every candidate shares that dim-63
    # component, so the pairwise L2 distances reduce to the dim-0
    # displacements exactly as before: 0.001 (dist 1e6, in), 1.0 (1e12,
    # in), 2.0 (4e12, out of 1.45e12).
    z = [0.0] * 63 + [1.0]
    _write_embeddings(
        tmp_path,
        {
            0: z,
            10: [0.001] + z[1:],
            11: [1.0] + z[1:],
            12: [2.0] + z[1:],
        },
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["v20_range_search"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [
        (0, 10, 1_000_000),
        (0, 11, 1_000_000_000_000),
    ]


def test_q95_two_supplier_monopoly_vs_duopoly(spark, tmp_path):
    # nation A: s1 has 75% (300c) and s2 25% (100c) of revenue ->
    # hhi = 7500^2 + 2500^2 = 62_500_000, top 7500.
    nation = pa.table(
        {
            "n_nationkey": [1],
            "n_name": ["ALPHA"],
            "n_regionkey": [0],
            "n_comment": [""],
        }
    )
    pq.write_table(nation, str(tmp_path / "nation.parquet"))
    supplier = pa.table(
        {
            "s_suppkey": [1, 2],
            "s_name": ["s1", "s2"],
            "s_nationkey": [1, 1],
        }
    )
    pq.write_table(supplier, str(tmp_path / "supplier.parquet"))
    li = pa.table(
        {
            "l_orderkey": [1, 2],
            "l_partkey": [1, 1],
            "l_suppkey": [1, 2],
            "l_linenumber": pa.array([1, 1], pa.int32()),
            "l_quantity": [1.0, 1.0],
            "l_extendedprice": [3.0, 1.0],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": pa.array([_d(2024, 1, 2)] * 2, pa.timestamp("us")),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q95_supplier_hhi"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [("ALPHA", 2, 400, 62_500_000, 7500)]


def test_q96_pareto_head_count(spark, tmp_path):
    # revenues 70/20/10: the 80% head is {70, 20} (pre-inclusion cumsum
    # 0 and 70 both < 80), the 10 sits outside -> top_n 2 of 3 (6666 bp).
    _write_orders(
        tmp_path,
        [
            (1, 1, 70.0, _d(2024, 1, 1)),
            (2, 2, 20.0, _d(2024, 1, 2)),
            (3, 3, 10.0, _d(2024, 1, 3)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q96_pareto_customers"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(3, 2, 6666)]


def test_m07_shared_chunk_dedups(spark, tmp_path):
    # 'A'*64+'B'*64 and 'A'*64 share the A-chunk (media 'video', ascii 65):
    # logical 3 chunks / 192 B, physical 2 / 128 B -> saving 3334 bp.
    # 'C'*100 (media 'audio', ascii 67) splits 64+36 with no sharing.
    _write_docs(
        tmp_path,
        ["A" * 64 + "B" * 64, "A" * 64, "C" * 100],
        ["s1", "s1", "s2"],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["m07_chunk_dedup_report"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [
        ("audio", 2, 2, 100, 100, 0),
        ("video", 3, 2, 192, 128, 3334),
    ]


def test_q97_migration_with_new_and_lapsed(spark, tmp_path):
    # early: c1 10.00, c2 20.00 -> scores 1, 3 (n=2); late: c2 10.00,
    # c3 30.00 -> scores 1, 3.  c1 lapses (late 0), c3 is new (early 0).
    _write_orders(
        tmp_path,
        [
            (1, 1, 10.0, _d(1995, 3, 1)),
            (2, 2, 20.0, _d(1995, 6, 1)),
            (3, 2, 10.0, _d(1997, 3, 1)),
            (4, 3, 30.0, _d(1997, 6, 1)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q97_segment_migration"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(0, 3, 1), (1, 0, 1), (3, 1, 1)]


def test_q98_same_month_repeat_is_new(spark, tmp_path):
    # c1: Jan 10.00 then Feb 20.00 (returning); c2: two Feb 5.00 orders —
    # both in the first month, so both count as NEW revenue.
    _write_orders(
        tmp_path,
        [
            (1, 1, 10.0, _d(2024, 1, 5)),
            (2, 1, 20.0, _d(2024, 2, 5)),
            (3, 2, 5.0, _d(2024, 2, 1)),
            (4, 2, 5.0, _d(2024, 2, 20)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q98_new_vs_returning"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [
        (202401, 1000, 0, 1, 0, 10000),
        (202402, 1000, 2000, 2, 1, 3333),
    ]


def test_q99_band_is_bit_length(spark, tmp_path):
    # cents 1 -> band 1 (low 1); 2 and 3 -> band 2 (low 2); 127 -> band 7
    # (low 64); a zero-price order is excluded.
    _write_orders(
        tmp_path,
        [
            (1, 1, 0.01, _d(2024, 1, 1)),
            (2, 1, 0.02, _d(2024, 1, 2)),
            (3, 1, 0.03, _d(2024, 1, 3)),
            (4, 1, 1.27, _d(2024, 1, 4)),
            (5, 1, 0.0, _d(2024, 1, 5)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q99_value_bands"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [
        (1, 1, 1, 1, 1, 2500),
        (2, 2, 2, 2, 3, 5000),
        (7, 64, 1, 127, 127, 2500),
    ]


def test_q100_even_split_flags_low_top_share(spark, tmp_path):
    # c1 places 40.00 + 60.00 in one week (top 6000 bp) and a lone 99.00
    # in another (not flagged); c2 has three 10.00 orders in one week
    # (top 3333 bp).  Week boundary: 1970-01-01 is day 0, weeks are
    # floor(epoch_day / 7).
    _write_orders(
        tmp_path,
        [
            (1, 1, 40.0, _d(2024, 1, 1)),
            (2, 1, 60.0, _d(2024, 1, 2)),
            (3, 1, 99.0, _d(2024, 3, 1)),
            (4, 2, 10.0, _d(2024, 1, 8)),
            (5, 2, 10.0, _d(2024, 1, 9)),
            (6, 2, 10.0, _d(2024, 1, 10)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q100_order_splitting"](spark, str(tmp_path)).collect()
    got = [(r.custkey, r.n_orders, r.total_cents, r.top_order_bp) for r in rows]
    assert got == [(1, 2, 10000, 6000), (2, 3, 3000, 3333)]


def test_t29_fertility_hand_computed(spark, tmp_path):
    # "abcd efghi" -> words 2, subwords ceil(4/4)+ceil(5/4) = 1+2 = 3,
    # chars 9: fertility 15000 bp, 4500 milli chars/word, 3000 /subword.
    _write_docs(tmp_path, ["abcd efghi"], ["s"])
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["t29_tokenizer_fertility"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [("en", 2, 3, 15000, 4500, 3000)]


def test_q101_triangle_plus_tail_coefficients(spark, tmp_path):
    # Graph: triangle {1,2,3} (each order pairs two parts) plus tail 3-4.
    # cc(1)=cc(2)=1.0 (deg 2, 1 triangle); cc(3)=2*1/(3*2)=3333bp (deg 3);
    # cc(4)=deg 1 -> excluded.
    _write_lineitem(
        tmp_path,
        [(1, 1), (1, 2), (2, 2), (2, 3), (3, 1), (3, 3), (4, 3), (4, 4)],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q101_clustering_coefficient"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [
        (1, 2, 1, 10000),
        (2, 2, 1, 10000),
        (3, 3, 1, 3333),
    ]


def test_q102_uniform_table_has_zero_contrib(spark, tmp_path):
    # two priorities x two segments, perfectly balanced -> every cell's
    # observed == expected, all contributions 0.
    import pyarrow as _pa

    cust = _pa.table(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": [1, 1],
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["S1", "S2"],
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    rows = []
    ok = 1
    for cust_k, seg in ((1, "S1"), (2, "S2")):
        for pri in ("1-URGENT", "2-HIGH"):
            rows.append((ok, cust_k, 10.0, _d(2024, 1, 1), pri))
            ok += 1
    orders = _pa.table(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": _pa.array([r[3] for r in rows], _pa.timestamp("us")),
            "o_orderpriority": [r[4] for r in rows],
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    from delta_lake_spark.queries import QUERIES

    out = QUERIES["q102_priority_segment_chi2"](spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r.observed == 1 and r.expected_milli == 1000 and r.contrib_milli == 0


def test_q103_digits_and_constants(spark, tmp_path):
    # cents 19 (digit 1), 19 (1), 250 (2), 9.00->900 (9): shares 5000 /
    # 2500 / 2500 bp against the Benford constants 3010 / 1760 / 457.
    _write_orders(
        tmp_path,
        [
            (1, 1, 0.19, _d(2024, 1, 1)),
            (2, 1, 0.19, _d(2024, 1, 2)),
            (3, 1, 2.50, _d(2024, 1, 3)),
            (4, 1, 9.00, _d(2024, 1, 4)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q103_benford_screen"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [
        (1, 2, 5000, 3010, 1990),
        (2, 1, 2500, 1760, 740),
        (9, 1, 2500, 457, 2043),
    ]


def test_q104_regular_cadence_beats_irregular(spark, tmp_path):
    # c1 orders every 10 days (gaps 10,10,10 -> cv 0); c2 gaps 5,15 ->
    # sd/mean = sqrt(2*250-400)/20 = 10/20 -> 500 milli.
    _write_orders(
        tmp_path,
        [
            (1, 1, 10.0, _d(2024, 1, 1)),
            (2, 1, 10.0, _d(2024, 1, 11)),
            (3, 1, 10.0, _d(2024, 1, 21)),
            (4, 1, 10.0, _d(2024, 1, 31)),
            (5, 2, 10.0, _d(2024, 1, 1)),
            (6, 2, 10.0, _d(2024, 1, 6)),
            (7, 2, 10.0, _d(2024, 1, 21)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q104_order_cadence"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(1, 4, 10, 0), (2, 3, 10, 500)]


def test_q105_triple_support(spark, tmp_path):
    # orders 1,2 both contain {10,20,30}; order 3 has {10,20,40}:
    # only (10,20,30) reaches 2 baskets; N=3 -> support 6666 bp.
    _write_lineitem(
        tmp_path,
        [
            (1, 10), (1, 20), (1, 30),
            (2, 10), (2, 20), (2, 30),
            (3, 10), (3, 20), (3, 40),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["q105_frequent_triples"](spark, str(tmp_path)).collect()
    assert [tuple(r) for r in rows] == [(10, 20, 30, 2, 6666)]


def test_s15_duplicates_share_folds_and_shares_sum(spark, tmp_path):
    # "Near-identical" docs (same canonical form: case/punct differences)
    # must land in ONE fold; doc counts conserve.
    texts = (
        ["alpha beta gamma", "ALPHA beta,, gamma!!"]  # same fingerprint
        + [f"doc number {i} words here" for i in range(30)]
    )
    _write_docs(tmp_path, texts, ["s"] * len(texts))
    from delta_lake_spark.queries import QUERIES
    from delta_lake_spark.catalog import table as _t
    from delta_lake_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    rows = QUERIES["s15_kfold_assignment"](spark, str(tmp_path)).collect()
    assert sum(r.n_docs for r in rows) == len(texts)

    d = _t(spark, str(tmp_path), "documents").filter(
        F.col("doc_id").isin(1, 2)
    ).select(fingerprint("text").alias("fp"))
    fps = [r.fp for r in d.collect()]
    assert fps[0] == fps[1]  # identical canonical form -> identical fold key
