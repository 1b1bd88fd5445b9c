"""Hand-computed differential tests for the wave-15 operators (q68 sweep
concurrency, q69 TWAP, t20 vocabulary richness, d19 edit re-rank) — tiny
corpora where the expected output is derivable on paper, complementing the
DuckDB oracle parity."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

_DAY0 = 19723  # 2024-01-01 as days since epoch


def _write_events(tmp_path, rows):
    events = pa.table(
        {
            "event_id": list(range(1, len(rows) + 1)),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": [r[0] for r in rows],
            "event_type": ["a"] * len(rows),
            "value": [float(r[2]) if len(r) > 2 else 1.0 for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))


def test_q68_peak_concurrency_tiny_sweep(spark, tmp_path):
    def ts(day, h, m):
        return datetime.datetime(2024, 1, day, h, m, 0)

    # u1: one session [00:00, 00:10]; u2: point session at 00:05 (concurrent
    # with u1 -> day-0 peak 2); u3: 23:50 day 1 -> 00:20 day 2 (30-min gap is
    # NOT a break: > 30min splits), so the session crosses midnight and
    # carries into day 2.
    _write_events(
        tmp_path,
        [
            (1, ts(1, 0, 0)),
            (1, ts(1, 0, 10)),
            (2, ts(1, 0, 5)),
            (3, ts(1, 23, 50)),
            (3, ts(2, 0, 20)),
        ],
    )
    from delta_lake_spark.queries import QUERIES

    out = {
        r.day_idx: (r.n_sessions, r.peak_concurrent)
        for r in QUERIES["q68_peak_concurrency"](spark, str(tmp_path)).collect()
    }
    assert out == {
        _DAY0: (3, 2),      # u1+u2 overlap at 00:05; u3 alone late evening
        _DAY0 + 1: (1, 1),  # u3's carry-over clip [00:00, 00:20]
    }


def test_q69_twap_holds_value_to_day_end(spark, tmp_path):
    def ts(h):
        return datetime.datetime(2024, 1, 1, h, 0, 0)

    # u1: 1.0 held 00:00->12:00, 3.0 held 12:00->24:00 -> twap 2.0
    # u2: single 2.0 at 18:00 held to day end -> twap 2.0 over a 6h window
    _write_events(tmp_path, [(1, ts(0), 1.0), (1, ts(12), 3.0), (2, ts(18), 2.0)])
    from delta_lake_spark.queries import QUERIES

    out = {
        (r.user_id, r.day_idx): (r.n_events, r.twap_milli)
        for r in QUERIES["q69_twap"](spark, str(tmp_path)).collect()
    }
    assert out == {(1, _DAY0): (2, 2000), (2, _DAY0): (1, 2000)}


def test_t20_vocab_richness_counts_hapax(spark, tmp_path):
    docs = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["aa aa bb", "cc cc cc"],
            "lang": ["en", "fr"],
            "source": ["s"] * 2,
            "n_chars": [8, 8],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from delta_lake_spark.queries import QUERIES

    out = {
        r.lang: (r.total_tokens, r.distinct_tokens, r.hapax_tokens, r.ttr_bp, r.hapax_share_bp)
        for r in QUERIES["t20_vocab_richness"](spark, str(tmp_path)).collect()
    }
    # en: aa aa bb -> 3 tokens, 2 types, 1 hapax; fr: cc x3 -> 3/1/0
    assert out == {"en": (3, 2, 1, 6666, 5000), "fr": (3, 1, 0, 3333, 0)}


def test_d19_identical_docs_have_zero_edit_distance(spark, tmp_path):
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [text, text.upper(), "completely different content here about ships and sails"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(text)] * 3,
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from delta_lake_spark.queries import QUERIES

    rows = {
        (r.id_a, r.id_b): (r.edit_dist, r.edit_sim_bp)
        for r in QUERIES["d19_edit_distance_rerank"](spark, str(tmp_path)).collect()
    }
    # docs 1 and 2 normalize identically -> every band collides -> candidate
    # pair with zero edits and full similarity
    assert rows[(1, 2)] == (0, 10000)
    # doc 3 shares no shingles with 1/2 -> must never pair with them
    assert (1, 3) not in rows and (2, 3) not in rows
