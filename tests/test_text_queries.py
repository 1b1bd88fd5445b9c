"""Hand-computed differential tests for the text/cohort operators added in
round 4 (t12 TF-IDF, q45 retention) — tiny corpora where the expected
output is derivable on paper, complementing the DuckDB oracle parity."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_t12_fixed_point_tfidf_on_tiny_corpus(spark, tmp_path):
    # 3 docs; "common" appears in all (idf_milli = 1000), "rare" in one
    # (idf_milli = 3000).  Terms under 3 chars are dropped.
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "common common rare",
                "common words here",
                "common words words",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [18, 17, 18],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from delta_lake_spark.queries import QUERIES

    rows = {
        (r.doc_id, r.term): (r.cnt, r.df, r.score, r.rnk)
        for r in QUERIES["t12_tfidf_top_terms"](spark, str(tmp_path)).collect()
    }
    # doc 1: rare scores 1 * (3*1000 // 1) = 3000; common 2 * 1000 = 2000
    assert rows[(1, "rare")] == (1, 1, 3000, 1)
    assert rows[(1, "common")] == (2, 3, 2000, 2)
    # doc 3: words 2 * (3000 // 2) = 3000 beats common 1000
    assert rows[(3, "words")] == (2, 2, 3000, 1)
    assert rows[(3, "common")] == (1, 3, 1000, 2)


def test_q45_retention_on_tiny_event_log(spark, tmp_path):
    # user 1 active in weeks 0 and 2; user 2 only week 0.  Cohort = the
    # Monday 2024-01-01.
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ts(day):
        return datetime.datetime(2024, 1, day, 12, 0, 0)

    events = pa.table(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pa.array([ts(1), ts(2), ts(16), ts(3)], pa.timestamp("us")),
            "user_id": [1, 1, 1, 2],
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))
    from delta_lake_spark.queries import QUERIES

    out = {
        (str(r.cohort_week), r.weeks_since): (r.n_active, r.cohort_n, r.retention_bp)
        for r in QUERIES["q45_retention_cohorts"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 2, 10000),  # both users active in cohort week
        ("2024-01-01", 2): (1, 2, 5000),   # only user 1 returns in week 2
    }


def test_q58_funnel_requires_strict_step_order(spark, tmp_path):
    # user 1: view -> click -> purchase (full conversion, 60s then 120s).
    # user 2: click BEFORE its first view, purchase before the (absent)
    #         qualifying click -> counts for 'view' only.
    # user 3: never views -> appears in no step.
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ts(minute):
        return datetime.datetime(2024, 1, 1, 12, minute, 0)

    events = pa.table(
        {
            "event_id": list(range(1, 9)),
            "ts": pa.array(
                [ts(0), ts(1), ts(3),          # user 1: view, click, purchase
                 ts(0), ts(1), ts(2),          # user 2: click, view, purchase...
                 ts(0), ts(1)],                # user 3: click, purchase
                pa.timestamp("us"),
            ),
            "user_id": [1, 1, 1, 2, 2, 2, 3, 3],
            "event_type": [
                "view", "click", "purchase",
                "click", "view", "purchase",   # purchase w/o qualifying click
                "click", "purchase",
            ],
            "value": [1.0] * 8,
            "props": ["{}"] * 8,
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))
    from delta_lake_spark.queries import QUERIES

    out = {
        r.step: (r.users, r.sum_secs)
        for r in QUERIES["q58_conversion_funnel"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "view": (2, 0),          # users 1 and 2 viewed
        "click": (1, 60),        # only user 1 clicked after viewing
        "purchase": (1, 180),    # only user 1 purchased after that click
    }


def test_s07_shards_are_dense_and_complete(spark, tmp_path):
    # 130 docs with 64-doc shards -> shards 0/1 full, shard 2 holds 2 docs;
    # every doc appears exactly once and positions are dense per shard.
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 130
    docs = pa.table(
        {
            "doc_id": list(range(n)),
            "text": [f"doc {i}" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [5] * n,
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from delta_lake_spark.queries import QUERIES

    rows = QUERIES["s07_training_shards"](spark, str(tmp_path)).collect()
    assert sorted(r.doc_id for r in rows) == list(range(n))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    assert {s: sorted(p) for s, p in by_shard.items()} == {
        0: list(range(64)),
        1: list(range(64)),
        2: [0, 1],
    }
