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
