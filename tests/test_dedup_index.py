"""Incremental near-dup dedup index (ops/dedup_index.py): batchwise
ingestion must reproduce the one-shot greedy dedup (d09) exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from delta_lake_spark.catalog import table
from delta_lake_spark.ops.dedup_index import IncrementalDedupIndex
from delta_lake_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_batchwise_equals_one_shot_d09(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents")
    want = {r.doc_id for r in QUERIES["d09_near_dedup_survivors"](spark, SF_SMOKE).collect()}

    idx = IncrementalDedupIndex(spark, str(tmp_path / "idx"))
    got: set[int] = set()
    for lo, hi in ((0, 160), (160, 340), (340, 10**9)):
        batch = docs.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        got |= {r.doc_id for r in idx.add_batch(batch, "doc_id", "text").collect()}
    assert got == want


def test_drops_against_dropped_and_within_batch(spark, tmp_path):
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        Row(doc_id=1, text=txt),
        Row(doc_id=2, text=txt),          # dup of 1 (same batch) -> dropped
        Row(doc_id=3, text="totally different words here entirely now yes"),
    ]
    idx = IncrementalDedupIndex(spark, str(tmp_path / "idx"))
    s1 = {r.doc_id for r in idx.add_batch(spark.createDataFrame(rows), "doc_id", "text").collect()}
    assert s1 == {1, 3}
    # doc 4 dups the DROPPED doc 2's text: still dropped (greedy rule keys
    # on any earlier doc, not on survivors)
    s2 = {
        r.doc_id
        for r in idx.add_batch(
            spark.createDataFrame([Row(doc_id=4, text=txt)]), "doc_id", "text"
        ).collect()
    }
    assert s2 == set()
    assert idx.seen_hwm() == 4


def test_out_of_order_batch_rejected(spark, tmp_path):
    idx = IncrementalDedupIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(
        spark.createDataFrame([Row(doc_id=10, text="one two three four")]),
        "doc_id", "text",
    )
    with pytest.raises(ValueError, match="high-water"):
        idx.add_batch(
            spark.createDataFrame([Row(doc_id=5, text="five six seven eight")]),
            "doc_id", "text",
        )


def test_short_docs_excluded_like_d09(spark, tmp_path):
    idx = IncrementalDedupIndex(spark, str(tmp_path / "idx"))
    out = idx.add_batch(
        spark.createDataFrame(
            [Row(doc_id=1, text="just two"), Row(doc_id=2, text="a b c d")]
        ),
        "doc_id", "text",
    )
    assert {r.doc_id for r in out.collect()} == {2}
