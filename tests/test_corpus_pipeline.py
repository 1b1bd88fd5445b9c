"""End-to-end incremental corpus pipeline (pipeline/corpus.py):
gate -> dedup -> leakage-safe split -> partitioned corpus, across batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.pipeline.corpus import CorpusPipeline
from tests.conftest import SF_SMOKE


@pytest.mark.full  # >13s multi-process/stream differential: round-close tier
def test_corpus_pipeline_end_to_end(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents")
    # min_quality=60: the smoke corpus has a 50s-score band (32 docs)
    # that must route to quarantine
    p = CorpusPipeline(spark, str(tmp_path / "corpus"), min_quality=60)

    r1 = p.ingest_batch(docs.filter("doc_id < 250"), batch_id=1)
    r2 = p.ingest_batch(docs.filter("doc_id >= 250"), batch_id=2)
    assert not r1["replayed"] and not r2["replayed"]
    # conservation per batch: in = quarantined + deduped + admitted
    for r in (r1, r2):
        assert r["n_in"] == r["n_quarantined"] + r["n_deduped"] + r["n_admitted"]

    corpus = p.corpus.read()
    n = corpus.count()
    assert n == r1["n_admitted"] + r2["n_admitted"] and n > 0

    # invariant 1: no admitted doc fails the quality gate
    assert corpus.filter(F.col("quality") < p.min_quality).isEmpty()
    # invariant 2: no fingerprint straddles splits (leakage-safe)
    straddle = (
        corpus.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter("ns > 1")
    )
    assert straddle.isEmpty()
    # invariant 3: corpus is split-partitioned (pruning works)
    live, total = p.corpus.pruned_file_count([("split", "=", "train")])
    assert live < total

    # replaying a committed batch is a no-op end to end
    v = p.corpus.latest_version()
    r = p.ingest_batch(docs.filter("doc_id >= 250"), batch_id=2)
    assert r["replayed"] and p.corpus.latest_version() == v

    # quarantine holds exactly the gate failures, tagged by batch
    q = p.quarantine.read()
    assert q.count() == r1["n_quarantined"] + r2["n_quarantined"]
    assert set(r["_batch_id"] for r in q.select("_batch_id").distinct().collect()) <= {1, 2}

    # stats() aggregates the corpus by split
    st = {r.split: r.n_docs for r in p.stats().collect()}
    assert sum(st.values()) == n


@pytest.mark.full  # >13s multi-process/stream differential: round-close tier
def test_stream_ingest_matches_batch_pipeline(spark, tmp_path):
    """The streaming front door (foreachBatch over the landing dir) must
    leave EXACTLY the corpus, quarantine, and dedup-index state the
    batch-wise ingest_batch calls produce, and a checkpoint-resumed rerun
    with nothing new landed must change nothing."""
    import os
    import time

    docs = table(spark, SF_SMOKE, "documents")
    b1 = docs.filter("doc_id < 250")
    b2 = docs.filter("doc_id >= 250")

    landing = tmp_path / "landing"
    landing.mkdir()
    # one file per micro-batch, mtime-ordered so file->batch order is the
    # same doc_id order the batch path uses
    b1.coalesce(1).write.parquet(str(landing / "b1"))
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(str(landing / "b2"))

    streamed = CorpusPipeline(spark, str(tmp_path / "streamed"), min_quality=60)
    q = streamed.stream_ingest(
        str(landing) + "/*", docs.schema, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch = CorpusPipeline(spark, str(tmp_path / "batch"), min_quality=60)
    batch.ingest_batch(b1, batch_id=1)
    batch.ingest_batch(b2, batch_id=2)

    s_corpus = streamed.corpus.read().orderBy("doc_id")
    b_corpus = batch.corpus.read().orderBy("doc_id")
    assert s_corpus.collect() == b_corpus.collect()
    assert streamed.quarantine.read().count() == batch.quarantine.read().count()

    # resume with nothing landed: no new corpus version
    v = streamed.corpus.latest_version()
    q2 = streamed.stream_ingest(
        str(landing) + "/*", docs.schema, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert streamed.corpus.latest_version() == v


def test_stream_ingest_rejects_out_of_order_landing(spark, tmp_path):
    """ADVICE r4: the dedup index's id-ordering precondition must be
    ENFORCED on the stream path, not just documented — a landing file whose
    doc_ids fall at or below the index high-water mark must fail the stream
    before any side effect (no quarantine rows, no corpus commit for the
    bad batch)."""
    import time

    from py4j.protocol import Py4JJavaError
    import pytest

    docs = table(spark, SF_SMOKE, "documents")
    hi = docs.filter("doc_id >= 250")
    lo = docs.filter("doc_id < 250")

    landing = tmp_path / "landing"
    landing.mkdir()
    # files land in REVERSE doc_id order (high ids first)
    hi.coalesce(1).write.parquet(str(landing / "b1"))
    time.sleep(1.1)
    lo.coalesce(1).write.parquet(str(landing / "b2"))

    p = CorpusPipeline(spark, str(tmp_path / "oo"), min_quality=60)
    q = p.stream_ingest(str(landing) + "/*", docs.schema, str(tmp_path / "ckpt"))
    with pytest.raises(Exception) as ei:
        q.awaitTermination(120)
    assert "out of doc_id order" in str(ei.value)

    # batch 1 (the high-id file) committed; the out-of-order batch 2 left
    # no trace — corpus max version is batch 1's, quarantine only batch 1's
    assert p.corpus.read().agg(F.min("doc_id")).first()[0] >= 250
    qr = p.quarantine.read()
    assert qr.filter("_batch_id = 2").isEmpty()
