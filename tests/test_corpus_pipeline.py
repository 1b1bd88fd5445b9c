"""End-to-end incremental corpus pipeline (pipeline/corpus.py):
gate -> dedup -> leakage-safe split -> partitioned corpus, across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.pipeline.corpus import CorpusPipeline
from tests.conftest import SF_SMOKE


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
