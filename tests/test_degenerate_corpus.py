"""Adversarial-corpus parity: the text/dedup/curation query families must
match their DuckDB oracles on DEGENERATE documents, not just the generated
corpus.

Why this exists (round 7): the shingle kernel's ``sequence(1,
greatest(size-2, 0))`` produces a DESCENDING ``[1, 0]`` in Spark when a
document has fewer than 3 normalized tokens (DuckDB's ``range(1, 1)`` is
empty), so a document like ``"a.b !!! ??"`` — 3 raw tokens, 2 after
normalization — CRASHED every shingle-based query with
INVALID_ARRAY_INDEX_IN_ELEMENT_AT.  The driver's corpus never contains such
documents, so the standard parity sweep could not see it; a 100 TB web crawl
absolutely would.  This suite runs the affected queries end-to-end on a
corpus built from exactly those edge shapes, against the same DuckDB oracle
gate the driver uses.

The corpus deliberately covers, for every hazard found in the round-7 audit:
- punctuation-joined tokens (raw count < normalized count: ``a.b.c``)
- punctuation-only tokens   (raw count > normalized count: ``!!! ?? ...``)
- empty / whitespace-only text
- single-character words (bigram kernels: ``sequence(1, 0)`` over chars)
- 1- and 2-token documents (below every n-gram window)
- normal documents that near-dup each other (the graph must still form)

FIXTURE-CHANGE RULE (r9): edits here require a same-session green sweep
stamped via ``python tools/stamp_degenerate.py`` (see
tests/degenerate_fixtures.stamp and tests/test_degenerate_stamp.py).
"""

from __future__ import annotations

import os
import shutil

import pytest

# Full tier (VERDICT r9 item 1): the degenerate-corpus differential sweeps
# are round-close evidence, not the driver-facing fast gate.
pytestmark = pytest.mark.full


from delta_lake_spark.catalog import TABLES
from delta_lake_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_one, duck_connection

# Every oracle-backed query whose plan tokenizes/shingles document text.
# (Embedding/vector and relational families read other tables and are
# unaffected by document-text degeneracy; they stay in the main sweep.)
TEXT_QUERIES = sorted(
    name
    for name in ORACLE
    if name.startswith(
        # documents-derived families (text/dedup/curation/sampling + the
        # multimodal payloads synthesized from document bytes) and the
        # embedding-derived vector family — the fixture plants degenerate
        # rows in BOTH tables
        ("d0", "d1", "d2", "t0", "t1", "t2", "t3", "p0", "s0", "s1", "m0", "v0", "v1", "v2")
    )
)

_BASE_DOC = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the dog dreams of chasing rabbits through "
    "green fields all day long"
)

_DEGENERATE_TEXTS = [
    "",                          # empty
    "   ",                       # whitespace only
    "!!! ??? ...",               # 3 raw tokens, 0 normalized
    "a.b !!! ??",                # 3 raw tokens, 1 normalized token ("a b" -> 2)
    "a.b.c",                     # 1 raw token, 3 normalized
    "x",                         # single 1-char word
    "a i o u e",                 # five 1-char words (bigram kernels)
    "hello world",               # 2 tokens: below the 3-shingle window
    "one",                       # 1 token
    "...a...",                   # 1 normalized token from punctuation shell
    "word word word word",       # repetition, 4 tokens
    "ab",                        # 2-char doc (char-trigram kernels)
    "ééé café naïve",  # non-ascii -> normalization strips
    "1 2 3 4 5",                 # digit tokens
    "a-b c-d e-f",               # hyphenated: 3 raw, 6 normalized
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """sf-dir clone of sf0.001 with documents replaced by the adversarial
    corpus: degenerate rows + enough normal rows that every pipeline stage
    (LSH banding, quality gates, splits, packing) still has data."""
    out = str(tmp_path_factory.mktemp("degen_sf"))
    for t in TABLES:
        if t != "documents":
            shutil.copy(
                os.path.join(SF_SMOKE, f"{t}.parquet"),
                os.path.join(out, f"{t}.parquet"),
            )
    rows = []
    langs = ["en", "de", "fr"]
    # source names follow the driver corpus's srcN convention — mixture
    # queries (p04/s12) parse the numeric suffix as part of the contract
    sources = ["src0", "src1", "src2"]
    for i, txt in enumerate(_DEGENERATE_TEXTS):
        rows.append(
            (i, txt, langs[i % len(langs)], sources[i % len(sources)], len(txt))
        )
    # normal docs, including exact and near duplicates so dedup graphs form
    next_id = len(_DEGENERATE_TEXTS)
    for j in range(40):
        words = _BASE_DOC.split()
        if j % 4 == 1:
            words = words[:-1] + ["variant"]
        elif j % 4 == 2:
            words = list(reversed(words))
        elif j % 4 == 3:
            words = words + [f"suffix{j}"]
        txt = " ".join(words)
        rows.append(
            (
                next_id + j,
                txt,
                langs[j % len(langs)],
                sources[j % len(sources)],
                len(txt),
            )
        )
    # single parquet FILE (pyarrow), matching the driver corpus layout —
    # duck_connection points read_parquet at '<dir>/documents.parquet'
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        os.path.join(out, "documents.parquet"),
    )

    # embeddings: the REAL sf0.001 vectors (so LSH buckets / IVF lists /
    # label structure stay populated) plus adversarial rows a web-scale
    # embedding table absolutely contains: the all-zero vector (cosine
    # 0/0), denormal-tiny and huge magnitudes (float32 under/overflow in
    # norm folds), an exact duplicate and an exact negation of vector 0,
    # and a constant vector.
    emb = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    dim = len(emb.column("embedding")[0].as_py())
    base_vec = emb.column("embedding")[0].as_py()
    next_vid = max(v.as_py() for v in emb.column("vec_id")) + 1
    adv_rows = [
        (next_vid + 0, [0.0] * dim, 3),                       # zero vector
        (next_vid + 1, [1e-30] * dim, 4),                     # denormal-tiny
        (next_vid + 2, [1e30] * dim, 5),                      # huge magnitude
        (next_vid + 3, list(base_vec), 6),                    # exact duplicate
        (next_vid + 4, [-x for x in base_vec], 7),            # exact negation
        (next_vid + 5, [0.5] * dim, 8),                       # constant vector
    ]
    adv = pa.table(
        {
            "vec_id": pa.array([r[0] for r in adv_rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in adv_rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in adv_rows], pa.int32()),
        }
    )
    pq.write_table(
        pa.concat_tables([emb.cast(adv.schema), adv]),
        os.path.join(out, "embeddings.parquet"),
    )
    return out


@pytest.fixture(scope="module")
def degen_duck(degenerate_dir):
    con = duck_connection(degenerate_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_degenerate_parity(spark, degen_duck, degenerate_dir, name):
    res = compare_one(
        spark, degen_duck, name, QUERIES[name], ORACLE[name], degenerate_dir
    )
    assert res.ok, f"{name}: {res.detail}"


def test_stream_ingest_matches_batch_on_degenerate_corpus(
    spark, degenerate_dir, tmp_path
):
    """§2.9 extension of the adversarial program (r8): the streaming corpus
    front door must leave EXACTLY the state the batch-wise path produces on
    crawl-quality input — empty / punctuation-only / sub-window documents
    must quarantine or dedup identically whether they arrive as a landed
    file in a micro-batch or as a batch DataFrame, with no stream-side
    crash (the stream path runs the same gate/fingerprint/shingle kernels
    the r7 hardening fixed)."""
    import time

    from delta_lake_spark.catalog import table
    from delta_lake_spark.pipeline.corpus import CorpusPipeline

    docs = table(spark, degenerate_dir, "documents")
    b1 = docs.filter("doc_id < 20")   # all 15 degenerate rows + 5 normal
    b2 = docs.filter("doc_id >= 20")

    landing = tmp_path / "landing"
    landing.mkdir()
    b1.coalesce(1).write.parquet(str(landing / "b1"))
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(str(landing / "b2"))

    streamed = CorpusPipeline(spark, str(tmp_path / "streamed"), min_quality=60)
    q = streamed.stream_ingest(
        str(landing) + "/*", docs.schema, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch = CorpusPipeline(spark, str(tmp_path / "batch"), min_quality=60)
    r1 = batch.ingest_batch(b1, batch_id=1)
    r2 = batch.ingest_batch(b2, batch_id=2)
    # conservation holds on degenerate input too
    for r in (r1, r2):
        assert r["n_in"] == r["n_quarantined"] + r["n_deduped"] + r["n_admitted"]

    s_corpus = streamed.corpus.read().orderBy("doc_id").collect()
    b_corpus = batch.corpus.read().orderBy("doc_id").collect()
    assert s_corpus == b_corpus
    s_quar = streamed.quarantine.read().orderBy("doc_id").drop("_batch_id").collect()
    b_quar = batch.quarantine.read().orderBy("doc_id").drop("_batch_id").collect()
    assert s_quar == b_quar
    # the degenerate rows were actually exercised: every empty/whitespace/
    # punctuation-only doc must be somewhere (quarantine or dedup), and at
    # least one must have been gated out
    assert len(b_quar) > 0
