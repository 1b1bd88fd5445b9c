"""Partitioned lakehouse ANN index (ops/vector_index.py): build/query
equivalence with the inline primitives, incremental upsert semantics, and
the partition-pruned probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_spark.functions.similarity import (
    as_double,
    cosine,
    qdot,
    quantize_int8,
)
from delta_lake_spark.ops.vector_index import VectorIndex, sign_bucket
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    ix = VectorIndex(spark, str(tmp_path_factory.mktemp("vix") / "t"))
    ix.build(emb)
    return ix


def _reference_ann(emb, queries, k=10, nprobe=1, coarse_c=40):
    """Same algorithm straight over the in-memory frame (no index table)."""
    flips = [0] + [2**j for j in range(nprobe - 1)]
    base = emb.select(
        "vec_id",
        sign_bucket(F.col("embedding")).alias("bucket"),
        quantize_int8(F.col("embedding")).alias("q"),
        "embedding",
    )
    q = queries.select(
        F.col("vec_id").alias("qid"),
        sign_bucket(F.col("embedding")).alias("qbucket"),
        quantize_int8(F.col("embedding")).alias("qq"),
        F.col("embedding").alias("qvec"),
    )
    probes = q.select(
        "qid", "qbucket", "qq", "qvec",
        F.explode(F.array(*[F.lit(f) for f in flips])).alias("f"),
    ).withColumn("bucket", F.col("qbucket").bitwiseXOR(F.col("f")))
    w1 = Window.partitionBy("qid").orderBy(F.desc("qscore"), "vid")
    coarse = (
        base.join(probes.select("qid", "qq", "bucket"), "bucket")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", F.col("vec_id").alias("vid"), qdot("qq", "q").alias("qscore"))
        .withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= coarse_c)
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("sim"), "vid")
    return (
        coarse.join(base.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("cvec")), "vid")
        .join(q.select("qid", "qvec"), "qid")
        .withColumn("sim", cosine(as_double(F.col("qvec")), as_double(F.col("cvec"))))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "qscore", "sim", "rank")
    )


@pytest.mark.parametrize("nprobe", [1, 3])
def test_query_matches_inline_algorithm(spark, emb, index, nprobe):
    queries = emb.filter(F.col("vec_id") < 5)
    got = index.query(queries, k=10, nprobe=nprobe).collect()
    want = (
        _reference_ann(emb, queries, k=10, nprobe=nprobe)
        .orderBy("qid", "rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_incremental_upsert_adds_and_moves(spark, emb, tmp_path):
    ix = VectorIndex(spark, str(tmp_path / "t"))
    ix.build(emb.filter(F.col("vec_id") < 400))
    # new vectors appear after upsert
    ix.upsert(emb.filter(F.col("vec_id") >= 400))
    assert ix.table.read().count() == emb.count()
    # re-embedding vec 0 as the negation must move its bucket partition
    before = ix.table.read().filter("vec_id = 0").select("bucket").first()[0]
    flipped = emb.filter(F.col("vec_id") == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        "label",
    )
    ix.upsert(flipped.select("vec_id", "embedding"))
    after_row = ix.table.read().filter("vec_id = 0").select("bucket").first()
    assert after_row[0] == before ^ 0b1111  # all four leading signs flipped
    assert ix.table.read().count() == emb.count()  # still one row per id


def test_probe_scan_is_partition_pruned(spark, emb, index):
    from tests.test_plans import plan_of

    queries = emb.filter(F.col("vec_id") == 0)
    plan = plan_of(index.query(queries, k=5, nprobe=1))
    # the index scan must carry the probed-bucket partition filter
    assert "PartitionFilters" in plan
    import re

    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any(re.search(r"PartitionFilters: \[.*bucket", ln) for ln in pf_lines), pf_lines
    # candidate generation must stay an equi-join, never a cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_compact_bucket_only_touches_that_bucket(spark, emb, index):
    files = lambda: {  # noqa: E731
        f["path"]: f["partition"]["bucket"] for f in index.table._entry()["files"]
    }
    before = files()
    target = sorted(set(before.values()))[0]
    index.compact_bucket(int(target))
    after = files()
    untouched_before = {p for p, b in before.items() if b != target}
    untouched_after = {p for p, b in after.items() if b != target}
    assert untouched_before == untouched_after
