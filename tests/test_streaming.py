"""Streaming layer tests: each streaming plan is checked against the
equivalent batch computation on the same data (differential oracle, the
strategy SURVEY.md §5 prescribes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.streaming import (
    dedup_stream,
    file_stream,
    sessionize,
    stream_merge_into,
    windowed_agg,
)
from delta_lake_spark.tables import ManagedTable
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """events split into 2 files in a landing dir (micro-batch boundaries)."""
    d = tmp_path_factory.mktemp("landing")
    ev = table(spark, SF_SMOKE, "events")
    ev.filter(F.col("event_id") < 500).coalesce(1).write.parquet(str(d / "f0"))
    ev.filter(F.col("event_id") >= 500).coalesce(1).write.parquet(str(d / "f1"))
    # file source needs files directly in the dir (or a glob); use subdir glob
    return str(d) + "/*"


@pytest.fixture(scope="module")
def events_batch(spark):
    return table(spark, SF_SMOKE, "events")


def drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_merge_into_managed_table(spark, tmp_path, landing, events_batch):
    src = file_stream(spark, landing, events_batch.schema, max_files_per_trigger=1)
    t = ManagedTable(spark, str(tmp_path / "events_tbl"))
    q = stream_merge_into(
        src, t, ["event_id"], str(tmp_path / "ckpt"), insert_only=True
    )
    drain(q)
    assert t.read().count() == events_batch.count()
    # replaying the same files through a fresh checkpoint is harmless
    # (idempotent insert-only merge = effectively-once)
    q2 = stream_merge_into(
        file_stream(spark, landing, events_batch.schema),
        t,
        ["event_id"],
        str(tmp_path / "ckpt2"),
        insert_only=True,
    )
    drain(q2)
    assert t.read().count() == events_batch.count()


def test_windowed_agg_matches_batch(spark, tmp_path, landing, events_batch):
    src = file_stream(spark, landing, events_batch.schema)
    agg = windowed_agg(src, window="1 hour", watermark="2 hours", group_cols=["event_type"])
    t = ManagedTable(spark, str(tmp_path / "win_tbl"))
    q = stream_merge_into(
        agg, t, ["window_start", "event_type"], str(tmp_path / "ckpt")
    )
    drain(q)
    want = (
        events_batch.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    got = t.read().select("window_start", "event_type", "n", "total_value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dedup_stream(spark, tmp_path, landing, events_batch):
    src = file_stream(spark, landing, events_batch.schema)
    deduped = dedup_stream(src, ["user_id"], watermark="10 days")
    t = ManagedTable(spark, str(tmp_path / "dd_tbl"))
    q = stream_merge_into(deduped, t, ["user_id"], str(tmp_path / "ckpt"), insert_only=True)
    drain(q)
    assert t.read().count() == events_batch.select("user_id").distinct().count()


def test_sessionize_matches_batch_sessions(spark, tmp_path, landing, events_batch):
    """Closed streaming sessions must agree with the batch lag-gap
    computation for every session the watermark has finalized."""
    src = file_stream(spark, landing, events_batch.schema)
    sessions = sessionize(src, gap_seconds=1800, watermark="1 minute")
    t = ManagedTable(spark, str(tmp_path / "sess_tbl"))
    q = stream_merge_into(
        sessions, t, ["user_id", "session_start"], str(tmp_path / "ckpt"), insert_only=True
    )
    drain(q)

    from pyspark.sql.window import Window

    from delta_lake_spark.catalog import epoch_seconds

    w = Window.partitionBy("user_id").orderBy("ts")
    batch_sessions = (
        events_batch.withColumn(
            "new_sess",
            (
                epoch_seconds(F.col("ts")) - F.lag(epoch_seconds(F.col("ts"))).over(w)
                > 1800
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum(F.coalesce("new_sess", F.lit(0))).over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in t.read().collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in batch_sessions.collect()
    }
    # streaming emits only closed sessions; every emitted one must match
    assert got, "no sessions were closed"
    for k, v in got.items():
        assert k in want and want[k] == v, (k, v, want.get(k))


def test_stream_managed_table_incrementally(spark, tmp_path):
    """A managed table's commit dirs form a streaming file source: a
    checkpointed availableNow run drains current commits; after an append,
    re-running with the SAME checkpoint processes only the new files —
    continuous consumption of the table's change feed."""
    from pyspark.sql import Row

    src_t = ManagedTable(spark, str(tmp_path / "src"))
    src_t.write(spark.createDataFrame([Row(id=i, v=float(i)) for i in range(50)]))

    dst = ManagedTable(spark, str(tmp_path / "dst"))
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = file_stream(spark, src_t.path + "/c*", src_t.schema())
        q = stream_merge_into(stream, dst, ["id"], ckpt, insert_only=True)
        drain(q)

    run_once()
    assert dst.read().count() == 50

    src_t.write(
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(50, 80)]),
        mode="append",
    )
    run_once()  # same checkpoint: only the new commit's files are read
    assert dst.read().count() == 80
    assert {r["id"] for r in dst.read().collect()} == set(range(80))


def test_interval_join_matches_batch(spark, tmp_path, landing, events_batch):
    from delta_lake_spark.streaming import interval_join

    clicks = file_stream(spark, landing, events_batch.schema).filter(
        F.col("event_type") == "click"
    )
    views = file_stream(spark, landing, events_batch.schema).filter(
        F.col("event_type") == "view"
    )
    joined = interval_join(
        clicks.select("user_id", "ts", F.col("event_id").alias("click_id")),
        views.select("user_id", "ts", F.col("event_id").alias("view_id")),
        key="user_id",
        upper="30 minutes",
        watermark="2 hours",
    ).select("user_id", "click_id", "view_id")
    t = ManagedTable(spark, str(tmp_path / "ij_tbl"))
    q = stream_merge_into(
        joined, t, ["click_id", "view_id"], str(tmp_path / "ckpt"),
        insert_only=True, output_mode="append",
    )
    drain(q)
    eb = events_batch.withColumn("ts", F.col("ts").cast("timestamp"))
    c = eb.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    v = eb.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
    )
    want = c.join(
        v,
        (F.col("user_id") == F.col("u2"))
        & (F.col("vts") >= F.col("cts"))
        & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
    ).select("user_id", "click_id", "view_id")
    assert sorted(map(tuple, t.read().select("user_id", "click_id", "view_id").collect())) == \
        sorted(map(tuple, want.collect()))


def test_stream_dedup_ingest_matches_batch(spark, tmp_path):
    """Streaming near-dedup ingest (foreachBatch over a file source) admits
    exactly the docs the equivalent ordered batch ingests admit, and the
    admitted corpus never holds a verified near-dup pair."""
    from delta_lake_spark.functions.dedup import minhash_candidate_pairs
    from delta_lake_spark.streaming.streams import file_stream, stream_dedup_ingest
    from delta_lake_spark.tables import ManagedTable, near_dedup_ingest

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
    )
    landing = str(tmp_path / "landing")
    docs.filter("doc_id < 250").coalesce(1).write.parquet(f"{landing}/b1")
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(f"{landing}/b2")

    stream_t = ManagedTable(spark, str(tmp_path / "stream_corpus"))
    src = file_stream(
        spark, f"{landing}/*", docs.schema, max_files_per_trigger=1
    )
    q = stream_dedup_ingest(
        src, stream_t, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch_t = ManagedTable(spark, str(tmp_path / "batch_corpus"))
    near_dedup_ingest(batch_t, docs.filter("doc_id < 250"))
    near_dedup_ingest(batch_t, docs.filter("doc_id >= 250"))

    got = sorted(r.doc_id for r in stream_t.read().select("doc_id").collect())
    want = sorted(r.doc_id for r in batch_t.read().select("doc_id").collect())
    assert got == want
    dups = minhash_candidate_pairs(stream_t.read(), "doc_id", "text").filter(
        "jaccard_bp >= 8000"
    )
    assert dups.count() == 0


def test_stream_assign_clusters_matches_batch(spark, tmp_path):
    """Streaming cluster assignment (stateless map-only projection per
    micro-batch) produces exactly the batch assignment of the same
    vectors against the same frozen centroids."""
    from delta_lake_spark.functions.clustering import (
        assign_to_centroids,
        spherical_kmeans,
        update_centroids,
    )
    from delta_lake_spark.functions.similarity import as_double
    from delta_lake_spark.streaming.streams import file_stream, stream_assign_clusters
    from delta_lake_spark.tables import ManagedTable

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # frozen centroids from a batch training run
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("e"))
    cent = v.filter("vec_id < 4").selectExpr("vec_id AS cl", "e AS c")
    cent = update_centroids(assign_to_centroids(v, cent, keep_vec=True))

    landing = str(tmp_path / "landing")
    emb.filter("vec_id % 2 = 0").coalesce(1).write.parquet(f"{landing}/b1")
    emb.filter("vec_id % 2 = 1").coalesce(1).write.parquet(f"{landing}/b2")

    t = ManagedTable(spark, str(tmp_path / "assigned"))
    src = file_stream(spark, f"{landing}/*", emb.schema, max_files_per_trigger=1)
    q = stream_assign_clusters(src, cent, t, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {(r.vec_id, r.cl, r.sim) for r in t.read().collect()}
    want = {(r.vec_id, r.cl, r.sim) for r in assign_to_centroids(v, cent).collect()}
    assert got == want and len(got) == emb.count()


def test_session_window_agg_stream_matches_batch(spark, tmp_path, landing, events_batch):
    """The native session_window path: the streaming aggregation (state-
    store session merging, watermark-finalized) must equal the SAME
    session_window expression evaluated in batch mode over the full input
    — stream==batch parity for the JVM-native sessionization twin."""
    from delta_lake_spark.streaming import session_window_agg

    src = file_stream(spark, landing, events_batch.schema)
    sess = session_window_agg(
        src, gap="30 minutes", group_cols=["user_id"], watermark="1 minute"
    )
    t = ManagedTable(spark, str(tmp_path / "sw_tbl"))
    # session-window aggregations support append output only: a session
    # emits exactly once, when the watermark passes its end
    q = stream_merge_into(
        sess,
        t,
        ["user_id", "session_start"],
        str(tmp_path / "ckpt_sw"),
        insert_only=True,
    )
    drain(q)
    want = (
        events_batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in t.read().collect()
    }
    want_map = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in want.collect()
    }
    # append mode emits only watermark-finalized sessions; every emitted
    # session must match its batch twin exactly, and with a 1-minute
    # watermark over a multi-day corpus nearly all sessions finalize
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want_map[k] == v
    assert len(got) >= 0.8 * len(want_map)


def test_stream_scd2_matches_batch_rebuild(spark, tmp_path):
    """Streaming SCD2 maintenance (two micro-batches through one checkpoint)
    lands the same dimension as a batch rebuild over the full change stream;
    a replayed drain through the same checkpoint is a no-op."""
    import datetime as dt

    from delta_lake_spark.streaming import stream_scd2_into
    from delta_lake_spark.tables.scd import scd2_init

    schema = "user_id bigint, tier string, ts timestamp"
    rows1 = [
        (1, "bronze", dt.datetime(2024, 1, 1)),
        (1, "silver", dt.datetime(2024, 1, 2)),
        (2, "bronze", dt.datetime(2024, 1, 1)),
    ]
    rows2 = [
        (1, "silver", dt.datetime(2024, 1, 3)),  # no-op vs open version
        (1, "gold", dt.datetime(2024, 1, 4)),
        (3, "bronze", dt.datetime(2024, 1, 4)),  # brand-new key mid-stream
    ]
    land = tmp_path / "land"
    df1 = spark.createDataFrame(rows1, schema)
    df1.coalesce(1).write.parquet(str(land / "f0"))

    dim = ManagedTable(spark, str(tmp_path / "dim"))
    ckpt = str(tmp_path / "ckpt")
    drain(stream_scd2_into(
        file_stream(spark, str(land) + "/*", df1.schema),
        dim, ["user_id"], ["tier"], "ts", ckpt,
    ))
    v_after_first = dim.latest_version()

    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(land / "f1")
    )
    drain(stream_scd2_into(
        file_stream(spark, str(land) + "/*", df1.schema),
        dim, ["user_id"], ["tier"], "ts", ckpt,
    ))
    assert dim.latest_version() > v_after_first

    rebuild = ManagedTable(spark, str(tmp_path / "rebuild"))
    scd2_init(
        rebuild, spark.createDataFrame(rows1 + rows2, schema),
        ["user_id"], ["tier"], "ts",
    )
    key = lambda t: sorted(
        (r.user_id, r.tier, r.eff_from, r.eff_to, r.is_current)
        for r in t.read().collect()
    )
    assert key(dim) == key(rebuild)

    # replay: a fresh query over the SAME checkpoint finds no new files and
    # commits nothing (and re-delivered batches would hit the txn marker)
    v = dim.latest_version()
    drain(stream_scd2_into(
        file_stream(spark, str(land) + "/*", df1.schema),
        dim, ["user_id"], ["tier"], "ts", ckpt,
    ))
    assert dim.latest_version() == v


def test_left_outer_interval_join_matches_batch(spark, tmp_path, events_batch):
    """Outer stream-stream join semantics (r5): null-padded left rows emit
    only once the watermark passes their match window, so the test appends
    a far-future sentinel batch to drive eviction, then diffs against the
    batch left join over the real (non-sentinel) data."""
    import datetime

    from delta_lake_spark.streaming import interval_join

    d = tmp_path / "oj_landing"
    d.mkdir()
    eb = events_batch.withColumn("ts", F.col("ts").cast("timestamp"))
    eb.coalesce(1).write.parquet(str(d / "f0"))
    # sentinel pair ~100 days past the corpus: advances BOTH sides'
    # watermarks far beyond every real row's match window
    far = eb.agg(F.max("ts")).first()[0] + datetime.timedelta(days=100)
    sentinel = spark.createDataFrame(
        [(10_000_001, far, -1, "click", 0.0, "{}"),
         (10_000_002, far, -1, "view", 0.0, "{}")],
        eb.schema,
    )
    import time as _t

    _t.sleep(1.1)  # strictly later mtime -> second micro-batch
    sentinel.coalesce(1).write.parquet(str(d / "f1"))

    glob = str(d) + "/*"
    schema = eb.schema
    clicks = file_stream(spark, glob, schema, max_files_per_trigger=1).filter(
        F.col("event_type") == "click"
    )
    views = file_stream(spark, glob, schema, max_files_per_trigger=1).filter(
        F.col("event_type") == "view"
    )
    joined = interval_join(
        clicks.select("user_id", "ts", F.col("event_id").alias("click_id")),
        views.select("user_id", "ts", F.col("event_id").alias("view_id")),
        key="user_id",
        upper="30 minutes",
        watermark="1 hour",
        how="left_outer",
    ).select("user_id", "click_id", "view_id")
    out = str(tmp_path / "oj_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "oj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)

    got = sorted(
        (r.user_id, r.click_id, r.view_id)
        for r in spark.read.parquet(out).collect()
        if r.click_id < 10_000_000  # drop the sentinel's own row
    )
    c = eb.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    v = eb.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
    )
    want = sorted(
        (r.user_id, r.click_id, r.view_id)
        for r in c.join(
            v,
            (F.col("user_id") == F.col("u2"))
            & (F.col("vts") >= F.col("cts"))
            & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
            "left",
        ).select("user_id", "click_id", "view_id").collect()
    )
    assert got == want
    # the outer join genuinely adds null-padded rows over the inner form
    assert any(vid is None for _, _, vid in got)


def test_full_outer_interval_join_matches_batch(spark, tmp_path, events_batch):
    """Full-outer stream-stream join (r6, completes the join matrix):
    null-padded rows from BOTH sides emit once the watermark passes their
    match window; diffed against the batch full join over the real data.
    The output key column is coalesce(left, right) — a right-unmatched row
    has no left key."""
    import datetime

    from delta_lake_spark.streaming import interval_join

    d = tmp_path / "foj_landing"
    d.mkdir()
    eb = events_batch.withColumn("ts", F.col("ts").cast("timestamp"))
    eb.coalesce(1).write.parquet(str(d / "f0"))
    far = eb.agg(F.max("ts")).first()[0] + datetime.timedelta(days=100)
    sentinel = spark.createDataFrame(
        [(10_000_001, far, -1, "click", 0.0, "{}"),
         (10_000_002, far, -1, "view", 0.0, "{}")],
        eb.schema,
    )
    import time as _t

    _t.sleep(1.1)  # strictly later mtime -> second micro-batch
    sentinel.coalesce(1).write.parquet(str(d / "f1"))

    glob = str(d) + "/*"
    schema = eb.schema
    clicks = file_stream(spark, glob, schema, max_files_per_trigger=1).filter(
        F.col("event_type") == "click"
    )
    views = file_stream(spark, glob, schema, max_files_per_trigger=1).filter(
        F.col("event_type") == "view"
    )
    joined = interval_join(
        clicks.select("user_id", "ts", F.col("event_id").alias("click_id")),
        views.select("user_id", "ts", F.col("event_id").alias("view_id")),
        key="user_id",
        upper="30 minutes",
        watermark="1 hour",
        how="full_outer",
    ).select("user_id", "click_id", "view_id")
    out = str(tmp_path / "foj_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "foj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)

    def nkey(t):
        return tuple((x is None, 0 if x is None else x) for x in t)

    got = sorted(
        (
            (r.user_id, r.click_id, r.view_id)
            for r in spark.read.parquet(out).collect()
            if (r.click_id or 0) < 10_000_000 and (r.view_id or 0) < 10_000_000
        ),
        key=nkey,
    )
    c = eb.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u1"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    v = eb.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
    )
    want = [
        (r.user_id, r.click_id, r.view_id)
        for r in c.join(
            v,
            (F.col("u1") == F.col("u2"))
            & (F.col("vts") >= F.col("cts"))
            & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
            "full",
        )
        .select(F.coalesce("u1", "u2").alias("user_id"), "click_id", "view_id")
        .collect()
    ]
    want = sorted(want, key=nkey)
    assert got == want
    # null-padded rows from BOTH sides must be present
    assert any(vid is None for _, _, vid in got)
    assert any(cid is None for _, cid, _ in got)


def test_interval_join_rejects_unknown_how():
    from delta_lake_spark.streaming import interval_join

    with pytest.raises(ValueError, match="full_outer"):
        interval_join(None, None, key="k", how="left_semi")


def test_right_outer_interval_join_matches_batch(spark, tmp_path, events_batch):
    """Right-outer stream-stream join (r6): the mirror of the left_outer
    differential — null-padded RIGHT rows (views with no click in window)
    emit after watermark eviction and match the batch right join."""
    import datetime

    from delta_lake_spark.streaming import interval_join

    d = tmp_path / "roj_landing"
    d.mkdir()
    eb = events_batch.withColumn("ts", F.col("ts").cast("timestamp"))
    eb.coalesce(1).write.parquet(str(d / "f0"))
    far = eb.agg(F.max("ts")).first()[0] + datetime.timedelta(days=100)
    sentinel = spark.createDataFrame(
        [(10_000_001, far, -1, "click", 0.0, "{}"),
         (10_000_002, far, -1, "view", 0.0, "{}")],
        eb.schema,
    )
    import time as _t

    _t.sleep(1.1)
    sentinel.coalesce(1).write.parquet(str(d / "f1"))

    glob = str(d) + "/*"
    schema = eb.schema
    clicks = file_stream(spark, glob, schema, max_files_per_trigger=1).filter(
        F.col("event_type") == "click"
    )
    views = file_stream(spark, glob, schema, max_files_per_trigger=1).filter(
        F.col("event_type") == "view"
    )
    joined = interval_join(
        clicks.select("user_id", "ts", F.col("event_id").alias("click_id")),
        views.select("user_id", "ts", F.col("event_id").alias("view_id")),
        key="user_id",
        upper="30 minutes",
        watermark="1 hour",
        how="right_outer",
    ).select("user_id", "click_id", "view_id")
    out = str(tmp_path / "roj_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "roj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)

    def nkey(t):
        return tuple((x is None, 0 if x is None else x) for x in t)

    got = sorted(
        (
            (r.user_id, r.click_id, r.view_id)
            for r in spark.read.parquet(out).collect()
            if (r.click_id or 0) < 10_000_000 and (r.view_id or 0) < 10_000_000
        ),
        key=nkey,
    )
    c = eb.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u1"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    v = eb.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
    )
    want = sorted(
        [
            (r.user_id, r.click_id, r.view_id)
            for r in c.join(
                v,
                (F.col("u1") == F.col("u2"))
                & (F.col("vts") >= F.col("cts"))
                & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
                "right",
            )
            .select(
                F.coalesce("u1", "u2").alias("user_id"), "click_id", "view_id"
            )
            .collect()
        ],
        key=nkey,
    )
    assert got == want
    # unmatched right rows present (views with no click in window)
    assert any(cid is None for _, cid, _ in got)
