"""Model-based property test for ManagedTable merge semantics: a random
sequence of upsert / insert-only / delete batches must leave the table
equal to a driver-side dict model (SURVEY.md §5 plan item 4, generalized
from fixed idempotency cases)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Full tier (VERDICT r9 item 1): hypothesis deep runs over the MERGE model
# are round-close evidence, not the driver-facing fast gate.
pytestmark = pytest.mark.full

from delta_lake_spark.tables import ManagedTable

KEYS = st.integers(min_value=0, max_value=7)
BATCH = st.lists(
    st.tuples(KEYS, st.integers(min_value=-100, max_value=100)),
    min_size=1,
    max_size=5,
    unique_by=lambda kv: kv[0],  # merge precondition: unique source keys
)
OP = st.sampled_from(
    ["upsert", "insert_only", "delete", "delete_insert", "noop"]
)
SCRIPT = st.lists(st.tuples(OP, BATCH), min_size=1, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=SCRIPT)
def test_merge_sequence_matches_model(spark, script):
    root = tempfile.mkdtemp(prefix="mt_prop_")
    try:
        t = ManagedTable(spark, root)
        t.write(spark.createDataFrame([(0, 0)], "id long, val long"))
        model: dict[int, int] = {0: 0}
        for op, batch in script:
            src = spark.createDataFrame(batch, "id long, val long")
            if op == "upsert":
                t.merge(src, ["id"])
                model.update(dict(batch))
            elif op == "insert_only":
                t.merge(src, ["id"], when_matched="ignore")
                for k, v in batch:
                    model.setdefault(k, v)
            elif op == "delete_insert":
                # r9 degenerate-tables fix: matched keys delete, ONLY
                # not-matched source rows insert (the pair is consumed)
                t.merge(src, ["id"], when_matched="delete")
                for k, v in batch:
                    if k in model:
                        model.pop(k)
                    else:
                        model[k] = v
            elif op == "noop":
                # r9 fix: ignore+ignore must leave every row untouched
                t.merge(src, ["id"], when_matched="ignore", when_not_matched="ignore")
            else:
                t.merge(src, ["id"], when_matched="delete", when_not_matched="ignore")
                for k, _v in batch:
                    model.pop(k, None)
        got = {r["id"]: r["val"] for r in t.read().collect()}
        assert got == model
    finally:
        shutil.rmtree(root, ignore_errors=True)


COND_OP = st.sampled_from(["max_wins", "add_set", "pos_insert", "cond_delete"])
COND_SCRIPT = st.lists(st.tuples(COND_OP, BATCH), min_size=1, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=COND_SCRIPT)
def test_conditional_merge_matches_model(spark, script):
    """Conditional clauses (Delta whenMatchedUpdate(set=…, condition=…) /
    whenNotMatchedInsert(condition=…)) against a dict model:
    - max_wins:    update only when the source value is greater
    - add_set:     partial update_set accumulating t.val + s.val
    - pos_insert:  insert-only, and only non-negative source values
    - cond_delete: delete matched keys whose TARGET value is negative
    """
    root = tempfile.mkdtemp(prefix="mt_cprop_")
    try:
        t = ManagedTable(spark, root)
        t.write(spark.createDataFrame([(0, -5), (1, 5)], "id long, val long"))
        model: dict[int, int] = {0: -5, 1: 5}
        for op, batch in script:
            src = spark.createDataFrame(batch, "id long, val long")
            if op == "max_wins":
                t.merge(src, ["id"], matched_condition="s.val > t.val")
                for k, v in batch:
                    model[k] = max(model[k], v) if k in model else v
            elif op == "add_set":
                t.merge(src, ["id"], update_set={"val": "t.val + s.val"})
                for k, v in batch:
                    model[k] = model[k] + v if k in model else v
            elif op == "pos_insert":
                t.merge(
                    src,
                    ["id"],
                    when_matched="ignore",
                    not_matched_condition="s.val >= 0",
                )
                for k, v in batch:
                    if k not in model and v >= 0:
                        model[k] = v
            else:  # cond_delete
                t.merge(
                    src,
                    ["id"],
                    when_matched="delete",
                    when_not_matched="ignore",
                    matched_condition="t.val < 0",
                )
                for k, _v in batch:
                    if k in model and model[k] < 0:
                        model.pop(k)
        got = {r["id"]: r["val"] for r in t.read().collect()}
        assert got == model
    finally:
        shutil.rmtree(root, ignore_errors=True)


EVO_BATCH = st.lists(
    st.tuples(
        KEYS,
        st.integers(min_value=-100, max_value=100),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=5,
    unique_by=lambda kvt: kvt[0],
)
EVO_OP = st.sampled_from(["upsert", "insert_only"])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pre=st.lists(st.tuples(EVO_OP, EVO_BATCH), min_size=0, max_size=2),
    post=st.lists(st.tuples(EVO_OP, EVO_BATCH), min_size=1, max_size=3),
)
def test_schema_evolution_merge_matches_model(spark, pre, post):
    """Random merge sequences across a schema-evolution boundary: batches
    before the boundary carry (id, val); from the boundary on they carry an
    extra tag column with merge_schema=True.  The table must equal a dict
    model where pre-evolution rows read back tag=NULL until overwritten."""
    root = tempfile.mkdtemp(prefix="mt_eprop_")
    try:
        t = ManagedTable(spark, root)
        t.write(spark.createDataFrame([(0, 0)], "id long, val long"))
        model: dict[int, tuple[int, int | None]] = {0: (0, None)}
        for op, batch in pre:
            src = spark.createDataFrame(
                [(k, v) for k, v, _t in batch], "id long, val long"
            )
            if op == "upsert":
                t.merge(src, ["id"])
                model.update({k: (v, None) for k, v, _t in batch})
            else:
                t.merge(src, ["id"], when_matched="ignore")
                for k, v, _t in batch:
                    model.setdefault(k, (v, None))
        for op, batch in post:
            src = spark.createDataFrame(
                [(k, v, tg) for k, v, tg in batch], "id long, val long, tag long"
            )
            if op == "upsert":
                t.merge(src, ["id"], merge_schema=True)
                model.update({k: (v, tg) for k, v, tg in batch})
            else:
                t.merge(
                    src, ["id"], when_matched="ignore", merge_schema=True
                )
                for k, v, tg in batch:
                    model.setdefault(k, (v, tg))
        assert t.schema().fieldNames() == ["id", "val", "tag"]
        got = {r["id"]: (r["val"], r["tag"]) for r in t.read().collect()}
        assert got == model
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# Scoped-OPTIMIZE invariant: any sequence of partitioned writes/appends and
# randomly-scoped optimize(where=...) calls leaves the table's CONTENT
# identical to the same sequence without the optimizes (compaction must be
# invisible to readers), and never touches files outside the scope.
# --------------------------------------------------------------------------
OPT_STEP = st.one_of(
    st.tuples(st.just("append"), st.integers(min_value=1, max_value=30)),
    st.tuples(st.just("optimize"), st.integers(min_value=0, max_value=3)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=st.lists(OPT_STEP, min_size=2, max_size=5))
def test_scoped_optimize_preserves_content(spark, script):
    import pyspark.sql.functions as F

    root = tempfile.mkdtemp(prefix="mt_opt_")
    try:
        t = ManagedTable(spark, root)
        model_rows = []  # (id, part) multiset the readers must always see
        next_id = 0
        for op, arg in script:
            if op == "append":
                df = (
                    spark.range(next_id, next_id + arg)
                    .withColumn("part", F.pmod("id", F.lit(4)))
                    .repartition(2)
                )
                t.write(df, mode="append", partition_by=["part"])
                model_rows += [(i, i % 4) for i in range(next_id, next_id + arg)]
                next_id += arg
            elif t.latest_version() is not None:
                before = {
                    f["path"]
                    for f in t._entry()["files"]
                    if f["partition"].get("part") != str(arg)
                }
                t.optimize(where=[("part", "=", arg)])
                after = {
                    f["path"]
                    for f in t._entry()["files"]
                    if f["partition"].get("part") != str(arg)
                }
                assert before == after  # out-of-scope files never touched
            if t.latest_version() is not None:
                got = sorted((r.id, r.part) for r in t.read().collect())
                assert got == sorted(model_rows)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- SCD2 property: random change streams, incremental == rebuild ----------

SCD_TS = st.integers(min_value=1, max_value=28)
SCD_BATCH = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # key
        st.sampled_from(["a", "b", "c"]),             # tracked attr
        SCD_TS,
    ),
    min_size=1,
    max_size=5,
    unique_by=lambda r: (r[0], r[2]),  # scd2 precondition: unique (key, ts)
)
SCD_SCRIPT = st.lists(SCD_BATCH, min_size=1, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=SCD_SCRIPT)
def test_scd2_incremental_matches_rebuild(spark, script):
    """Random id-ordered change streams: applying batches incrementally must
    land the identical version chains as one scd2_init over everything.
    Batches are re-timestamped to be strictly increasing (the guarded
    precondition); within a batch any (key, ts) pattern goes."""
    import datetime

    from delta_lake_spark.tables.scd import scd2_apply, scd2_init

    # re-base each batch into its own day window so batch N+1 is strictly
    # after batch N for every key (ts = batch*100 + step hours)
    rows_by_batch = []
    for bi, batch in enumerate(script):
        rows_by_batch.append(
            [
                (k, v, datetime.datetime(2024, 1, 1) +
                 datetime.timedelta(hours=bi * 1000 + ts))
                for k, v, ts in batch
            ]
        )
    schema = "k bigint, attr string, ts timestamp"
    root = tempfile.mkdtemp(prefix="scd_prop_")
    try:
        inc = ManagedTable(spark, root + "/inc")
        scd2_init(inc, spark.createDataFrame(rows_by_batch[0], schema),
                  ["k"], ["attr"], "ts")
        for b in rows_by_batch[1:]:
            scd2_apply(inc, spark.createDataFrame(b, schema),
                       ["k"], ["attr"], "ts")
        reb = ManagedTable(spark, root + "/reb")
        scd2_init(
            reb,
            spark.createDataFrame([r for b in rows_by_batch for r in b], schema),
            ["k"], ["attr"], "ts",
        )
        key = lambda t: sorted(
            tuple(r) for r in t.read().collect()
        )
        assert key(inc) == key(reb)
        # invariant: exactly one open version per surviving key
        opens = (
            inc.read().filter("is_current")
            .groupBy("k").count().filter("count > 1")
        )
        assert opens.isEmpty()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_null_conditions_keep_rows(spark, tmp_path):
    """A NULL clause condition means the clause does NOT apply — the row
    must be KEPT, not silently lost to the ~NULL complement (the
    delete_where row-loss hazard, here for conditional matched-delete and
    conditional by-source delete)."""
    from delta_lake_spark.tables.managed import ManagedTable

    # matched-delete with a condition over a nullable column: id=2 matches
    # but t.val is null -> condition NULL -> row stays
    t = ManagedTable(spark, str(tmp_path / "mnull"))
    t.write(
        spark.createDataFrame(
            [(1, 5.0), (2, None), (3, -1.0)], "id bigint, val double"
        )
    )
    src = spark.createDataFrame([(2, 9.0), (3, 9.0)], "id bigint, val double")
    t.merge(
        src,
        ["id"],
        when_matched="delete",
        when_not_matched="ignore",
        matched_condition="t.val < 0",
    )
    out = {(r["id"], r["val"]) for r in t.read().collect()}
    assert out == {(1, 5.0), (2, None)}  # 3 deleted; null-cond row kept

    # by-source delete with a condition over a nullable column: id=2 has no
    # source match and a NULL condition -> must survive
    t2 = ManagedTable(spark, str(tmp_path / "bsnull"))
    t2.write(
        spark.createDataFrame(
            [(1, 5.0), (2, None), (3, -1.0)], "id bigint, val double"
        )
    )
    t2.merge(
        spark.createDataFrame([(1, 5.0)], "id bigint, val double"),
        ["id"],
        when_matched="ignore",
        when_not_matched="ignore",
        when_not_matched_by_source="delete",
        not_matched_by_source_condition="val < 0",
    )
    out2 = {(r["id"], r["val"]) for r in t2.read().collect()}
    assert out2 == {(1, 5.0), (2, None)}
