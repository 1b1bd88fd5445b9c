"""Planted-hazard sweep over the TABLE FORMAT itself (VERDICT r8 task 7).

The query families got degenerate-input certification in r7 (documents /
embeddings), r8 (relational/events + streaming differentials); this module
applies the same recipe to the transaction-log table layer: PLANT degenerate
inputs (NULL / duplicate merge keys, NULL / empty-string / unicode /
path-hostile partition values, NaN/inf/-0.0 payloads, zero-row commits),
then SWEEP engine-vs-model and engine-vs-rebuild invariants through every
maintenance op (MERGE clause combos, DELETE, OPTIMIZE, clone, RESTORE,
vacuum, CDF, time travel).

Documented rules pinned here (sources in delta_lake_spark/tables/managed.py):

- R1  An EMPTY-STRING partition value collapses to NULL — the Hive
      ``__HIVE_DEFAULT_PARTITION__`` directory convention cannot represent
      "" distinctly (``_dir_value``/``_dir_value_str``).  Write+read, scan
      pruning, and show_partitions all agree on the collapse.
- R2  A NULL merge key NEVER matches (SQL ``NULL = NULL`` is not true) —
      NULL-keyed source rows take the NOT MATCHED branch on every merge;
      NULL-keyed target rows are "not matched by source" (merge docstring).
- R3  Duplicate TARGET keys under unconditional ``update_all`` collapse to
      the single source row (the documented key-collapse semantics); under
      ``when_matched='delete'`` all duplicates delete.
- R4  Zero-row commits (empty append, empty-source merge, no-match delete)
      are REAL versions: they commit, preserve content exactly, and every
      downstream op (OPTIMIZE/clone/RESTORE/vacuum/CDF/time travel) treats
      them as ordinary history.
- R5  ``scan(filters)`` == ``read().filter(<same predicate>)`` on ANY
      content — file-skipping via min/max stats must stay a pure
      optimization even when NaN/inf poison the stats domain.

Fixture-change rule (tools/stamp_degenerate.py): any edit to this file
requires the full degenerate sweep green in the same session, stamped in
``tests/degenerate_fixtures.stamp``.
"""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest

# Full tier (VERDICT r9 item 1): the degenerate-corpus differential sweeps
# are round-close evidence, not the driver-facing fast gate.
pytestmark = pytest.mark.full

from pyspark.sql import functions as F

from delta_lake_spark.tables import ManagedTable

SCHEMA = "id long, grp string, val double"

# the planted-hazard base content: NULL id, NULL / "" / unicode /
# slash+equals+percent partition values, NaN / inf / -0.0 payloads
ROWS = [
    (1, None, 1.0),
    (2, "", 2.0),
    (3, "héllo wörld", 3.0),
    (4, "a/b=c d%e", 4.0),
    (5, "plain", float("nan")),
    (None, "plain", float("inf")),
    (7, "plain", -0.0),
]


def _key(r):
    """Total-order + NaN-stable row key for multiset comparison."""
    return tuple("NaN" if isinstance(v, float) and math.isnan(v) else v for v in r)


def rows_of(df):
    return sorted((_key(tuple(r)) for r in df.collect()), key=str)


@pytest.fixture()
def tmp(tmp_path):
    d = tempfile.mkdtemp(prefix="degen_tables_", dir=tmp_path)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, tmp, partitioned=True) -> ManagedTable:
    t = ManagedTable(spark, f"{tmp}/t")
    t.write(
        spark.createDataFrame(ROWS, SCHEMA),
        partition_by=["grp"] if partitioned else None,
    )
    return t


# ---------------------------------------------------------------------------
# R1 + R5 — degenerate partition values: roundtrip, pruning, scan parity
# ---------------------------------------------------------------------------
def test_degenerate_partition_values_roundtrip(spark, tmp):
    t = _base(spark, tmp)
    got = rows_of(t.read())
    # R1: "" collapsed to NULL; everything else byte-identical
    expected = rows_of(
        spark.createDataFrame(
            [(i, (g if g != "" else None), v) for i, g, v in ROWS], SCHEMA
        )
    )
    assert got == expected
    parts = {r[0] for r in t.show_partitions().collect()}
    assert parts == {None, "héllo wörld", "a/b=c d%e", "plain"}


@pytest.mark.parametrize(
    "flt",
    [
        [("grp", "=", "héllo wörld")],
        [("grp", "=", "a/b=c d%e")],
        [("grp", "=", "")],  # R1: no partition can hold "" — empty result
        [("grp", "=", "plain"), ("val", ">", 100.0)],  # inf row survives stats
        [("val", "<=", 2.0)],  # NaN rows excluded by predicate in BOTH paths
        [("id", ">=", 3)],  # NULL id never satisfies an inequality
    ],
)
def test_scan_equals_filter_on_degenerate_content(spark, tmp, flt):
    """R5: stats/partition pruning is a pure optimization — scan() must
    return exactly what a full-scan filter returns, even with NaN/inf in
    the stats domain and path-escaped partition directories."""
    t = _base(spark, tmp)
    expr = " AND ".join(
        f"{c} {('==' if o == '=' else o)} {v!r}" for c, o, v in flt
    )
    assert rows_of(t.scan(flt)) == rows_of(t.read().filter(expr))


def test_partition_pruning_actually_prunes_unicode_dir(spark, tmp):
    t = _base(spark, tmp)
    read_files, total = t.pruned_file_count([("grp", "=", "héllo wörld")])
    assert read_files < total, "unicode partition value must still prune"


# ---------------------------------------------------------------------------
# R2 — NULL merge keys through every clause combo (engine vs dict model)
# ---------------------------------------------------------------------------
TARGET = [(1, 10), (2, 20), (None, 77)]
SOURCE = [(1, 100), (3, 30), (None, 999)]


def _merge_model(when_matched, when_not_matched, by_source):
    """Driver-side model of the documented semantics over TARGET+SOURCE.

    Returns a sorted multiset of (key, val) with None keys kept."""
    out = []
    matched_keys = {1}  # the only non-NULL key present on both sides
    for k, v in TARGET:
        if k in matched_keys:
            if when_matched == "update_all":
                out.append((k, dict(SOURCE)[k]))
            elif when_matched == "ignore":
                out.append((k, v))
            # delete: drop
        else:
            # not matched by source (includes the NULL-key target row, R2)
            if by_source == "ignore":
                out.append((k, v))
            # by_source == "delete": drop
    if when_not_matched == "insert_all":
        for k, v in SOURCE:
            if k not in matched_keys:  # NULL-key source row always inserts
                out.append((k, v))
    return sorted(out, key=str)


@pytest.mark.parametrize("when_matched", ["update_all", "ignore", "delete"])
@pytest.mark.parametrize("when_not_matched", ["insert_all", "ignore"])
@pytest.mark.parametrize("by_source", ["ignore", "delete"])
def test_null_merge_keys_every_clause_combo(
    spark, tmp, when_matched, when_not_matched, by_source
):
    t = ManagedTable(spark, f"{tmp}/m")
    t.write(spark.createDataFrame(TARGET, "k long, v long"))
    t.merge(
        spark.createDataFrame(SOURCE, "k long, v long"),
        ["k"],
        when_matched=when_matched,
        when_not_matched=when_not_matched,
        when_not_matched_by_source=by_source,
    )
    got = sorted(((r["k"], r["v"]) for r in t.read().collect()), key=str)
    assert got == _merge_model(when_matched, when_not_matched, by_source)


def test_null_source_key_inserts_every_merge(spark, tmp):
    """R2 corollary (merge docstring): repeated merges of the same
    NULL-keyed source row insert it repeatedly — convergence is the
    responsibility of layers above (SCD2 drops, IncrementalAggView fails
    fast)."""
    t = ManagedTable(spark, f"{tmp}/m")
    t.write(spark.createDataFrame([(1, 10)], "k long, v long"))
    src = spark.createDataFrame([(None, 9)], "k long, v long")
    t.merge(src, ["k"])
    t.merge(src, ["k"])
    nulls = t.read().filter(F.col("k").isNull()).count()
    assert nulls == 2


# ---------------------------------------------------------------------------
# R3 — duplicate target keys
# ---------------------------------------------------------------------------
def test_duplicate_target_keys_collapse_on_update_all(spark, tmp):
    t = ManagedTable(spark, f"{tmp}/d")
    t.write(spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "k long, v long"))
    t.merge(spark.createDataFrame([(1, 100)], "k long, v long"), ["k"])
    got = sorted((r["k"], r["v"]) for r in t.read().collect())
    assert got == [(1, 100), (2, 20)], "dup target keys collapse to one row"


def test_duplicate_target_keys_all_delete(spark, tmp):
    t = ManagedTable(spark, f"{tmp}/d")
    t.write(spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "k long, v long"))
    t.merge(
        spark.createDataFrame([(1, 0)], "k long, v long"),
        ["k"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    assert [(r["k"], r["v"]) for r in t.read().collect()] == [(2, 20)]


# ---------------------------------------------------------------------------
# R4 — zero-row commits through the whole maintenance surface
# ---------------------------------------------------------------------------
def test_zero_row_commits_are_real_versions(spark, tmp):
    t = _base(spark, tmp)
    v0 = t.latest_version()
    content0 = rows_of(t.read())
    empty = spark.createDataFrame([], SCHEMA)

    v_append = t.write(empty, mode="append")
    v_merge = t.merge(empty, ["id"])
    t.delete_where([("id", "=", 999)])
    v_del = t.latest_version()
    assert v0 < v_append < v_merge <= v_del
    assert rows_of(t.read()) == content0
    assert t.count_rows() == len(ROWS)  # metadata-only count stays exact

    ops = [h["operation"] for h in t.history()]
    assert ops[-1] == "overwrite" and len(ops) >= 4

    # maintenance sweep over the zero-row history
    t.optimize()
    assert rows_of(t.read()) == content0
    clone = t.clone(f"{tmp}/clone")
    assert rows_of(clone.read()) == content0
    # time travel across the zero-row commits
    assert rows_of(t.read(version=v_append)) == content0
    assert rows_of(t.read(version=v0)) == content0
    # vacuum dry-run never lists live files of the CURRENT version
    t.vacuum(dry_run=True)
    assert rows_of(t.read()) == content0


def test_delete_whole_partition_then_maintenance(spark, tmp):
    """Empty-after-delete partition (holding the NaN/inf/-0.0 rows) through
    OPTIMIZE + RESTORE: content matches a driver-side model at every step."""
    t = _base(spark, tmp)
    v_full = t.latest_version()
    t.delete_where([("grp", "=", "plain")])
    survivors = rows_of(
        spark.createDataFrame(
            [(i, (g if g != "" else None), v) for i, g, v in ROWS if g != "plain"],
            SCHEMA,
        )
    )
    assert rows_of(t.read()) == survivors
    t.optimize()
    assert rows_of(t.read()) == survivors
    assert {r[0] for r in t.show_partitions().collect()} == {
        None,
        "héllo wörld",
        "a/b=c d%e",
    }
    # restore returns the NaN/inf rows bit-exactly
    t.restore(v_full)
    assert rows_of(t.read()) == rows_of(t.read(version=v_full))
    assert t.count_rows() == len(ROWS)


def test_constraint_null_predicate_is_violation(spark, tmp):
    """R6 (managed.py _enforce_constraints): a CHECK predicate that
    evaluates to NULL on a row COUNTS AS A VIOLATION (Delta semantics — a
    constraint must provably hold; plain-SQL CHECK would wave NULL
    through).  The write must raise and leave the table untouched."""
    t = ManagedTable(spark, f"{tmp}/k")
    t.write(spark.createDataFrame([(1, 10.0)], "k long, val double"))
    t.add_constraint("pos", "val > 0")
    v = t.latest_version()
    bad = spark.createDataFrame([(2, None)], "k long, val double")  # NULL pred
    with pytest.raises(ValueError, match="pos"):
        t.write(bad, mode="append")
    with pytest.raises(ValueError, match="pos"):
        t.merge(bad, ["k"])
    assert t.latest_version() == v
    assert [(r["k"], r["val"]) for r in t.read().collect()] == [(1, 10.0)]


def test_add_constraint_rejects_nan_rows(spark, tmp):
    """R6 corollary: Spark SQL orders NaN GREATER than every number, so
    `val < bound` is FALSE on a NaN row in both engines — adding an
    upper-bound constraint to a table holding NaN must fail (the scan
    finds the violating row), and the constraint must not land."""
    t = _base(spark, tmp, partitioned=False)  # holds NaN and inf rows
    with pytest.raises(ValueError, match="existing row violates"):
        t.add_constraint("bounded", "val < 1e308")
    assert "bounded" not in t.constraints()


def test_schema_evolution_with_null_key_source(spark, tmp):
    """R2 x schema evolution: a merge_schema source carrying a NEW column
    and a NULL merge key — the NULL-key row inserts (NOT MATCHED), the new
    column appends nullable, and pre-evolution rows read NULL for it."""
    t = ManagedTable(spark, f"{tmp}/e")
    t.write(spark.createDataFrame([(1, 10), (None, 77)], "k long, v long"))
    src = spark.createDataFrame(
        [(1, 100, "x"), (None, 9, "y")], "k long, v long, extra string"
    )
    t.merge(src, ["k"], merge_schema=True)
    got = sorted(
        ((r["k"], r["v"], r["extra"]) for r in t.read().collect()), key=str
    )
    assert got == sorted(
        [
            (1, 100, "x"),  # matched: whole row updated, extra filled
            (None, 77, None),  # old NULL-key target row: untouched, NULL extra
            (None, 9, "y"),  # NULL-key source row: inserted (R2)
        ],
        key=str,
    )


def test_row_tracking_through_dup_keys_and_compaction(spark, tmp):
    """Row-tracked MERGE takes the row-preserving plan, where duplicate
    TARGET keys each pair with the source row and update INDEPENDENTLY
    (managed.py _conditional_merge_plan docstring — no key collapse,
    unlike the unconditional fast path): every duplicate keeps its own
    stable id, zero-row commits assign no ids, and OPTIMIZE preserves
    every id (Delta row-tracking contract)."""
    t = ManagedTable(spark, f"{tmp}/r")
    t.write(spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "k long, v long"))
    t.enable_row_tracking()
    ids0 = {r["_row_id"] for r in t.read_with_row_ids().collect()}
    t.merge(spark.createDataFrame([(1, 100)], "k long, v long"), ["k"])
    t.write(spark.createDataFrame([], "k long, v long"), mode="append")
    rows = t.read_with_row_ids().collect()
    ids = [r["_row_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 3, "each dup keeps a distinct id"
    assert set(ids) == ids0, "matched updates keep TARGET ids, none minted"
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, 100), (1, 100), (2, 20)]
    by_id = {r["_row_id"]: (r["k"], r["v"]) for r in rows}
    t.optimize()
    after = {
        r["_row_id"]: (r["k"], r["v"]) for r in t.read_with_row_ids().collect()
    }
    assert after == by_id, "OPTIMIZE must not reassign row ids"


def test_wap_publish_degenerate_partitions(spark, tmp):
    """R4 x WAP: stage-audit-publish over the degenerate partition layout —
    clone to staging, delete a whole partition there (leaving NULL/unicode/
    path-hostile dirs), publish overwrite; the target atomically becomes
    the staged snapshot and time travel still reaches the pre-publish
    content."""
    t = _base(spark, tmp)
    v_pre = t.latest_version()
    staging = t.clone(f"{tmp}/staging")
    staging.delete_where([("grp", "=", "plain")])
    t.publish_from(staging)
    assert rows_of(t.read()) == rows_of(staging.read())
    assert {r[0] for r in t.show_partitions().collect()} == {
        None,
        "héllo wörld",
        "a/b=c d%e",
    }
    assert rows_of(t.read(version=v_pre)) != rows_of(t.read())
    assert t.count_rows() == len(ROWS) - 3


def test_cdf_across_zero_row_commits(spark, tmp):
    """CDF must record zero-row commits as zero changes — not error, not
    phantom rows — and real changes around them stay exact."""
    t = ManagedTable(spark, f"{tmp}/c")
    t.write(spark.createDataFrame([(1, 10), (None, 77)], "k long, v long"))
    t.enable_cdf()
    v_start = t.latest_version()
    t.write(spark.createDataFrame([], "k long, v long"), mode="append")
    v_zero = t.latest_version()
    t.merge(spark.createDataFrame([(1, 100), (None, 9)], "k long, v long"), ["k"])
    v_end = t.latest_version()

    assert t.change_feed(v_start, v_zero).count() == 0, (
        "zero-row append must contribute zero CDF rows"
    )
    feed = t.change_feed(v_zero, v_end).collect()
    types = {r["_change_type"] for r in feed}
    # the merge: k=1 updated (pre+post), NULL source key inserted (R2)
    assert {"update_preimage", "update_postimage"} <= types
    inserted = [r for r in feed if r["_change_type"] == "insert"]
    assert len(inserted) == 1 and inserted[0]["k"] is None
