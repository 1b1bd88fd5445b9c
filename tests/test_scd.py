"""SCD Type-2 dimension maintenance (tables/scd.py).

Hand-computed chains on a tiny dimension, incremental==rebuild equivalence,
replay safety, strict-guard preconditions, and point-in-time reads.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable
from delta_lake_spark.tables.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_current,
    scd2_init,
)

KEYS = ["cust_id"]
TRACKED = ["tier", "country"]


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id bigint, tier string, country string, ts timestamp"
    )


def _chain(table):
    return sorted(
        (
            r.cust_id,
            r.tier,
            r.country,
            r.eff_from,
            r.eff_to,
            r.is_current,
        )
        for r in table.read().collect()
    )


def _init(spark, tmp_path, rows):
    t = ManagedTable(spark, str(tmp_path / "dim"))
    scd2_init(t, _rows(spark, rows), KEYS, TRACKED, "ts")
    return t


def test_init_collapses_and_chains(spark, tmp_path):
    t = _init(
        spark,
        tmp_path,
        [
            (1, "bronze", "DE", _ts(1)),
            (1, "bronze", "DE", _ts(2)),  # consecutive-equal: no version
            (1, "silver", "DE", _ts(3)),
            (2, "gold", "FR", _ts(1)),
        ],
    )
    assert _chain(t) == [
        (1, "bronze", "DE", _ts(1), _ts(3), False),
        (1, "silver", "DE", _ts(3), None, True),
        (2, "gold", "FR", _ts(1), None, True),
    ]


def test_apply_closes_and_opens_atomically(spark, tmp_path):
    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(1))])
    v0 = t.latest_version()
    scd2_apply(
        t,
        _rows(
            spark,
            [
                (1, "silver", "DE", _ts(5)),  # change -> close + open
                (2, "gold", "FR", _ts(5)),  # brand-new key
            ],
        ),
        KEYS,
        TRACKED,
        "ts",
    )
    assert t.latest_version() == v0 + 1  # ONE commit for both clauses
    assert _chain(t) == [
        (1, "bronze", "DE", _ts(1), _ts(5), False),
        (1, "silver", "DE", _ts(5), None, True),
        (2, "gold", "FR", _ts(5), None, True),
    ]
    cur = {(r.cust_id, r.tier) for r in scd2_current(t).collect()}
    assert cur == {(1, "silver"), (2, "gold")}


def test_noop_and_intra_batch_chain(spark, tmp_path):
    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(1))])
    v0 = t.latest_version()
    # first row is a no-op vs the open version; then a two-step chain whose
    # intermediate version must close inside the same commit
    scd2_apply(
        t,
        _rows(
            spark,
            [
                (1, "bronze", "DE", _ts(2)),
                (1, "silver", "DE", _ts(3)),
                (1, "gold", "DE", _ts(4)),
            ],
        ),
        KEYS,
        TRACKED,
        "ts",
    )
    assert t.latest_version() == v0 + 1
    assert _chain(t) == [
        (1, "bronze", "DE", _ts(1), _ts(3), False),  # no-op didn't fork
        (1, "gold", "DE", _ts(4), None, True),
        (1, "silver", "DE", _ts(3), _ts(4), False),
    ]


def test_all_noop_batch_commits_nothing(spark, tmp_path):
    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(1))])
    v0 = t.latest_version()
    scd2_apply(
        t, _rows(spark, [(1, "bronze", "DE", _ts(9))]), KEYS, TRACKED, "ts"
    )
    assert t.latest_version() == v0
    assert _chain(t) == [(1, "bronze", "DE", _ts(1), None, True)]


def test_incremental_equals_rebuild(spark, tmp_path):
    """Three sequential applies land the same table as one init over the
    concatenated change stream — the invariant the op exists for."""
    batches = [
        [(1, "bronze", "DE", _ts(1)), (2, "gold", "FR", _ts(1))],
        [
            (1, "silver", "DE", _ts(4)),
            (2, "gold", "FR", _ts(4)),  # no-op
            (3, "bronze", "IT", _ts(4)),
        ],
        [
            (1, "silver", "CH", _ts(7)),  # second tracked col changes
            (3, "silver", "IT", _ts(8)),
            (3, "gold", "IT", _ts(9)),  # intra-batch chain
        ],
    ]
    inc = ManagedTable(spark, str(tmp_path / "inc"))
    scd2_init(inc, _rows(spark, batches[0]), KEYS, TRACKED, "ts")
    for b in batches[1:]:
        scd2_apply(inc, _rows(spark, b), KEYS, TRACKED, "ts")
    reb = ManagedTable(spark, str(tmp_path / "reb"))
    scd2_init(reb, _rows(spark, [r for b in batches for r in b]), KEYS, TRACKED, "ts")
    assert _chain(inc) == _chain(reb)


def test_replay_same_batch_is_idempotent(spark, tmp_path):
    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(1))])
    batch = _rows(spark, [(1, "silver", "DE", _ts(5))])
    scd2_apply(t, batch, KEYS, TRACKED, "ts", txn_app="scd", txn_batch=1)
    before = _chain(t)
    v1 = t.latest_version()
    # crash-after-commit retry: short-circuits on the txn marker (the strict
    # guard must NOT mis-read the post-commit head as out-of-order)
    scd2_apply(t, batch, KEYS, TRACKED, "ts", txn_app="scd", txn_batch=1)
    assert t.latest_version() == v1
    assert _chain(t) == before


def test_strict_guards(spark, tmp_path):
    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(5))])
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_apply(
            t, _rows(spark, [(1, "gold", "DE", _ts(3))]), KEYS, TRACKED, "ts"
        )
    with pytest.raises(ValueError, match="duplicate"):
        scd2_apply(
            t,
            _rows(
                spark,
                [(1, "gold", "DE", _ts(8)), (1, "silver", "DE", _ts(8))],
            ),
            KEYS,
            TRACKED,
            "ts",
        )


def test_as_of_point_in_time(spark, tmp_path):
    t = _init(
        spark,
        tmp_path,
        [
            (1, "bronze", "DE", _ts(1)),
            (1, "silver", "DE", _ts(5)),
            (2, "gold", "FR", _ts(3)),
        ],
    )
    snap = {
        (r.cust_id, r.tier)
        for r in scd2_as_of(t, _ts(4)).collect()
    }
    assert snap == {(1, "bronze"), (2, "gold")}
    # half-open boundary: at exactly eff_from the NEW version is valid
    snap5 = {
        (r.cust_id, r.tier)
        for r in scd2_as_of(t, _ts(5)).collect()
    }
    assert snap5 == {(1, "silver"), (2, "gold")}
    # before any version: key absent
    assert scd2_as_of(t, _ts(1) - dt.timedelta(days=1)).filter(
        F.col("cust_id") == 2
    ).isEmpty()


# --- scd2_sync: full-snapshot feed ------------------------------------------


def test_sync_advances_to_snapshot_atomically(spark, tmp_path):
    from delta_lake_spark.tables.scd import scd2_sync

    t = _init(
        spark,
        tmp_path,
        [
            (1, "bronze", "DE", _ts(1)),
            (2, "gold", "FR", _ts(1)),
            (3, "silver", "IT", _ts(1)),
        ],
    )
    v0 = t.latest_version()
    snap = spark.createDataFrame(
        [
            (1, "silver", "DE"),  # changed -> close + open
            (2, "gold", "FR"),    # equal -> untouched
            (4, "bronze", "ES"),  # new key
            # 3 absent -> close out with no successor
        ],
        "cust_id bigint, tier string, country string",
    )
    scd2_sync(t, snap, KEYS, TRACKED, _ts(5))
    assert t.latest_version() == v0 + 1  # ONE commit for all four cases
    assert _chain(t) == [
        (1, "bronze", "DE", _ts(1), _ts(5), False),
        (1, "silver", "DE", _ts(5), None, True),
        (2, "gold", "FR", _ts(1), None, True),
        (3, "silver", "IT", _ts(1), _ts(5), False),
        (4, "bronze", "ES", _ts(5), None, True),
    ]
    # re-syncing the identical snapshot is a no-op (idempotent by content)
    v1 = t.latest_version()
    scd2_sync(t, snap, KEYS, TRACKED, _ts(6))
    assert t.latest_version() == v1
    # a vanished key REAPPEARING opens a fresh version
    snap2 = spark.createDataFrame(
        [(1, "silver", "DE"), (2, "gold", "FR"), (3, "gold", "IT"),
         (4, "bronze", "ES")],
        "cust_id bigint, tier string, country string",
    )
    scd2_sync(t, snap2, KEYS, TRACKED, _ts(7))
    rows = [r for r in _chain(t) if r[0] == 3]
    assert rows == [
        (3, "gold", "IT", _ts(7), None, True),
        (3, "silver", "IT", _ts(1), _ts(5), False),
    ]


def test_sync_guards_and_replay(spark, tmp_path):
    from delta_lake_spark.tables.scd import scd2_sync

    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(5))])
    snap = spark.createDataFrame(
        [(1, "gold", "DE")], "cust_id bigint, tier string, country string"
    )
    with pytest.raises(ValueError, match="not newer"):
        scd2_sync(t, snap, KEYS, TRACKED, _ts(5))
    scd2_sync(t, snap, KEYS, TRACKED, _ts(6), txn_app="sync", txn_batch=1)
    before, v = _chain(t), t.latest_version()
    # crash-after-commit replay: txn marker short-circuits (the ts guard
    # would otherwise reject the already-applied snapshot)
    scd2_sync(t, snap, KEYS, TRACKED, _ts(6), txn_app="sync", txn_batch=1)
    assert t.latest_version() == v and _chain(t) == before


def test_scd2_apply_emits_exact_cdf_images_in_one_commit(spark, tmp_path):
    """Composition contract (VERDICT r4 task 9): scd2_apply over a
    CDF-ENABLED dimension must emit, in the single merge commit, the exact
    change images — update_preimage/update_postimage for the closed-out
    row (is_current True->False, eff_to set) and an insert for the new
    current row.  SCD2 and CDF were previously tested separately."""
    t = _init(spark, tmp_path, [(1, "bronze", "DE", _ts(1)), (2, "gold", "FR", _ts(1))])
    t.enable_cdf()
    v_before = t.latest_version()

    scd2_apply(
        t,
        _rows(spark, [(1, "silver", "DE", _ts(5)), (3, "new", "IT", _ts(5))]),
        KEYS,
        TRACKED,
        "ts",
    )
    v = t.latest_version()
    assert v == v_before + 1  # close-out + insert land in ONE commit

    # change_feed covers (from, to]: the merge commit alone
    feed = sorted(
        (
            r._change_type,
            r.cust_id,
            r.tier,
            r.eff_from,
            r.eff_to,
            r.is_current,
        )
        for r in t.change_feed(v_before, v).collect()
    )
    assert feed == [
        # new key 3 and key 1's new current row: inserts
        ("insert", 1, "silver", _ts(5), None, True),
        ("insert", 3, "new", _ts(5), None, True),
        # key 1's old current row: exact close-out pre/post images
        ("update_postimage", 1, "bronze", _ts(1), _ts(5), False),
        ("update_preimage", 1, "bronze", _ts(1), None, True),
    ]
    # untouched key 2 appears in NO image
    assert all(row[1] != 2 for row in feed)

    # CDF replay on top of the pre-commit snapshot equals the new snapshot
    pre = {
        (r.cust_id, r.tier, r.eff_from, r.eff_to, r.is_current)
        for r in t.read(version=v_before).collect()
    }
    for row in feed:
        tag, payload = row[0], row[1:]
        if tag in ("insert", "update_postimage"):
            pre.add(payload)
        elif tag in ("delete", "update_preimage"):
            pre.remove(payload)
    post = {
        (r.cust_id, r.tier, r.eff_from, r.eff_to, r.is_current)
        for r in t.read().collect()
    }
    assert pre == post
