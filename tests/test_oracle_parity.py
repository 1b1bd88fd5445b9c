"""Local replica of the driver's t2 gate: every registered query must match
its DuckDB oracle exactly (row count + sorted values) at sf0.01."""

from __future__ import annotations

import pytest

from delta_lake_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_harness import compare_one, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CORRECT)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    res = compare_one(spark, duck, name, QUERIES[name], ORACLE[name], SF_CORRECT)
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_callable():
    assert QUERIES, "registry must not be empty"
    for name in ORACLE:
        assert name in QUERIES


def test_entry_smoke(spark):
    import __spark_entry__

    df = __spark_entry__.entry(spark)
    assert df.count() > 0


def test_driver_window_pinned_to_registry():
    """ADVICE r3: the curated first-50 window must never silently shrink —
    every name must exist in the registry, carry an oracle, and the head of
    queries()/oracle_sql() must be exactly the window."""
    import __spark_entry__ as entry

    assert len(entry.DRIVER_WINDOW) == 50
    assert len(set(entry.DRIVER_WINDOW)) == 50
    missing = [k for k in entry.DRIVER_WINDOW if k not in QUERIES]
    assert not missing, f"window names absent from registry: {missing}"
    no_oracle = [k for k in entry.DRIVER_WINDOW if k not in ORACLE]
    assert not no_oracle, f"window names without an oracle: {no_oracle}"
    assert list(entry.queries())[:50] == entry.DRIVER_WINDOW
    assert list(entry.oracle_sql())[:50] == entry.DRIVER_WINDOW
