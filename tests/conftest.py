from __future__ import annotations

import os

import pytest

from delta_lake_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Two-tier suite (VERDICT r9 item 1): the DEFAULT run is the fast,
# driver-facing gate — plan lints, driver-window + headline oracle parity
# at sf0.01, plan-shape and property tests — sized to finish well inside
# the driver's verify budget (the full 1,128-test suite grew to 38-44 min
# and the driver's r9 run was cut off at ~83% with zero failures, a broken
# contract).  Tests marked `full` (degenerate corpora sweeps, the
# full-width 201-query parity sweep, hypothesis deep runs, table-format
# differentials) run when SPARK_GRAFT_TESTS_FULL=1 — the builder's
# round-close check always sets it.
RUN_FULL = os.environ.get("SPARK_GRAFT_TESTS_FULL", "0") == "1"


def pytest_collection_modifyitems(config, items):
    if RUN_FULL:
        return
    skip = pytest.mark.skip(
        reason="full tier — set SPARK_GRAFT_TESTS_FULL=1 (round-close runs it)"
    )
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="delta_lake_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()
