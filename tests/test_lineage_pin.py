"""ops/lineage.pin: the SPARK_GRAFT_RELIABLE_CHECKPOINT switch must change
ONLY the fault-tolerance mechanics (reliable checkpoint files instead of
executor-local blocks), never the results. ADVICE r6: p03's localCheckpoint
is a fault-tolerance regression on a multi-node cluster; this flag is the
documented escape hatch, so every pin() consumer is differentially checked
here at smoke scale."""

from __future__ import annotations

import pytest

from delta_lake_spark.ops import lineage
from delta_lake_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

PIN_QUERIES = [
    "p03_release_pipeline",
    "q73_copurchase_pagerank",
    "q75_hierarchy_rollup",
]


@pytest.mark.parametrize("name", PIN_QUERIES)
def test_reliable_checkpoint_same_results(spark, monkeypatch, name):
    if name not in QUERIES:
        pytest.skip(f"{name} not registered")
    base = sorted(map(tuple, QUERIES[name](spark, SF_SMOKE).collect()))
    monkeypatch.setenv(lineage._ENV_FLAG, "1")
    reliable = sorted(map(tuple, QUERIES[name](spark, SF_SMOKE).collect()))
    assert base == reliable


def test_reliable_mode_provisions_checkpoint_dir(spark, monkeypatch):
    monkeypatch.setenv(lineage._ENV_FLAG, "1")
    out = lineage.pin(spark.range(10))
    assert out.count() == 10
    assert spark.sparkContext.getCheckpointDir() is not None
