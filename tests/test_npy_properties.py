"""Property-based round-trip for the npy DataSource: arbitrary shard
layouts (counts, sizes, dims, including single-row shards) must read back
losslessly with positional vec_ids in shard order."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_spark.io.npy_source import register_npy_source


@pytest.fixture(scope="module")
def npy_spark(spark):
    register_npy_source(spark)
    return spark


@given(
    shard_rows=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=4),
    dim=st.integers(min_value=1, max_value=8),
    rpp=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_npy_round_trip_any_layout(npy_spark, tmp_path_factory, shard_rows, dim, rpp):
    d = tmp_path_factory.mktemp("npy_prop")
    rng = np.random.default_rng(sum(shard_rows) * 31 + dim)
    mats = [rng.normal(size=(r, dim)).astype(np.float32) for r in shard_rows]
    for i, m in enumerate(mats):
        np.save(d / f"s{i}.npy", m)
    df = (
        npy_spark.read.format("npy")
        .option("rows_per_partition", rpp)
        .load(str(d))
        .orderBy("vec_id")
    )
    rows = df.collect()
    expected = np.concatenate(mats)
    assert [r.vec_id for r in rows] == list(range(expected.shape[0]))
    assert np.array_equal(np.array([r.embedding for r in rows], dtype=np.float32), expected)
