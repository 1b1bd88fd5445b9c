"""Property tests for the funnel-free global ranking primitives
(ops/ranking.py): on random integer frames and random partition counts,
global_row_number must equal the sorted enumeration and global_cumsum the
exact prefix sums — the invariant every quintile/cumsum query (q22, q89,
q93, q96, q97, t25, t27, s11...) stands on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_spark.ops.ranking import (
    global_cumsum,
    global_row_number,
    global_row_number_grouped,
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # value (ties expected)
        st.integers(min_value=0, max_value=10_000),    # unique-ish id
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],  # ids unique -> (value, id) is a unique key
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_rows, parts=st.integers(min_value=1, max_value=7))
def test_global_row_number_is_sorted_enumeration(spark, rows, parts):
    df = spark.createDataFrame(rows, "v long, id long")
    got = {
        (r.v, r.id): r.rn
        for r in global_row_number(df, ["v", "id"], num_partitions=parts).collect()
    }
    expected = {kv: i + 1 for i, kv in enumerate(sorted(rows))}
    assert got == expected


_grouped_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # group (NULLs too)
        st.integers(min_value=-1000, max_value=1000),  # value (ties expected)
        st.integers(min_value=0, max_value=10_000),    # unique-ish id
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[2],
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_grouped_rows, parts=st.integers(min_value=1, max_value=7))
def test_global_row_number_grouped_matches_per_group_enumeration(spark, rows, parts):
    """The fused (one range exchange for ALL groups, r9) per-group ranking
    must equal running the enumeration independently within each group —
    including a NULL group, which is one group for ranking purposes."""
    df = spark.createDataFrame(rows, "g int, v long, id long")
    ranked, totals = global_row_number_grouped(
        df, "g", ["v", "id"], out_col="rn", num_partitions=parts
    )
    got = {(r.g, r.v, r.id): r.rn for r in ranked.collect()}
    expected, exp_totals = {}, {}
    none_key = (-(10**9),)  # sort NULL group first, mirroring NULLS FIRST
    for g in sorted({r[0] for r in rows}, key=lambda x: none_key if x is None else (x,)):
        members = sorted((v, i) for gg, v, i in rows if gg == g)
        exp_totals[g] = len(members)
        for rank, (v, i) in enumerate(members, start=1):
            expected[(g, v, i)] = rank
    assert got == expected
    assert totals == exp_totals


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_rows, parts=st.integers(min_value=1, max_value=7))
def test_global_cumsum_is_prefix_sum(spark, rows, parts):
    df = spark.createDataFrame(rows, "v long, id long")
    got = {
        (r.v, r.id): r.cumsum
        for r in global_cumsum(df, "v", ["v", "id"], num_partitions=parts).collect()
    }
    acc, expected = 0, {}
    for v, i in sorted(rows):
        acc += v
        expected[(v, i)] = acc
    assert got == expected
