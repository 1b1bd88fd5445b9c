"""Unit tests for the composite window operators (gap fill, date spine,
diff, as-of join) on tiny literal frames — reference semantics from
SURVEY.md §2.5 / FIXTURES.md §3."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from delta_lake_spark.ops.windows import asof_join, date_spine, diff_cols, gap_fill


def _rates(spark):
    return spark.createDataFrame(
        [
            (dt.date(2024, 1, 1), 90.0),
            (dt.date(2024, 1, 2), None),
            (dt.date(2024, 1, 5), 95.0),
        ],
        "date date, rate double",
    )


def test_date_spine_covers_every_day(spark):
    spine = date_spine(_rates(spark), "date")
    days = [r["date"] for r in spine.orderBy("date").collect()]
    assert days == [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(5)]


def test_gap_fill_forward_fills_and_keeps_leading_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 10.0), (3, None), (4, 12.0), (5, None)], "i int, v double"
    )
    out = {r["i"]: r["v"] for r in gap_fill(df, ["v"], order_by=["i"]).collect()}
    assert out == {1: None, 2: 10.0, 3: 10.0, 4: 12.0, 5: 12.0}


def test_diff_cols_first_row_null(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 13.0), (3, 11.5)], "i int, v double")
    out = {r["i"]: r["v_change"] for r in diff_cols(df, ["v"], order_by=["i"]).collect()}
    assert out[1] is None and out[2] == 3.0 and out[3] == -1.5


def test_asof_join_picks_most_recent_at_or_before(spark):
    events = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1)), (2, dt.date(2024, 1, 3)), (3, dt.date(2023, 12, 31))],
        "event_id int, d date",
    )
    rates = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 90.0), (dt.date(2024, 1, 2), 91.0)], "d date, rate double"
    )
    out = {r["event_id"]: (r["rate"], r["d_asof"]) for r in asof_join(events, rates, on="d").collect()}
    assert out[1] == (90.0, dt.date(2024, 1, 1))  # same-day inclusive
    assert out[2] == (91.0, dt.date(2024, 1, 2))  # most recent before
    assert out[3] == (None, None)  # nothing at or before -> null


def test_asof_join_null_keys_never_match(spark):
    """NULL-key semantics (r9, ops/windows.asof_join docstring): a NULL
    right key is dropped (would otherwise ffill into everything via
    NULLS-FIRST); a NULL left key keeps its row with NULL payload —
    both matching DuckDB ASOF LEFT JOIN."""
    events = spark.createDataFrame(
        [(1, dt.date(2024, 1, 2)), (2, None), (3, dt.date(2023, 1, 1))],
        "event_id int, d date",
    )
    rates = spark.createDataFrame(
        [(None, 999.0), (dt.date(2024, 1, 1), 90.0)], "d date, rate double"
    )
    out = {
        r["event_id"]: (r["rate"], r["d_asof"])
        for r in asof_join(events, rates, on="d").collect()
    }
    assert out[1] == (90.0, dt.date(2024, 1, 1))  # real match unaffected
    assert out[2] == (None, None)  # NULL left key -> no match, row kept
    assert out[3] == (None, None)  # earlier than every rate; NULL rate must NOT leak


def test_gap_fill_partitioned(spark):
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, None), ("b", 1, None), ("b", 2, 7.0)],
        "k string, i int, v double",
    )
    out = {
        (r["k"], r["i"]): r["v"]
        for r in gap_fill(df, ["v"], order_by=["i"], partition_by=["k"]).collect()
    }
    assert out == {("a", 1): 5.0, ("a", 2): 5.0, ("b", 1): None, ("b", 2): 7.0}


def test_connected_components_known_graph(spark):
    """CC on a hand-built graph: two chains and an isolated edge."""
    from pyspark.sql import Row

    from delta_lake_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11), Row(id_a=20, id_b=21), Row(id_a=21, id_b=22)]
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
