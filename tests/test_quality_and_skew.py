"""Quality-gate and skew-utility tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_spark.catalog import table
from delta_lake_spark.ops.skew import (
    heavy_hitters,
    hot_key_salted_join,
    salted_join,
    two_phase_agg,
)
from delta_lake_spark.quality import (
    QualityError,
    assert_count_equals,
    assert_invariant,
    assert_no_nulls,
    assert_schema,
    assert_unique,
    reconcile_sums,
)
from tests.conftest import SF_SMOKE


def test_quality_gates_pass_and_fail(spark):
    nation = table(spark, SF_SMOKE, "nation")
    assert_schema(nation, nation.schema)
    assert_count_equals(nation, nation)
    assert_unique(nation, ["n_nationkey"])
    assert_no_nulls(nation, ["n_nationkey", "n_name"])
    assert_invariant(nation, F.col("n_nationkey") >= 0)
    reconcile_sums(nation, nation, "n_nationkey", decimals=0)

    dup = nation.union(nation)
    with pytest.raises(QualityError):
        assert_unique(dup, ["n_nationkey"])
    with pytest.raises(QualityError):
        assert_count_equals(nation, dup)
    with pytest.raises(QualityError):
        assert_invariant(nation, F.col("n_nationkey") > 5)
    withnull = nation.withColumn(
        "n_name", F.when(F.col("n_nationkey") == 0, None).otherwise(F.col("n_name"))
    )
    with pytest.raises(QualityError):
        assert_no_nulls(withnull, ["n_name"])
    with pytest.raises(QualityError):
        reconcile_sums(nation, dup, "n_nationkey", decimals=0)


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows on one key
    fact = spark.createDataFrame(
        [Row(k=(0 if i % 10 else i % 3), v=i) for i in range(2000)]
    )
    dim = spark.createDataFrame([Row(k=i, name=f"d{i}") for i in range(5)])
    plain = fact.join(dim, ["k"], "inner")
    salted = salted_join(fact, dim, ["k"], n_salts=4)
    assert _rowset(salted.select("k", "v", "name")) == _rowset(
        plain.select("k", "v", "name")
    )
    left = salted_join(fact, dim.filter("k < 2"), ["k"], n_salts=4, how="left")
    plain_left = fact.join(dim.filter("k < 2"), ["k"], "left")
    assert _rowset(left.select("k", "v", "name")) == _rowset(
        plain_left.select("k", "v", "name")
    )


def test_two_phase_agg_matches_plain_agg(spark):
    df = spark.createDataFrame(
        [Row(k=(0 if i % 5 else 1), x=float(i)) for i in range(1000)]
    )
    got = two_phase_agg(
        df,
        ["k"],
        {"n": ("x", "count"), "sx": ("x", "sum"), "mn": ("x", "min"), "mx": ("x", "max")},
        n_salts=4,
    )
    want = df.groupBy("k").agg(
        F.count("x").alias("n"),
        F.sum("x").alias("sx"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    assert _rowset(got) == _rowset(want)


def test_split_by_expectations(spark):
    from delta_lake_spark.quality import split_by_expectations

    df = spark.range(10).withColumn(
        "amount", F.when(F.col("id") < 7, F.col("id") * 10).otherwise(F.lit(None))
    )
    good, bad = split_by_expectations(
        df, {"amount_set": "amount IS NOT NULL", "amount_small": "amount < 50"}
    )
    assert sorted(r.id for r in good.collect()) == [0, 1, 2, 3, 4]
    got = {r.id: sorted(r._failed_expectations) for r in bad.collect()}
    assert got[5] == ["amount_small"]
    assert got[9] == ["amount_set", "amount_small"]  # null fails both


def test_expect_or_quarantine_routes_bad_rows(spark, tmp_path):
    from delta_lake_spark.quality import expect_or_quarantine
    from delta_lake_spark.tables import ManagedTable

    df = spark.range(10).withColumn("v", F.pmod("id", F.lit(3)))
    q = ManagedTable(spark, str(tmp_path / "quarantine"))
    good = expect_or_quarantine(df, {"v_nonzero": "v != 0"}, q)
    assert good.count() == 6
    qr = q.read()
    assert qr.count() == 4
    assert qr.filter(F.array_contains("_failed_expectations", "v_nonzero")).count() == 4


def test_scaled_corpus_marker_tracks_copy_count(spark, tmp_path):
    """ADVICE r3: generate_scaled_corpus must regenerate when called with a
    different copy count instead of silently reusing the cached corpus."""
    from delta_lake_spark.benchmark.scaleup import generate_scaled_corpus

    out = str(tmp_path / "scaled")
    base = "/root/testdata/sf0.001"
    r1 = generate_scaled_corpus(spark, base, out, copies=2)
    assert r1["generated"] and r1["copies"] == 2
    r2 = generate_scaled_corpus(spark, base, out, copies=2)
    assert not r2["generated"]  # cache hit on same count
    r3 = generate_scaled_corpus(spark, base, out, copies=3)
    assert r3["generated"] and r3["copies"] == 3  # count change regenerates
    n_orders = spark.read.parquet(f"{out}/orders.parquet").count()
    base_orders = spark.read.parquet(f"{base}/orders.parquet").count()
    assert n_orders == 3 * base_orders


def _sym_diff_count(a, b):
    return a.exceptAll(b).union(b.exceptAll(a)).count()


def test_heavy_hitters_detects_hot_keys(spark):
    # orders concentrated on one synthetic key: ~50% on key 0
    o = table(spark, SF_SMOKE, "orders").withColumn(
        "k", F.when(F.col("o_orderkey") % 2 == 0, 0).otherwise(F.col("o_orderkey"))
    )
    hot = heavy_hitters(o, ["k"], min_share=0.1)
    assert hot == [(0,)]
    # sampled detection still finds a 50%-share key
    hot_sampled = heavy_hitters(o, ["k"], min_share=0.1, sample_fraction=0.2)
    assert hot_sampled == [(0,)]
    # nothing above an impossible share
    assert heavy_hitters(o, ["k"], min_share=0.9) == []


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hot_key_salted_join_matches_plain(spark, how):
    o = table(spark, SF_SMOKE, "orders").withColumn(
        "k", F.when(F.col("o_orderkey") % 2 == 0, 0).otherwise(F.col("o_orderkey"))
    ).select("k", "o_totalprice")
    # dim misses some keys so the left null side is exercised
    dim = (
        table(spark, SF_SMOKE, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .filter(F.col("k") % 3 != 1)
        .withColumn("tag", F.concat(F.lit("t"), F.col("k")))
        .union(spark.createDataFrame([(0, "t0")], "k long, tag string"))
        .distinct()
    )
    plain = o.join(dim, "k", how)
    # detection path (hot_keys=None) and explicit path must both match
    auto = hot_key_salted_join(o, dim, ["k"], how=how, min_share=0.1)
    explicit = hot_key_salted_join(o, dim, ["k"], hot_keys=[(0,)], how=how)
    assert _sym_diff_count(plain, auto) == 0
    assert _sym_diff_count(plain, explicit) == 0


def test_hot_key_salted_join_no_hot_keys_degenerates(spark):
    o = table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey")
    got = hot_key_salted_join(o, c, ["o_custkey"], hot_keys=[])
    assert _sym_diff_count(plain, got) == 0


def test_hot_key_salted_join_rejects_outer(spark):
    o = table(spark, SF_SMOKE, "orders")
    with pytest.raises(ValueError, match="inner/left"):
        hot_key_salted_join(o, o, ["o_orderkey"], how="full")


def test_profile_counts_nulls_and_types(spark):
    from delta_lake_spark.quality import profile

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 2.5), (2, "b", 3.5), (None, "b", None)],
        "k long, s string, v double",
    )
    rows = {r["column_name"]: r for r in profile(df, exact_distinct=True).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 2  # nulls not counted as distinct
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["k"]["min_str"] is None
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["s"]["min_num"] is None
    assert rows["v"]["n_nulls"] == 2 and rows["v"]["max_num"] == 3.5
    # approx path: same shape, estimates exact at this cardinality
    approx = {r["column_name"]: r for r in profile(df).collect()}
    assert approx["k"]["n_distinct"] == 2
    # column subset
    assert profile(df, cols=["k"]).count() == 1
