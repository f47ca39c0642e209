"""Salted aggregation / replicated join must be result-identical to the
unsalted plans on skewed input (one key holding most rows)."""

import pytest
from pyspark.sql import functions as F

from storm_spark.functions.skew import replicated_join, salted_aggregate


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' has 5000 rows; 10 cold keys have 10 each
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(skewed):
    got = salted_aggregate(
        skewed,
        ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        salt=8,
    )
    want = skewed.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_collect_set_matches_plain(skewed):
    got = salted_aggregate(skewed, ["k"], {"vals": ("collect_set", "v")}, salt=4).collect()
    want = skewed.groupBy("k").agg(F.collect_set("v").alias("vals")).collect()
    g = {r.k: sorted(r.vals) for r in got}
    w = {r.k: sorted(r.vals) for r in want}
    assert g == w


def test_salted_aggregate_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"m": ("median", "v")})


def test_replicated_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c2", "C2")], "k string, label string"
    )
    got = replicated_join(skewed, dim, ["k"], salt=4)
    want = skewed.join(dim, ["k"])
    assert got.count() == want.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_replicated_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    got = replicated_join(skewed, dim, ["k"], salt=4, how="left")
    want = skewed.join(dim, ["k"], "left")
    assert got.count() == want.count()
    assert got.filter(F.col("label").isNull()).count() == 100


def test_bloom_pruned_join_identical_to_plain(spark):
    """Bloom pruning is result-transparent: false positives reach the exact
    join and die there; the joined output matches the plain join exactly."""
    from storm_spark.functions.skew import bloom_pruned_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey", "l_quantity")
    od = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_orderkey")
    )
    got = sorted(
        map(tuple, bloom_pruned_join(li, od, "l_orderkey", "o_orderkey").collect())
    )
    want = sorted(map(tuple, li.join(od, li.l_orderkey == od.o_orderkey).collect()))
    assert got == want and len(got) > 0

    semi = sorted(
        map(
            tuple,
            bloom_pruned_join(li, od, "l_orderkey", "o_orderkey", how="left_semi").collect(),
        )
    )
    want_semi = sorted(
        map(tuple, li.join(od, li.l_orderkey == od.o_orderkey, "left_semi").collect())
    )
    assert semi == want_semi


def test_bloom_pruned_join_rejects_outer(spark):
    import pytest as _pytest

    from storm_spark.functions.skew import bloom_pruned_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    od = spark.read.parquet(f"{sf}/orders.parquet")
    with _pytest.raises(ValueError, match="inner/left_semi"):
        bloom_pruned_join(li, od, "l_orderkey", "o_orderkey", how="left")
