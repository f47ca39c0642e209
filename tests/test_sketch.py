"""Count-min sketch: one-sided error, fixed size, exact on skewed heavy keys."""

import pytest
from pyspark.sql import functions as F

from storm_spark.functions.sketch import cms_build, cms_estimate


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' 500 times, 50 distinct cold keys 2x each
    hot = spark.range(500).select(F.lit("hot").alias("k"))
    cold = spark.range(100).select(F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"))
    return hot.unionByName(cold)


def test_cms_size_bounded(spark, skewed):
    sk = cms_build(skewed, "k", depth=4, width=64)
    assert sk.count() <= 4 * 64


def test_cms_one_sided_and_tight_on_heavy(spark, skewed):
    sk = cms_build(skewed, "k", depth=4, width=64)
    keys = skewed.select("k").distinct()
    est = {r.k: r.est for r in cms_estimate(sk, keys, "k", depth=4, width=64).collect()}
    true = {r.k: r.n for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    for k, t in true.items():
        assert est[k] >= t  # never undercounts
    # the heavy key's estimate is tight (collisions add at most the cold mass)
    assert est["hot"] - true["hot"] <= 100


def test_cms_missing_key_estimates_near_zero(spark, skewed):
    sk = cms_build(skewed, "k", depth=4, width=64)
    ghost = spark.createDataFrame([("nope",)], "k string")
    est = cms_estimate(sk, ghost, "k", depth=4, width=64).collect()[0].est
    assert 0 <= est <= 100  # bounded by collision mass, usually ~0
