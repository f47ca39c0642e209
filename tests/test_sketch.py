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


def test_hll_distinct_accuracy_and_small_range(spark):
    """The oracle proves engine-parity, not accuracy — pin both HLL
    branches against truth here: 5000 distinct keys must estimate within
    ~3 standard errors (1.04/sqrt(512) = 4.6% -> 14%), and a 30-distinct
    group must take the linear-counting branch and land within 15%."""
    from storm_spark.functions.sketch import hll_distinct

    rows = [("big", i) for i in range(5000)] + [("small", i) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, k long")
    got = {r.g: (r.est, r.n_zero_regs) for r in hll_distinct(df, "g", "k").collect()}
    big_est, _ = got["big"]
    small_est, small_zeros = got["small"]
    assert abs(big_est - 5000) / 5000 < 0.14, big_est
    assert abs(small_est - 30) / 30 < 0.15, small_est
    assert small_zeros > 0  # linear-counting branch actually taken


def test_hll_registers_merge_by_max_is_exact(spark):
    """HLL is max-linear: registers built on two halves and merged by MAX
    equal the registers built on the union — the streaming-merge
    contract (the CMS gate's linearity argument with max for sum)."""
    from pyspark.sql import functions as F

    from storm_spark.functions.sketch import hll_registers

    rows = [("g", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, k long")
    whole = {
        (r.g, r.reg): r.rho for r in hll_registers(df, "g", "k").collect()
    }
    h1 = hll_registers(df.filter("k % 2 = 0"), "g", "k")
    h2 = hll_registers(df.filter("k % 2 = 1"), "g", "k")
    merged = {
        (r.g, r.reg): r.rho
        for r in h1.unionByName(h2)
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    assert merged == whole
