"""Robust statistics (functions/robust.py) — median/MAD outlier flagging."""

import pytest
from pyspark.sql import functions as F

from storm_spark.functions import robust


def test_mad_outliers_known_values(spark):
    # group a: values 1..9 plus a gross outlier 1000
    #   median(1..9,1000) = 9.5? -> sorted [1..9,1000], n=10, pos=4.5 -> 5.5
    #   deviations |v-5.5|: [4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,994.5]
    #   MAD = median(sorted devs)[.5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5]
    #       -> pos 4.5 between 2.5 and 2.5 = 2.5 ; 3*MAD = 7.5
    #   outlier: only 1000 (dev 994.5)
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = robust.mad_outliers(df, "grp", "v", k=3.0).collect()
    by_v = {r.v: r for r in out}
    assert by_v[1000.0].median == 5.5
    assert by_v[1000.0].mad == 2.5
    assert by_v[1000.0].is_outlier
    assert sum(r.is_outlier for r in out) == 1


def test_mad_outliers_degenerate_zero_mad(spark):
    # over half the group identical -> MAD = 0 -> any deviation flags
    rows = [("c", 5.0)] * 6 + [("c", 5.1), ("c", 4.9)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = robust.mad_outliers(df, "grp", "v", k=3.0).collect()
    assert sum(r.is_outlier for r in out) == 2
    assert all(r.is_outlier == (r.v != 5.0) for r in out)


def test_mad_outliers_naive_model_sweep(spark):
    # cross-check against a numpy reference on a deterministic long-tail mix
    import numpy as np

    vals = []
    for i in range(200):
        base = (i * 37) % 100
        spike = 10_000 + i if i % 23 == 0 else 0
        vals.append(float(base + spike))
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    out = robust.mad_outliers(df, "grp", "v", k=3.0).collect()

    a = np.array(vals)
    med = np.percentile(a, 50)  # linear interpolation == Spark percentile
    mad = np.percentile(np.abs(a - med), 50)
    expect = {v: abs(v - med) > 3.0 * mad for v in vals}
    for r in out:
        assert r.is_outlier == expect[r.v], (r.v, med, mad)
    assert out[0].median == pytest.approx(med)
    assert out[0].mad == pytest.approx(mad)


def test_mad_outliers_single_exchange_plan(spark):
    # both window medians share one partitioning: exactly ONE exchange
    df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "grp string, v double")
    plan = robust.mad_outliers(df, "grp", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_winsorize_known_bounds(spark):
    # values 0..10: p10 = 1.0, p90 = 9.0 (pos = p*(n-1) interpolation)
    rows = [("g", float(v)) for v in range(11)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r.v: r.winsorized for r in
           robust.winsorize(df, "grp", "v", lower=0.1, upper=0.9).collect()}
    assert out[0.0] == 1.0 and out[10.0] == 9.0  # tails clipped to bounds
    for v in range(1, 10):
        assert out[float(v)] == float(v)  # interior untouched
    # row count preserved (the transform-not-delete contract)
    assert robust.winsorize(df, "grp", "v").count() == 11


def test_winsorize_validation_and_plan(spark):
    import pytest as _pt

    df = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    with _pt.raises(ValueError):
        robust.winsorize(df, "grp", "v", lower=0.5, upper=0.5)
    # both bounds share one partitioning: exactly ONE exchange
    plan = robust.winsorize(df, "grp", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_winsorize_preserves_nulls(spark):
    """A NULL value must stay NULL — least/greatest skip nulls in both
    engines, which would silently rewrite missing data as the lower bound."""
    rows = [("g", float(v)) for v in range(11)] + [("g", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = robust.winsorize(df, "grp", "v", lower=0.1, upper=0.9).collect()
    nulls = [r for r in out if r.v is None]
    assert len(nulls) == 1 and nulls[0].winsorized is None
    # bounds unaffected by the NULL row (percentile ignores nulls)
    by_v = {r.v: r.winsorized for r in out if r.v is not None}
    assert by_v[0.0] == 1.0 and by_v[10.0] == 9.0


def test_mad_histogram_matches_window_path(spark):
    """The histogram formulation must agree with the window formulation on
    integer inputs — including even/odd group sizes (interpolated medians)
    and the degenerate MAD=0 group."""
    cases = [
        [1, 2, 3, 4, 100],                     # odd n
        [1, 2, 3, 4, 5, 1000],                 # even n, gross outlier
        [5, 5, 5, 5, 5, 5, 4, 6],              # MAD = 0 degenerate
        [7],                                   # singleton
        list(range(50)) + [10_000, -10_000],   # symmetric tails
    ]
    rows = [(f"g{i}", float(v)) for i, vs in enumerate(cases) for v in vs]
    df = spark.createDataFrame(rows, "grp string, v double")
    win = robust.mad_outliers(df, "grp", "v", k=3.0)
    from pyspark.sql import functions as F

    win_agg = {
        r.grp: (r.n, r.n_outliers, r.median, r.mad, r.min_o, r.max_o)
        for r in win.groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_outlier").cast("bigint")).alias("n_outliers"),
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
            F.min(F.when(F.col("is_outlier"), F.col("v"))).alias("min_o"),
            F.max(F.when(F.col("is_outlier"), F.col("v"))).alias("max_o"),
        )
        .collect()
    }
    hist_agg = {
        r.grp: (r.n, r.n_outliers, r.median, r.mad, r.min_outlier, r.max_outlier)
        for r in robust.mad_outliers_histogram(df, "grp", "v", k=3.0).collect()
    }
    assert win_agg == hist_agg


def test_mad_histogram_cost_tracks_distinct_values(spark):
    """A fat group with few distinct values collapses to a tiny histogram
    before any window — the raw rows never reach a per-group sort."""
    rows = [("g", float(v % 10)) for v in range(20_000)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = robust.mad_outliers_histogram(df, "grp", "v", k=3.0).collect()
    assert out[0].n == 20_000 and out[0].median == 4.5


def test_mad_histogram_matches_window_with_nulls(spark):
    """F.percentile skips NULLs in the window path; the histogram path must
    drop them too or the (group, NULL) bucket inflates n and shifts every
    cumulative position (review-confirmed divergence: [1,2,3,NULL] gave
    window median 2.0 / hist median 1.5 before the guard)."""
    from pyspark.sql import functions as F

    rows = [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None),
            ("h", None), ("h", 5.0), ("h", None), ("h", 7.0), ("h", 100.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    win = robust.mad_outliers(df, "grp", "v", k=3.0)
    win_agg = {
        r.grp: (r.n, r.median, r.mad)
        for r in win.groupBy("grp")
        .agg(
            F.sum(F.col("v").isNotNull().cast("bigint")).alias("n"),
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
        )
        .collect()
    }
    hist_agg = {
        r.grp: (r.n, r.median, r.mad)
        for r in robust.mad_outliers_histogram(df, "grp", "v", k=3.0).collect()
    }
    assert win_agg == hist_agg
    assert win_agg["g"] == (3, 2.0, 1.0)


def test_trailing_corr_tracks_local_relationship(spark):
    """A key whose y flips from +2x to -2x mid-series: early rows r=1, and
    once the window holds only flipped rows r=-1; NULL pairs occupy frame
    slots but score NULL."""
    from datetime import datetime

    from storm_spark.functions import robust

    T = datetime
    rows = [("k", T(2024, 1, 1, h), h, 2 * h) for h in range(8)]
    rows += [("k", T(2024, 1, 1, 8 + i), 8 + i, -2 * (8 + i)) for i in range(8)]
    rows.append(("k", T(2024, 1, 2, 1), None, 5))
    df = spark.createDataFrame(rows, "k string, ts timestamp, x long, y long")
    out = robust.trailing_corr(
        df, "k", ["ts"], "x", "y", window=8, min_periods=4
    ).collect()
    by_hour = {r.ts: r.r for r in out}
    assert by_hour[T(2024, 1, 1, 7)] == pytest.approx(1.0)
    assert by_hour[T(2024, 1, 1, 15)] == pytest.approx(-1.0)
    assert by_hour[T(2024, 1, 2, 1)] is None  # NULL x -> NULL r


def test_rolling_median_exact_windows(spark):
    """Hand-computed trailing-3 medians, including the spike a trailing
    mean would absorb: values 10, 1000, 20, 30 -> medians 10, 505, 20, 30."""
    from storm_spark.functions.robust import rolling_median

    rows = [(1, i, i, v) for i, v in enumerate([10, 1000, 20, 30])]
    df = spark.createDataFrame(rows, "k long, t long, id long, v long")
    got = {
        r.id: r.roll_med
        for r in rolling_median(df, "k", "t", "v", "id", window_rows=3).collect()
    }
    assert got == {0: 10.0, 1: 505.0, 2: 20.0, 3: 30.0}, got


def test_percentiles_from_counts_bit_identical_to_raw(spark):
    """The histogram reconstruction must equal F.percentile on the raw
    rows EXACTLY (same bracketing doubles, same interpolation form) —
    the claim streaming_percentile's oracle equality rests on. Includes
    ties, singleton groups, and p hitting exact integer positions."""
    import random

    from pyspark.sql import functions as F

    from storm_spark.functions.robust import percentiles_from_counts

    rng = random.Random(7)
    rows = [
        (g, rng.randint(0, 30))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(1, 200))
    ] + [("solo", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    ps = [0.0, 0.25, 0.5, 0.95, 0.99, 1.0]
    hist = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    got = {
        r.g: tuple(r[f"p_{i}"] for i in range(len(ps)))
        for r in percentiles_from_counts(hist, ["g"], "v", "n", ps).collect()
    }
    want = {
        r.g: tuple(r.p)
        for r in df.groupBy("g").agg(F.percentile("v", ps).alias("p")).collect()
    }
    assert got == want
    assert got["solo"] == (7.0,) * len(ps)
