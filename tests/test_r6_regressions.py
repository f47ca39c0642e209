"""Regression pins for the round-5 ADVICE fixes (VERDICT r5 #7).

Two of the five mid-round findings got dedicated tests in r5
(test_advice_fixes.py covers the stateful twins); these pin the other
fixed divergences so a revert fails loudly:

- ``outlier_mad`` vs ``outlier_mad_hist`` must agree on NULL-bearing
  input — the window path's F.percentile skips NULLs, so the histogram
  path drops them too and both report n = NON-NULL count
  (robust.py:96-100, queries.py:2707-2710).
- ``series_similarity``'s cosine must survive a zero-norm (constant)
  series — the centered vector is all zeros; the 1e-12 denominator floor
  (similarity.py:_denom, matched by SQL_COS in the oracle) makes it score
  ~0 instead of NaN/DIVIDE_BY_ZERO.
"""

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("grp", StringType()),
        StructField("v", LongType()),
    ]
)

# NULL-bearing fixture: group "a" mixes values and NULLs (median/MAD must
# come from non-NULLs only, n must exclude NULLs); group "b" is all-NULL
# (both paths must drop it entirely); group "c" is NULL-free control with
# an unambiguous outlier.
ROWS = (
    [("a", v) for v in [10, 12, 11, 13, 10, 900, None, None, None]]
    + [("b", None), ("b", None)]
    + [("c", v) for v in [5, 5, 6, 5, 7, 5, 400]]
)


def _window_summary(spark, df):
    """The q_outlier_mad summarization (n = non-NULL count) over the
    window-path flags."""
    from storm_spark.functions import robust

    flagged = robust.mad_outliers(df, "grp", "v", k=3.0)
    out_v = F.when(F.col("is_outlier"), F.col("v"))
    return (
        flagged.groupBy("grp")
        .agg(
            F.count("v").alias("n"),
            F.sum(F.col("is_outlier").cast("bigint")).cast("bigint").alias("n_outliers"),
            F.round(F.min("median"), 2).alias("median"),
            F.round(F.min("mad"), 2).alias("mad"),
            F.min(out_v).cast("bigint").alias("min_outlier"),
            F.max(out_v).cast("bigint").alias("max_outlier"),
        )
        .filter(F.col("n") > 0)
    )


def test_mad_paths_agree_under_nulls(spark):
    from storm_spark.functions import robust

    df = spark.createDataFrame(ROWS, SCHEMA)
    win = {r["grp"]: r for r in _window_summary(spark, df).collect()}
    hist = {
        r["grp"]: r
        for r in robust.mad_outliers_histogram(df, "grp", "v", k=3.0)
        .withColumn("median", F.round("median", 2))
        .withColumn("mad", F.round("mad", 2))
        .collect()
    }
    # the all-NULL group must vanish from BOTH paths
    assert "b" not in win and "b" not in hist, (win.keys(), hist.keys())
    assert set(win) == set(hist) == {"a", "c"}
    for g in ("a", "c"):
        for fld in ("n", "n_outliers", "median", "mad", "min_outlier", "max_outlier"):
            assert win[g][fld] == hist[g][fld], (g, fld, win[g], hist[g])
    # the NULLs in group "a" must not count: 6 real values, one outlier
    assert win["a"]["n"] == 6 and win["a"]["n_outliers"] == 1, win["a"]


def test_mad_window_flags_null_value_rows_unflagged(spark):
    """Per-row contract: a NULL value can't be an outlier (the flag stays
    NULL/false, never true) and doesn't perturb its group's median."""
    from storm_spark.functions import robust

    df = spark.createDataFrame(ROWS, SCHEMA)
    rows = robust.mad_outliers(df, "grp", "v", k=3.0).filter(F.col("v").isNull()).collect()
    assert rows, "fixture lost its NULL rows"
    assert all(not r["is_outlier"] for r in rows), rows
    med_a = (
        robust.mad_outliers(df, "grp", "v", k=3.0)
        .filter((F.col("grp") == "a") & F.col("v").isNotNull())
        .select("median")
        .distinct()
        .collect()
    )
    assert len(med_a) == 1 and med_a[0][0] == pytest.approx(11.5), med_a


def test_series_similarity_zero_norm_series(spark):
    """A constant (zero-variance) series centers to the all-zeros vector;
    its cosine against anything must be ~0 via the 1e-12 floor — present
    in the top-k output with sim 0.0, never NaN and never a spurious
    rank-1 neighbor."""
    from storm_spark.functions.temporal import series_similarity_topk

    t0 = datetime(2024, 1, 1)
    rows = []
    # key 1: rising series; key 2: identical rising (perfect match);
    # key 3: CONSTANT — centered norm is zero
    for i in range(6):
        ts = t0 + timedelta(hours=i)
        rows.append((1, ts, 10 + i))
        rows.append((2, ts, 20 + i))
        rows.append((3, ts, 7))
    df = spark.createDataFrame(rows, ["k", "ts", "val"])
    out = series_similarity_topk(
        df, "k", "ts", F.col("val").cast("double"), query_keys=[1, 3], k=2
    ).collect()
    sims = {(r["query_key"], r["neighbor_key"]): r["sim"] for r in out}
    assert all(not math.isnan(s) for s in sims.values()), sims
    # constant query scores ~0 against every neighbor
    assert sims[(3, 1)] == pytest.approx(0.0, abs=1e-6)
    assert sims[(3, 2)] == pytest.approx(0.0, abs=1e-6)
    # real query: identical shape ranks 1 with sim 1, constant neighbor ~0
    assert sims[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    assert sims[(1, 3)] == pytest.approx(0.0, abs=1e-6)
