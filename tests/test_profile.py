"""Column profiling (functions/profile.py)."""

from storm_spark.functions import profile


def test_profile_columns_stats(spark):
    rows = [
        (1, "a"), (2, "a"), (3, None), (None, "b"), (None, None),
    ]
    df = spark.createDataFrame(rows, "k bigint, s string")
    got = {r.column: r for r in profile.profile_columns(df).collect()}
    assert got["k"].n_nulls == 2 and got["k"].n_distinct == 3
    assert got["k"].min_val == "1" and got["k"].max_val == "3"
    assert got["s"].n_nulls == 2 and got["s"].n_distinct == 2
    assert got["s"].min_val == "a" and got["s"].max_val == "b"


def test_profile_columns_numeric_not_lexicographic(spark):
    # min/max must be computed on the typed column BEFORE stringifying:
    # lexicographic would give min '10', max '9'
    df = spark.createDataFrame([(9,), (10,), (100,)], "k bigint")
    r = profile.profile_columns(df, ["k"]).first()
    assert r.min_val == "9" and r.max_val == "100"


def test_profile_single_scan(spark):
    # all columns' measures fold into one aggregate over one scan — the
    # plan must contain exactly one table scan
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    plan = profile.profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1, plan
