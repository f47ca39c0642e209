"""Column profiling (functions/profile.py)."""

import pytest

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


def test_psi_drift_hand_computed(spark):
    import math

    from storm_spark.functions.profile import psi_drift

    # lo=0, hi=10, 2 bins: [0,5) and [5,10). old: 3 low 1 high; new: 1 low 3 high
    old = spark.createDataFrame([(v,) for v in [1, 2, 3, 7]], "v bigint")
    new = spark.createDataFrame([(v,) for v in [4, 6, 8, 9]], "v bigint")
    out = {r.bin: r for r in psi_drift(old, new, "v", lo=0, hi=10, n_bins=2).collect()}
    assert (out[0].n_old, out[0].n_new) == (3, 1)
    assert (out[1].n_old, out[1].n_new) == (1, 3)
    expect0 = (0.25 - 0.75) * math.log(0.25 / 0.75)
    assert out[0].psi_term == round(expect0, 6)
    assert out[1].psi_term == round((0.75 - 0.25) * math.log(0.75 / 0.25), 6)


def test_psi_drift_empty_bin_is_finite(spark):
    """A bin present in one snapshot only floors at eps — large finite
    term, never ±inf/NaN; every bin row exists even when empty on both."""
    from storm_spark.functions.profile import psi_drift

    old = spark.createDataFrame([(1,), (2,)], "v bigint")
    new = spark.createDataFrame([(8,), (9,)], "v bigint")
    rows = psi_drift(old, new, "v", lo=0, hi=10, n_bins=5).collect()
    assert len(rows) == 5  # full grid
    import math

    assert all(math.isfinite(r.psi_term) for r in rows)


def test_psi_drift_clamps_out_of_range_and_skips_nulls(spark):
    from storm_spark.functions.profile import psi_drift

    old = spark.createDataFrame([(-5,), (99,), (None,)], "v bigint")
    new = spark.createDataFrame([(3,)], "v bigint")
    out = {r.bin: (r.n_old, r.n_new) for r in
           psi_drift(old, new, "v", lo=0, hi=10, n_bins=2).collect()}
    # -5 clamps into bin 0, 99 into bin 1, NULL dropped
    assert out == {0: (1, 1), 1: (1, 0)}


def test_group_mode_tiebreak_is_min_value(spark):
    from storm_spark.functions.profile import group_mode

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
            ("h", "z"), ("h", None)]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {(r.grp, r.mode, r.n) for r in group_mode(df, "grp", "v").collect()}
    assert got == {("g", "a", 2), ("h", "z", 1)}, got


def test_js_drift_bounded_symmetric_zero_bins(spark):
    """JSD properties the gate relies on: identical snapshots give total
    0; disjoint snapshots give exactly ln 2; empty bins contribute 0
    (no eps floor); swapping old/new mirrors p columns with the same
    terms sum (symmetry)."""
    import math

    from storm_spark.functions.profile import js_drift

    a = spark.createDataFrame([(i % 10,) for i in range(100)], "v long")
    b = spark.createDataFrame([(50 + i % 10,) for i in range(100)], "v long")

    same = js_drift(a, a, "v", lo=0, hi=100, n_bins=10).collect()
    assert sum(r.js_term for r in same) == 0.0

    disj = js_drift(a, b, "v", lo=0, hi=100, n_bins=10).collect()
    assert sum(r.js_term for r in disj) == pytest.approx(math.log(2), abs=1e-5)
    # bins with zero mass on both sides contribute exactly 0, never NaN
    assert all(r.js_term == 0.0 for r in disj if r.n_old == 0 and r.n_new == 0)

    fwd = sum(r.js_term for r in js_drift(a, b, "v", 0, 100, 10).collect())
    rev = sum(r.js_term for r in js_drift(b, a, "v", 0, 100, 10).collect())
    assert fwd == pytest.approx(rev, abs=2e-6)


def test_psi_streaming_trajectory_equals_batch_prefixes(spark):
    """The streaming_psi monitor's claim, pinned per epoch: folding each
    epoch's psi_bin_counts histogram into state by bin SUM yields — after
    EVERY epoch, not just the last — exactly psi_drift(ref, rows-so-far)
    (histograms are linear sketches; psi_from_histograms is the shared
    report step, so the trajectory a live monitor alerts on is the batch
    answer at each prefix)."""
    from pyspark.sql import functions as F

    from storm_spark.functions.profile import (
        psi_bin_counts,
        psi_drift,
        psi_from_histograms,
    )

    ref_rows = [(i % 80,) for i in range(200)]
    cur_rows = [(20 + (i * 7) % 80,) for i in range(150)]
    ref_df = spark.createDataFrame(ref_rows, "v long")
    cur_df = spark.createDataFrame(cur_rows, "v long")
    kw = dict(lo=0, hi=100, n_bins=10)

    ref = psi_bin_counts(ref_df, "v", **kw).select("bin", F.col("n").alias("n_old"))
    state = None
    for epoch in range(3):
        chunk = cur_df.filter(F.pmod(F.xxhash64("v"), F.lit(3)) == epoch)
        eh = psi_bin_counts(chunk, "v", **kw)
        state = (
            eh
            if state is None
            else state.unionByName(eh).groupBy("bin").agg(
                F.sum("n").cast("bigint").alias("n")
            )
        )
        sofar = cur_df.filter(F.pmod(F.xxhash64("v"), F.lit(3)) <= epoch)
        got = sorted(
            map(
                tuple,
                psi_from_histograms(
                    ref, state.select("bin", F.col("n").alias("n_new")), spark
                ).collect(),
            )
        )
        want = sorted(
            map(tuple, psi_drift(ref_df, sofar, "v", **kw).collect())
        )
        assert got == want, f"epoch {epoch} trajectory diverged"
