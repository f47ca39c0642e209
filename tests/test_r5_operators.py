"""Edge cases for the r5 operator additions: pit_join (struct carry),
group_corr (exact-sum Pearson), group_entropy (ordered fold), k_anonymize
(suppression boundary)."""

from datetime import datetime

import math

import pytest
from pyspark.sql import functions as F


def test_pit_join_attaches_version_valid_at_ts(spark):
    from storm_spark.functions.temporal import pit_join

    T = datetime
    dim = spark.createDataFrame(
        [
            ("u1", "bronze", T(2024, 1, 1)),
            ("u1", "gold", T(2024, 6, 1)),
            ("u2", "silver", T(2024, 3, 1)),
        ],
        "key string, tier string, valid_from timestamp",
    )
    fact = spark.createDataFrame(
        [
            ("u1", T(2024, 3, 1), 1),   # mid first interval -> bronze
            ("u1", T(2024, 6, 1), 2),   # ON version start -> gold (asof <=)
            ("u1", T(2024, 9, 1), 3),   # after last -> gold (open interval)
            ("u2", T(2024, 1, 1), 4),   # before first version -> NULL
        ],
        "key string, ts timestamp, fid int",
    )
    got = {
        r.fid: (r.tier, r.valid_from)
        for r in pit_join(fact, dim, "key", "ts", ["tier"]).collect()
    }
    assert got[1] == ("bronze", T(2024, 1, 1))
    assert got[2] == ("gold", T(2024, 6, 1))
    assert got[3] == ("gold", T(2024, 6, 1))
    assert got[4] == (None, None)


def test_pit_join_null_attr_not_inherited(spark):
    """A version whose attribute is legitimately NULL must NOT inherit the
    previous version's value — the struct-carry contract."""
    from storm_spark.functions.temporal import pit_join

    T = datetime
    dim = spark.createDataFrame(
        [("u1", "a", T(2024, 1, 1)), ("u1", None, T(2024, 2, 1))],
        "key string, attr string, valid_from timestamp",
    )
    fact = spark.createDataFrame(
        [("u1", T(2024, 3, 1), 1)], "key string, ts timestamp, fid int"
    )
    row = pit_join(fact, dim, "key", "ts", ["attr"]).collect()[0]
    assert row.attr is None            # NOT "a"
    assert row.valid_from == T(2024, 2, 1)  # but the version DID attach


def test_pit_join_is_pure_expression(spark):
    """No join operator and no Python eval: one union + one window."""
    from storm_spark.functions.temporal import pit_join

    T = datetime
    dim = spark.createDataFrame(
        [("u1", "a", T(2024, 1, 1))], "key string, attr string, valid_from timestamp"
    )
    fact = spark.createDataFrame(
        [("u1", T(2024, 3, 1), 1)], "key string, ts timestamp, fid int"
    )
    df = pit_join(fact, dim, "key", "ts", ["attr"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_group_corr_exact_cases(spark):
    from storm_spark.functions.profile import group_corr

    rows = (
        [("lin", x, 2 * x + 7) for x in range(10)]          # r = 1
        + [("anti", x, -3 * x) for x in range(10)]          # r = -1
        + [("const", x, 5) for x in range(10)]              # zero y-var -> NULL
        + [("tiny", 1, 1)]                                  # n < min_n -> NULL
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: (r.n, r.r) for r in group_corr(df, "g", "x", "y").collect()}
    assert got["lin"] == (10, 1.0)
    assert got["anti"] == (10, -1.0)
    assert got["const"][1] is None
    assert got["tiny"] == (1, None)


def test_group_corr_skips_null_pairs(spark):
    from storm_spark.functions.profile import group_corr

    df = spark.createDataFrame(
        [("g", 1, 2), ("g", 2, 4), ("g", 3, 6), ("g", 4, None), ("g", None, 9)],
        "g string, x long, y long",
    )
    r = group_corr(df, "g", "x", "y").collect()[0]
    assert r.n == 3  # pairwise-complete only
    assert r.r == 1.0


def test_group_entropy_values(spark):
    from storm_spark.functions.profile import group_entropy

    rows = (
        [("uniform", c) for c in "abcd" * 4]   # 4 cats x 4 -> ln(4)
        + [("single", "z")] * 8                # one cat -> 0
        + [("skew", "a")] * 3 + [("skew", "b")]
    )
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r.g: (r.n, r.n_cats, r.entropy) for r in group_entropy(df, "g", "c").collect()}
    assert got["uniform"] == (16, 4, round(math.log(4), 6))
    assert got["single"] == (8, 1, -0.0) or got["single"] == (8, 1, 0.0)
    p = [3 / 4, 1 / 4]
    assert got["skew"][2] == pytest.approx(-sum(x * math.log(x) for x in p), abs=1e-6)


def test_k_anonymize_boundary(spark):
    from storm_spark.functions.sampling import k_anonymize

    rows = [("a", "x", i) for i in range(5)] + [("b", "y", i) for i in range(4)]
    df = spark.createDataFrame(rows, "q1 string, q2 string, id int")
    out = k_anonymize(df, ["q1", "q2"], k=5).collect()
    assert {r.q1 for r in out} == {"a"}          # group of 4 suppressed
    assert all(r.k_group_size == 5 for r in out)
    with pytest.raises(ValueError):
        k_anonymize(df, ["q1"], k=0)


def test_k_anonymize_null_quasi_groups_together(spark):
    from storm_spark.functions.sampling import k_anonymize

    rows = [(None, i) for i in range(5)] + [("v", 9)]
    df = spark.createDataFrame(rows, "q string, id int")
    out = k_anonymize(df, ["q"], k=5).collect()
    assert len(out) == 5 and all(r.q is None for r in out)


def test_lm_score_basics(spark):
    from storm_spark.functions.text import lm_score

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lm_score(df, "doc_id", "text", alpha=0.5).collect()}
    # docs without a bigram emit nothing
    assert set(got) == {1, 2}
    assert got[1].n_bigrams == 4 and got[2].n_bigrams == 1
    # the repeated-pattern doc is more probable than chance: ppl < vocab+1
    assert got[1].ppl < 4.0
    import math

    for r in got.values():
        assert r.ppl == pytest.approx(math.exp(r.avg_nll), rel=1e-4)


def test_equi_depth_bins_balanced_and_tie_stable(spark):
    from storm_spark.functions.profile import equi_depth_bins

    # 100 distinct values -> 4 bins of exactly 25
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    got = {r.bin: (r.n, r.lo, r.hi) for r in equi_depth_bins(df, "v", 4).collect()}
    assert got == {0: (25, 0, 24), 1: (25, 25, 49), 2: (25, 50, 74), 3: (25, 75, 99)}
    # all rows of one value share a bin, even when NTILE would split them
    df2 = spark.createDataFrame([(1,)] * 9 + [(2,)], "v long")
    got2 = {r.bin: r.n for r in equi_depth_bins(df2, "v", 2).collect()}
    assert got2 == {0: 9, 1: 1}


def test_multi_reduce_null_numeric_keys_form_one_group(spark):
    """Arrow hands a nullable bigint key to the cogroup kernel as float64
    with NaN; NaN != NaN would split the NULL-key run into per-row groups.
    All NULL keys must reduce as ONE group (groupBy's null==null)."""
    from storm_spark.topology import Topology

    class CountBoth:
        out_types = ["bigint", "bigint"]

        def init(self, collector):
            return [0, 0]

        def execute(self, state, stream_index, tup, collector):
            state[stream_index] += 1

        def complete(self, state, collector):
            collector.emit([state[0], state[1]])

    topo = Topology(spark)
    a = spark.createDataFrame([(None, 1), (None, 2), (7, 3)], "k long, v long")
    b = spark.createDataFrame([(None, 9), (7, 8)], "k long, v long")
    s1 = topo.new_stream("nk_a", a).group_by(["k"])
    s2 = topo.new_stream("nk_b", b).group_by(["k"])
    out = topo.multi_reduce([s1, s2], CountBoth(), ["k", "n_a", "n_b"]).df
    got = {r.k: (r.n_a, r.n_b) for r in out.collect()}
    assert got == {None: (2, 1), 7: (1, 1)}
