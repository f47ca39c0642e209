"""Property tests for the r6 operators — brute-force models on
randomized-but-deterministic inputs (the test_state_properties
convention: hypothesis, fixed derandomization)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=3, max_size=12),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7]),
)
def test_prefix_jaccard_equals_bruteforce(spark, docs, threshold):
    """The prefix filter must be LOSSLESS: pairs and Jaccard values equal
    the all-pairs brute force over 3-gram shingle sets at any threshold."""
    from storm_spark.functions import dedup

    shingles = [
        {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        for toks in docs
    ]
    expect = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles[i], shingles[j]
            if not a or not b:
                continue
            inter = len(a & b)
            if inter == 0:
                continue
            jac = round(inter / (len(a) + len(b) - inter), 6)
            if jac >= threshold:
                expect[(i, j)] = jac
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs_prefix(
            df, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    assert got == pytest.approx(expect)


@settings(**SETTINGS)
@given(
    ref=st.lists(st.tuples(st.integers(0, 2), st.integers(-20, 20)), min_size=1, max_size=40),
    cur=st.lists(st.tuples(st.integers(0, 2), st.integers(-20, 20)), min_size=1, max_size=40),
)
def test_ks_drift_matches_bruteforce(spark, ref, cur):
    from storm_spark.functions.profile import ks_drift

    def cdfs(rows, g):
        vals = sorted(v for gg, v in rows if gg == g)
        return vals

    expect = {}
    for g in {g for g, _ in ref} & {g for g, _ in cur}:
        rv, cv = cdfs(ref, g), cdfs(cur, g)
        if not rv or not cv:
            continue
        grid = sorted(set(rv) | set(cv))
        d = max(
            abs(
                sum(1 for x in rv if x <= v) / len(rv)
                - sum(1 for x in cv if x <= v) / len(cv)
            )
            for v in grid
        )
        expect[g] = (len(rv), len(cv), round(d, 6))
    rdf = spark.createDataFrame(ref, "g int, v long")
    cdf = spark.createDataFrame(cur, "g int, v long")
    got = {
        r.g: (r.n_ref, r.n_cur, r.ks)
        for r in ks_drift(rdf, cdf, "g", "v").collect()
    }
    assert set(got) == set(expect)
    for g in expect:
        assert got[g][:2] == expect[g][:2], (g, got[g], expect[g])
        assert got[g][2] == pytest.approx(expect[g][2], abs=1e-6), (g, got, expect)


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=0, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=0, max_size=25
    ),
)
def test_interval_join_batch_semantics(spark, left, right):
    """Batch-mode semantics of interval_join (the same Column expression
    the streaming twin runs): pairs = brute force over
    key equality and r.ts in [l.ts+lo, l.ts+hi]."""
    from datetime import datetime, timedelta

    from storm_spark.streaming.joins import interval_join

    t0 = datetime(2024, 1, 1)
    lo, hi = 10, 120
    expect = sorted(
        (lk, ls, rs)
        for lk, ls in left
        for rk, rs in right
        if lk == rk and ls + lo <= rs <= ls + hi
    )
    if not left or not right:
        return
    ldf = spark.createDataFrame(
        [(k, t0 + timedelta(seconds=s), s) for k, s in left],
        "user_id long, ts timestamp, sec long",
    )
    rdf = spark.createDataFrame(
        [(k, t0 + timedelta(seconds=s), s) for k, s in right],
        "user_id long, ts timestamp, sec long",
    )
    out = interval_join(ldf, rdf, "user_id", "ts", lo, hi)
    got = sorted((r.user_id, r.sec, r.sec_r) for r in out.collect())
    assert got == expect
