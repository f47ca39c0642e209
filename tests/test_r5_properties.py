"""Property tests for the r5 operators — each checked against an
independent brute-force model on randomized-but-deterministic inputs
(hypothesis with fixed derandomization, the repo's test_state_properties
convention)."""

import math
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=40
    )
)
def test_triangle_count_matches_bruteforce(spark, edges):
    from storm_spark.functions import mining

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in und for n in e})
    expect: dict[int, int] = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            for c in nodes:
                if c <= b:
                    continue
                if (a, b) in und and (a, c) in und and (b, c) in und:
                    for n in (a, b, c):
                        expect[n] = expect.get(n, 0) + 1
    if not edges:
        edges = [(0, 0)]  # createDataFrame needs >= 1 row; self-loop drops out
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in mining.triangle_count(df).collect()}
    assert got == expect


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    n_bins=st.integers(1, 8),
)
def test_equi_depth_bins_matches_bruteforce(spark, vals, n_bins):
    from storm_spark.functions.profile import equi_depth_bins

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.bin: (r.n, r.lo, r.hi) for r in equi_depth_bins(df, "v", n_bins).collect()}
    # model: bin(v) = min(n_bins-1, rows_below(v)*n_bins // N), value-based
    N = len(vals)
    s = sorted(vals)
    model: dict[int, list[int]] = {}
    for v in set(vals):
        below = sum(1 for x in vals if x < v)
        b = min(n_bins - 1, below * n_bins // N)
        model.setdefault(b, []).extend(x for x in vals if x == v)
    expect = {
        b: (len(xs), min(xs), max(xs)) for b, xs in model.items()
    }
    assert got == expect
    # bins partition the input
    assert sum(n for n, _, _ in got.values()) == N
    # bin ids ordered by value range
    order = sorted(got)
    for b1, b2 in zip(order, order[1:]):
        assert got[b1][2] < got[b2][1]


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_group_corr_matches_exact_rational_model(spark, rows):
    from storm_spark.functions.profile import group_corr

    df = spark.createDataFrame(rows, "g int, x long, y long")
    got = {r.g: (r.n, r.r) for r in group_corr(df, "g", "x", "y").collect()}
    from collections import defaultdict

    groups = defaultdict(list)
    for g, x, y in rows:
        groups[g].append((x, y))
    for g, pts in groups.items():
        n = len(pts)
        assert got[g][0] == n
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if n < 2 or vx == 0 or vy == 0:
            assert got[g][1] is None
        else:
            r = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert got[g][1] == pytest.approx(r, abs=2e-6)


@settings(**SETTINGS)
@given(
    cats=st.lists(st.sampled_from("abcde"), min_size=1, max_size=50)
)
def test_group_entropy_matches_math(spark, cats):
    from storm_spark.functions.profile import group_entropy

    df = spark.createDataFrame([("g", c) for c in cats], "g string, c string")
    row = group_entropy(df, "g", "c").collect()[0]
    n = len(cats)
    from collections import Counter

    counts = Counter(cats)
    expect = -sum((c / n) * math.log(c / n) for c in counts.values())
    assert row.n == n and row.n_cats == len(counts)
    assert row.entropy == pytest.approx(expect, abs=2e-6)
    # entropy bounds: 0 <= H <= ln(n_cats)
    assert -1e-9 <= row.entropy <= math.log(len(counts)) + 1e-9


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=12
    )
)
def test_lm_score_probabilities_are_proper(spark, texts):
    """Every per-doc avg NLL must be positive (probabilities < 1 under
    smoothing) and ppl = exp(nll); docs without bigrams emit nothing."""
    from storm_spark.functions.text import lm_score

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = lm_score(df, "doc_id", "text", alpha=0.5).collect()
    n_with_bigram = sum(1 for t in texts if len([w for w in t.split() if w]) >= 2)
    assert len(out) == n_with_bigram
    for r in out:
        assert r.avg_nll > 0
        assert r.ppl == pytest.approx(math.exp(r.avg_nll), rel=1e-4)
