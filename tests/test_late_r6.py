"""Unit + property tests for the late-round-6 operators: graph_bfs
(frontier BFS vs a brute-force Python BFS), canonicalize_clusters
(survivorship rules), trailing_ewma (vs a per-key Python model)."""

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from conftest import sorted_rows

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _python_bfs(edges, seeds, max_hops, directed):
    adj = collections.defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        if not directed:
            adj[d].add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj[n]
        nxt -= dist.keys()
        if not nxt:
            break
        for n in nxt:
            dist[n] = h
        frontier = nxt
    return dist


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=30,
    ),
    n_seeds=st.integers(1, 3),
    max_hops=st.integers(1, 4),
    directed=st.booleans(),
)
def test_graph_bfs_equals_bruteforce(spark, edges, n_seeds, max_hops, directed):
    from storm_spark.functions import mining

    seeds = sorted({e[0] for e in edges})[:n_seeds]
    e_df = spark.createDataFrame(edges, "src int, dst int")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node int")
    got = {
        (r["node"], r["dist"])
        for r in mining.graph_bfs(
            e_df, s_df, max_hops=max_hops, directed=directed
        ).collect()
    }
    want = set(_python_bfs(edges, seeds, max_hops, directed).items())
    assert got == want


def test_graph_bfs_unreachable_and_hop_cap(spark):
    """A disconnected node never appears; max_hops truncates a chain."""
    from storm_spark.functions import mining

    chain = [(i, i + 1) for i in range(5)] + [(10, 11)]
    e_df = spark.createDataFrame(chain, "src int, dst int")
    s_df = spark.createDataFrame([(0,)], "node int")
    out = dict(
        (r["node"], r["dist"])
        for r in mining.graph_bfs(e_df, s_df, max_hops=2, directed=True).collect()
    )
    assert out == {0: 0, 1: 1, 2: 2}


def test_canonicalize_clusters_rules(spark):
    """Max-quality wins, ties break to the smallest id, singletons coalesce
    to their own cluster, sizes count every member."""
    from storm_spark.functions import dedup

    docs = spark.createDataFrame(
        [(1, 10), (2, 40), (3, 40), (7, 5)], "doc_id long, n_chars long"
    )
    # cluster {1,2,3} labeled by min id; doc 7 absent from the assignment
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, cluster_id long"
    )
    rows = {
        r["cluster_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup.canonicalize_clusters(docs, clusters).collect()
    }
    # ties 2 vs 3 at n_chars 40 -> min id 2; singleton 7 -> itself, size 1
    assert rows == {1: (2, 3), 7: (7, 1)}


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(0, 1000)), min_size=1, max_size=20
    ),
    alpha=st.sampled_from([0.5, 0.25]),
    lags=st.sampled_from([3, 8]),
)
def test_trailing_ewma_equals_python_model(spark, vals, alpha, lags):
    """Renormalized truncated EWMA: weights (1-a)^j over the slots whose
    lagged value exists (inside the key AND non-NULL)."""
    from storm_spark.functions import robust

    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, i int, v long")
    got = {
        r["i"]: r["ewma"]
        for r in robust.trailing_ewma(
            df, "k", ["i"], "v", alpha=alpha, lags=lags
        ).collect()
    }
    for i in range(len(vals)):
        num = den = 0.0
        for j in range(lags):
            if i - j < 0 or vals[i - j] is None:
                continue
            w = (1.0 - alpha) ** j
            num += vals[i - j] * w
            den += w
        want = num / den if den > 0 else None
        if want is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(want, abs=1e-9)


def test_trailing_ewma_single_exchange(spark):
    """All lag terms must ride ONE window operator: exactly one Exchange
    (plus none for the literal source) and no Python eval in the plan."""
    from storm_spark.functions import robust

    df = spark.createDataFrame([(1, 1, 10)], "k int, i int, v long")
    plan = (
        robust.trailing_ewma(df, "k", ["i"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert plan.count("Window") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_canonicalize_clusters_one_keyed_exchange(spark):
    """row_number and the size count share the cluster_id partition: the
    plan has exactly one exchange keyed on cluster_id after the join."""
    from storm_spark.functions import dedup

    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    clusters = spark.createDataFrame([(1, 1)], "id long, cluster_id long")
    plan = (
        dedup.canonicalize_clusters(docs, clusters)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(cluster_id" in plan
    # one partitioning for the two window ops (count may reuse row_number's)
    assert plan.count("hashpartitioning(cluster_id") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_static_enrich_matches_batch_join(spark, tmp_path):
    """Stream-static enrich over two micro-batches equals the batch join;
    stateless across batches (append mode, no watermark)."""
    import uuid

    from storm_spark.streaming.joins import static_enrich

    static = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "user_id int, tier string"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    qname = "enr_" + uuid.uuid4().hex[:8]
    stream = spark.readStream.schema("user_id int, v int").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(feed) + "/*")
    q = (
        static_enrich(stream, static, "user_id", how="inner")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        rows = [[(1, 10), (3, 30)], [(2, 20), (1, 11)]]
        for i, batch in enumerate(rows):
            spark.createDataFrame(batch, "user_id int, v int").coalesce(
                1
            ).write.mode("overwrite").parquet(str(feed / f"b{i}"))
            q.processAllAvailable()
    finally:
        q.stop()
    got = sorted_rows(spark.table(qname).select("user_id", "v", "tier"))
    # user 3 has no profile row (inner join drops it); both batches joined
    assert got == [(1, 10, "gold"), (1, 11, "gold"), (2, 20, "basic")]


def _python_k_core(edges, k, rounds):
    adj = collections.defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    alive = set(adj)
    for _ in range(rounds):
        surv = {n for n in alive if len(adj[n] & alive) >= k}
        if surv == alive:
            break
        alive = surv
    # engine/oracle derive nodes from the surviving EDGE list: a node that
    # survived the last round but lost its last edge does not appear
    return {
        n: len(adj[n] & alive) for n in alive if adj[n] & alive
    }


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)),
        min_size=1,
        max_size=35,
    ),
    k=st.integers(1, 3),
    rounds=st.integers(1, 4),
)
def test_k_core_equals_bruteforce(spark, edges, k, rounds):
    """Fixed-round peeling (with early exit) must equal the Python model:
    same survivors, same within-core degrees, self-loops ignored."""
    from storm_spark.functions import mining

    e_df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        (r["node"], r["degree"])
        for r in mining.k_core(e_df, k=k, max_rounds=rounds).collect()
    }
    want = set(_python_k_core(edges, k, rounds).items())
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),          # group
            st.integers(-5, 5),         # value
            st.integers(1, 9),          # weight
        ),
        min_size=1,
        max_size=25,
    ),
    p=st.sampled_from([(1, 2), (1, 4), (9, 10)]),
)
def test_weighted_percentile_equals_bruteforce(spark, rows, p):
    """Smallest v with cumulative (ties-inclusive) weight >= p*total —
    independent of input row order."""
    from storm_spark.functions import robust

    p_num, p_den = p
    df = spark.createDataFrame(rows, "g int, v long, w long")
    got = {
        r["g"]: r["wpct"]
        for r in robust.weighted_percentile(
            df, ["g"], "v", "w", p_num=p_num, p_den=p_den
        ).collect()
    }
    want = {}
    groups = {g for g, _, _ in rows}
    for g in groups:
        members = sorted((v, w) for gg, v, w in rows if gg == g)
        tot = sum(w for _, w in members)
        cum = 0
        by_val = {}
        for v, w in members:
            cum += w
            by_val[v] = cum  # ties-inclusive: last write wins per value
        want[g] = min(v for v, c in by_val.items() if p_den * c >= p_num * tot)
    assert got == want


def test_weighted_percentile_single_exchange(spark):
    """Running sum, total, and the final min-agg all ride ONE group-keyed
    exchange."""
    from storm_spark.functions import robust

    df = spark.createDataFrame([(1, 2, 3)], "g int, v long, w long")
    plan = (
        robust.weighted_percentile(df, ["g"], "v", "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 15)),  # (user, day offset)
        min_size=1,
        max_size=30,
    ),
)
def test_activity_streaks_equals_bruteforce(spark, rows):
    """Gaps-and-islands: longest consecutive-day run, active days, runs."""
    import datetime

    from storm_spark.functions import temporal

    base = datetime.datetime(2024, 1, 1)
    data = [
        (u, base + datetime.timedelta(days=d, hours=(u + d) % 24))
        for u, d in rows
    ]
    df = spark.createDataFrame(data, "user_id int, ts timestamp")
    got = {
        r["key"]: (r["longest_streak"], r["n_active_days"], r["n_streaks"])
        for r in temporal.activity_streaks(df, "user_id", "ts").collect()
    }
    want = {}
    for u in {u for u, _ in rows}:
        days = sorted({d for uu, d in rows if uu == u})
        runs = []
        cur = 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[u] = (max(runs), len(days), len(runs))
    assert got == want


def test_activity_streaks_plan_shape(spark):
    """Two exchanges only — the map-side-deduped (key, day) distinct and
    the key-only window re-key; the island count and final rollup must
    REUSE the window's key partitioning (no further exchange)."""
    import datetime

    from storm_spark.functions import temporal

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "user_id int, ts timestamp"
    )
    plan = (
        temporal.activity_streaks(df, "user_id", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan
    # both aggregations after the window ride the existing partitioning:
    # every Exchange sits BELOW the Window in the tree (appears after it
    # in the toString, which prints top-down)
    assert plan.index("Window") < plan.index("Exchange"), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
