"""Unit tests for functions/mining.py (frequent_pairs, pagerank) and the
new robust.trailing_zscore / dedup.fuzzy_pairs operators — hand-computed
expectations on tiny inputs."""

import math

import pytest

from storm_spark.functions import mining, robust
from storm_spark.functions.dedup import fuzzy_pairs


def test_frequent_pairs_support_and_lift(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = {
        (r.item_a, r.item_b): (r.support, r.n_a, r.n_b, r.lift)
        for r in mining.frequent_pairs(df, ["basket"], "item", min_support=1).collect()
    }
    # support(a,b)=2, n_a=3, n_b=3, N=4 -> lift = 2*4/(3*3)
    assert out[("a", "b")] == (2, 3, 3, round(2 * 4 / 9, 6))
    # support(a,c)=1, lift = 1*4/(3*1)
    assert out[("a", "c")] == (1, 3, 1, round(4 / 3, 6))
    assert ("b", "c") not in out  # never co-occur


def test_frequent_pairs_min_support_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = mining.frequent_pairs(df, ["basket"], "item", min_support=2).collect()
    assert out == []


def test_frequent_pairs_duplicate_rows_collapse(spark):
    """Raw events repeat items within a basket; support counts BASKETS."""
    rows = [(1, "a")] * 5 + [(1, "b")] * 3 + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = mining.frequent_pairs(df, ["basket"], "item", min_support=1).collect()
    assert len(out) == 1 and out[0].support == 2


def test_pagerank_two_node_cycle(spark):
    """a<->b is symmetric: ranks stay at the uniform 0.5 every round."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r.node: r.rank for r in mining.pagerank(e, iterations=3).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_dangling_sink(spark):
    """a->b, b dangling. N=2, r0=0.5 each; after one round:
    a = 0.15/2 (no in-edges), b = 0.15/2 + 0.85*0.5."""
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r.node: r.rank for r in mining.pagerank(e, iterations=1).collect()}
    assert out["a"] == round((1 - 0.85) / 2, 8)
    assert out["b"] == round((1 - 0.85) / 2 + 0.85 * 0.5, 8)


def test_pagerank_weights_normalize_per_source(spark):
    """a splits 3:1 between b and c — contributions follow the weights."""
    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, w bigint"
    )
    out = {
        r.node: r.rank
        for r in mining.pagerank(e, weight_col="w", iterations=1).collect()
    }
    base = (1 - 0.85) / 3
    assert out["b"] == round(base + 0.85 * (1 / 3) * 0.75, 8)
    assert out["c"] == round(base + 0.85 * (1 / 3) * 0.25, 8)


def test_trailing_zscore_hand_computed(spark):
    """Window=3, min_periods=2: row 4's trailing window is rows 1-3."""
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 100])]
    df = spark.createDataFrame(rows, "k bigint, seq bigint, v double")
    out = {
        r.seq: r.z
        for r in robust.trailing_zscore(
            df, "k", ["seq"], "v", window=3, min_periods=2
        ).collect()
    }
    assert out[0] is None and out[1] is None  # warm-up (<2 trailing)
    # seq 2: trailing [10,20] -> mean 15, var 25, z=(30-15)/5
    assert out[2] == pytest.approx(3.0)
    # seq 3: trailing [10,20,30] -> mean 20, var = 1400/3 - 400 = 200/3
    expect = (100 - 20) / math.sqrt(1400 / 3 - 400)
    assert out[3] == pytest.approx(expect)


def test_trailing_zscore_zero_variance_is_null(spark):
    rows = [(1, i, 5.0) for i in range(5)] + [(1, 5, 50.0)]
    df = spark.createDataFrame(rows, "k bigint, seq bigint, v double")
    out = {
        r.seq: r.z
        for r in robust.trailing_zscore(
            df, "k", ["seq"], "v", window=4, min_periods=2
        ).collect()
    }
    assert out[5] is None  # trailing values all equal -> no score, not inf


def test_fuzzy_pairs_detects_typo_dups(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jmups over the lazy dog"),   # transposition
        (3, "a completely different document about storms"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = fuzzy_pairs(df, "doc_id", "text", max_dist=3)
    got = [(r.id_a, r.id_b, r.dist) for r in out.collect()]
    assert got == [(1, 2, 2)]  # jmups vs jumps = 2 edits; doc 3 unpaired


def test_fuzzy_pairs_prefix_block_bounds_recall(spark):
    """An edit INSIDE the blocking prefix escapes — the documented
    blocking tradeoff (docs land in different blocks)."""
    docs = [(1, "abcdefgh same tail text"), (2, "Xbcdefgh same tail text")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    assert fuzzy_pairs(df, "doc_id", "text", max_dist=3).count() == 0


def test_fuzzy_pairs_hot_block_cap(spark):
    """max_block_df drops blocks with more occupants than the cap."""
    docs = [(i, f"same prefix here variant {i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    uncapped = fuzzy_pairs(df, "doc_id", "text", max_dist=10).count()
    capped = fuzzy_pairs(df, "doc_id", "text", max_dist=10, max_block_df=5).count()
    assert uncapped > 0 and capped == 0


def test_fuzzy_pairs_two_pass_recovers_prefix_edits(spark):
    """two_pass=True adds a suffix-blocked pass: an edit INSIDE the prefix
    no longer escapes (single-pass misses it), and pairs found by both
    passes dedup to one row."""
    docs = [
        (1, "abcdefgh same tail text"),
        (2, "Xbcdefgh same tail text"),   # prefix edit -> suffix pass catches
        (3, "abcdefgh same tail texY"),   # suffix edit -> prefix pass catches
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    single = fuzzy_pairs(df, "doc_id", "text", max_dist=3)
    both = fuzzy_pairs(df, "doc_id", "text", max_dist=3, two_pass=True)
    got_single = {(r.id_a, r.id_b) for r in single.collect()}
    got_both = {(r.id_a, r.id_b, r.dist) for r in both.collect()}
    assert (1, 2) not in got_single
    # (2,3) has edits at BOTH ends — the documented residual miss even
    # with two passes (escaping now costs >=2 of the edit budget)
    assert got_both == {(1, 2, 1), (1, 3, 1)}
    # no duplicate pair rows after the union dedup ((1,3) is found by both
    # passes and must appear once)
    assert both.count() == 2


def test_frequent_pairs_fat_basket_cap(spark):
    """max_basket_items drops oversize baskets entirely — pairs, marginals,
    and the total all exclude them (lift stays internally consistent)."""
    rows = (
        [(1, "a"), (1, "b")]                       # small basket
        + [(2, f"i{j}") for j in range(6)]          # fat basket: 6 items
        + [(3, "a"), (3, "b")]
    )
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = mining.frequent_pairs(
        df, ["basket"], "item", min_support=1, max_basket_items=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    # basket 2 gone everywhere: support 2 of N=2 baskets, marginals 2
    assert (r.item_a, r.item_b, r.support, r.n_a, r.n_b) == ("a", "b", 2, 2, 2)
    assert r.lift == round(2 * 2 / (2 * 2), 6)


def test_triangle_count_basics(spark):
    """4-clique = 4 triangles, every node in 3; an appended path node joins
    none; duplicate/reversed/self edges are cleaned."""
    from storm_spark.functions import mining

    edges = [(a, b) for a in range(4) for b in range(4) if a != b]  # both orients
    edges += [(3, 4), (4, 4), (0, 1)]  # tail, self-loop, duplicate
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in mining.triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_hub_degree_ordering(spark):
    """A star (hub + leaves, no leaf-leaf edges) has zero triangles — and
    the degree ordering means the hub generates no wedges at all."""
    from storm_spark.functions import mining

    df = spark.createDataFrame([(0, i) for i in range(1, 30)], "src long, dst long")
    assert mining.triangle_count(df).count() == 0


def test_incremental_bfs_shortcut_reimproves(spark):
    """A late shortcut edge must re-relax nodes discovered epochs earlier
    (the cascade case a naive append-only frontier misses): path
    0-1-2-3-4-5 lands dists 1..5 (5 capped out at max_hops=4), then
    epoch 2's single edge (0,4) improves 4->1, which cascades 3->2, 5->2."""
    from storm_spark.functions.mining import IncrementalBFS

    seeds = spark.createDataFrame([(0,)], "node long")
    bfs = IncrementalBFS(seeds, "node", max_hops=4)
    path = [(i, i + 1) for i in range(5)]
    bfs.add_edges(spark.createDataFrame(path, "src long, dst long"))
    d1 = {r.node: r.dist for r in bfs.dist().collect()}
    assert d1 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}, d1  # 5 is beyond the cap
    rounds = bfs.add_edges(spark.createDataFrame([(0, 4)], "src long, dst long"))
    d2 = {r.node: r.dist for r in bfs.dist().collect()}
    assert d2 == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 2}, d2
    assert rounds >= 2, rounds  # the cascade really took multiple rounds


def test_incremental_bfs_untouched_epoch_is_cheap(spark):
    """An epoch whose edges touch nothing reachable changes nothing and
    takes zero relaxation rounds (the bounded-by-delta contract)."""
    from storm_spark.functions.mining import IncrementalBFS

    seeds = spark.createDataFrame([(0,)], "node long")
    bfs = IncrementalBFS(seeds, "node", max_hops=4)
    bfs.add_edges(spark.createDataFrame([(0, 1)], "src long, dst long"))
    rounds = bfs.add_edges(
        spark.createDataFrame([(100, 101), (101, 102)], "src long, dst long")
    )
    assert rounds == 0
    got = {r.node: r.dist for r in bfs.dist().collect()}
    assert got == {0: 0, 1: 1}


def test_incremental_bfs_matches_batch_on_random_splits(spark):
    """Any 3-way split of any edge set must converge to the from-scratch
    graph_bfs answer (deterministic pseudo-random graph + hash split)."""
    import hashlib

    from storm_spark.functions.mining import IncrementalBFS, graph_bfs

    def h(*xs):
        return int.from_bytes(
            hashlib.md5("|".join(map(str, xs)).encode()).digest()[:4], "big"
        )

    edges = [
        (u, v)
        for u in range(25)
        for v in range(u + 1, 25)
        if h("e", u, v) % 7 == 0
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (13,)], "node long")
    expect = {
        (r.node, r.dist)
        for r in graph_bfs(df, seeds, "src", "dst", "node", max_hops=4).collect()
    }
    bfs = IncrementalBFS(seeds, "node", max_hops=4)
    for chunk in range(3):
        part = [e for e in edges if h("c", *e) % 3 == chunk]
        if part:
            bfs.add_edges(spark.createDataFrame(part, "src long, dst long"))
    got = {(r.node, r.dist) for r in bfs.dist().collect()}
    assert got == expect


def test_incremental_components_late_edge_merges_clusters(spark):
    """The VERDICT r7 #7 pinned case: two clusters established in epoch 1
    ({1,2,3} and {5,6}), a later single pair (3,5) MERGES them — the
    smaller min-label (1) must cascade through the absorbed component's
    accumulated edges, relabeling 5 and 6."""
    from storm_spark.functions.mining import IncrementalComponents

    cc = IncrementalComponents()
    cc.add_edges(
        spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    )
    l1 = {r.id: r.cluster_id for r in cc.labels().collect()}
    assert l1 == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}, l1
    rounds = cc.add_edges(spark.createDataFrame([(3, 5)], "id_a long, id_b long"))
    l2 = {r.id: r.cluster_id for r in cc.labels().collect()}
    assert l2 == {1: 1, 2: 1, 3: 1, 5: 1, 6: 1}, l2
    assert rounds >= 1, rounds  # the merge really cascaded


def test_incremental_components_untouched_epoch_is_cheap(spark):
    """The bounded-by-delta contract: a re-sent pair changes nothing and
    takes ZERO cascade rounds; an epoch of brand-new nodes costs rounds
    bounded by the DELTA's own diameter (its internal chain must still
    cluster) while never touching existing labels."""
    from storm_spark.functions.mining import IncrementalComponents

    cc = IncrementalComponents()
    cc.add_edges(spark.createDataFrame([(1, 2)], "id_a long, id_b long"))
    assert (
        cc.add_edges(spark.createDataFrame([(1, 2)], "id_a long, id_b long"))
        == 0
    )
    rounds = cc.add_edges(
        spark.createDataFrame([(100, 101), (101, 102)], "id_a long, id_b long")
    )
    assert rounds <= 2  # delta-diameter-bounded, independent of graph size
    got = {r.id: r.cluster_id for r in cc.labels().collect()}
    assert got == {1: 1, 2: 1, 100: 100, 101: 100, 102: 100}


def test_incremental_components_matches_batch_on_random_splits(spark):
    """Any 3-way split of any pair set must equal the from-scratch
    near_dup_clusters answer AT EVERY EPOCH (deterministic pseudo-random
    graph + hash split)."""
    import hashlib

    from storm_spark.functions.dedup import near_dup_clusters
    from storm_spark.functions.mining import IncrementalComponents

    def h(*xs):
        return int.from_bytes(
            hashlib.md5("|".join(map(str, xs)).encode()).digest()[:4], "big"
        )

    pairs = [
        (u, v)
        for u in range(25)
        for v in range(u + 1, 25)
        if h("p", u, v) % 9 == 0
    ]
    cc = IncrementalComponents()
    seen = []
    for chunk in range(3):
        batch = [(u, v) for (u, v) in pairs if h("s", u, v) % 3 == chunk]
        seen.extend(batch)
        cc.add_edges(spark.createDataFrame(batch, "id_a long, id_b long"))
        expect = {
            (r.id, r.cluster_id)
            for r in near_dup_clusters(
                spark.createDataFrame(seen, "id_a long, id_b long")
            ).collect()
        }
        got = {(r.id, r.cluster_id) for r in cc.labels().collect()}
        assert got == expect, (chunk, got ^ expect)


def test_incremental_components_last_fold_names_absorbed_clusters(spark):
    """last_fold() (r9, drives IncrementalSurvivorship): after a merge
    epoch the fold map names exactly the ABSORBED old clusters and their
    new labels — whole-cluster-into-whole-cluster, no chains, no rows
    for untouched clusters; None when nothing changed."""
    from storm_spark.functions.mining import IncrementalComponents

    cc = IncrementalComponents()
    # epoch 1: three separate clusters {1,2}, {5,6,7}, {10,11}
    cc.add_edges(
        spark.createDataFrame(
            [(1, 2), (5, 6), (6, 7), (10, 11)], "id_a long, id_b long"
        )
    )
    # every node was new: fold maps each self-label to its component min
    fold1 = {
        (r.old_label, r.new_label) for r in cc.last_fold().collect()
    }
    assert fold1 == {(2, 1), (6, 5), (7, 5), (11, 10)}

    # epoch 2: one late edge merges {5,6,7} into {1,2}; {10,11} untouched
    cc.add_edges(spark.createDataFrame([(2, 5)], "id_a long, id_b long"))
    fold2 = {
        (r.old_label, r.new_label) for r in cc.last_fold().collect()
    }
    assert fold2 == {(5, 1)}, fold2  # ONE whole-cluster fold, nothing else

    # epoch 3: a redundant edge inside an existing cluster changes nothing
    cc.add_edges(spark.createDataFrame([(1, 5)], "id_a long, id_b long"))
    assert cc.last_fold() is None

    labels = {r.id: r.cluster_id for r in cc.labels().collect()}
    assert labels == {1: 1, 2: 1, 5: 1, 6: 1, 7: 1, 10: 10, 11: 10}
