"""Auto-scaling defaults for the fixed-capacity operator families — the
r4 16x sweep showed the super-linear queries were exactly the fixed-grid
ones (semantic_dedup's 16 cells, embedding_near_dup's 4x2^8 LSH grid,
quality_gate's exact per-group sort). These tests pin the sizing rules and
prove the auto paths stay oracle-exact / semantics-preserving."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_auto_n_clusters_sqrt_rule(spark):
    from storm_spark.functions.similarity import auto_n_clusters

    df = spark.range(10_000)
    assert auto_n_clusters(df) == 100
    assert auto_n_clusters(spark.range(5)) == 16  # floor wins on tiny corpora
    assert auto_n_clusters(spark.range(0)) == 16
    # engine-portability: the same value SQL derives via ceil(sqrt(COUNT(*)))
    import duckdb

    assert (
        duckdb.sql("SELECT GREATEST(16, CAST(ceil(sqrt(10000)) AS BIGINT))").fetchone()[0]
        == 100
    )


def test_auto_lsh_grid_occupancy_and_recall():
    from storm_spark.functions.similarity import auto_lsh_grid, lsh_recall

    # small corpus: the 8-plane floor holds
    p, t = auto_lsh_grid(1000, threshold=0.9)
    assert p == 8
    assert lsh_recall(0.9, p, t) >= 0.9
    # 16x the corpus -> 4 more planes (occupancy n/2^p stays <= target)
    p16, t16 = auto_lsh_grid(16 * 64 * 256, threshold=0.9)
    assert p16 == 12
    assert 16 * 64 * 256 / 2**p16 <= 64
    assert lsh_recall(0.9, p16, t16) >= 0.9
    # deeper signature needs more tables to hold recall
    assert t16 >= t
    # unreachable recall at depth caps at max_tables, with a warning —
    # the hot-shingle-cap convention for deterministic recall cuts
    with pytest.warns(UserWarning, match="capping"):
        p_cap, t_cap = auto_lsh_grid(10**9, threshold=0.5, max_tables=4)
    assert t_cap == 4


def test_lsh_half_pinned_recalibrates_tables():
    """Pinning n_planes deeper than the auto choice must re-derive
    n_tables against the PINNED depth — auto tables for 8 planes would
    silently miss the recall target at 16."""
    from storm_spark.functions.similarity import lsh_recall, tables_for_recall

    t8 = tables_for_recall(0.95, 8)
    t16 = tables_for_recall(0.95, 16)
    assert t16 > t8
    assert lsh_recall(0.95, 16, t16) >= 0.9
    assert lsh_recall(0.95, 16, t8) < 0.9  # the bug the fix removes


def test_embedding_near_dup_auto_grid_matches_rederived_oracle(spark):
    """The auto path must stay EXACT against a DuckDB oracle re-derived
    from the same auto-chosen (n_planes, n_tables) — the 'oracle follows
    the auto-chosen k' contract for data-adaptive defaults."""
    import duckdb

    from storm_spark.functions import similarity
    from storm_spark.queries import _oracle_embedding_near_dup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    planes, tables = similarity.auto_lsh_grid(n, threshold=0.45)
    got = {
        (r.id_a, r.id_b, round(r.cos_sim, 6))
        for r in similarity.embedding_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, dim=64
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    sql = _oracle_embedding_near_dup(
        threshold=0.45, n_planes=planes, n_tables=tables, dim=64
    )
    expect = {
        (a, b, round(c, 6)) for a, b, c in con.execute(sql).fetchall()
    }
    assert got == expect


def test_quality_gate_approx_semantics(spark):
    """approx=True keeps the gate semantics (every kept row >= its group's
    sketch threshold; kept fraction ~ 1-q) with NO per-group sort of the
    corpus — the threshold lands as a broadcast-joined |groups|-row table."""
    from storm_spark.functions.text import quality_gate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = quality_gate(docs, "text", "lang", q=0.25)
    approx = quality_gate(docs, "text", "lang", q=0.25, approx=True)
    n_docs = docs.count()
    n_exact = exact.count()
    n_approx = approx.count()
    # sketch cut within 2% of the exact nearest-rank cut on this fixture
    assert abs(n_approx - n_exact) <= max(2, int(0.02 * n_docs))
    # plan: big side broadcast-joins the tiny threshold table; the only
    # Sort allowed is inside the exchange-free scan, never a corpus-wide
    # per-group order-by
    plan = approx._sc._jvm.PythonSQLUtils.explainString(
        approx._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_quality_gate_approx_q0_keeps_all(spark):
    from storm_spark.functions.text import quality_gate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = quality_gate(docs, "text", "lang", q=0.0, approx=True)
    assert kept.count() == docs.count()


def test_choose_pq_params_shape_and_monotonicity():
    """The PQ/IVF recall-target sizing rule (RECALL_r9 empirical fit):
    sqrt-rule lists, quarter-fraction probes on clustered corpora,
    shortlist grows with k and target, clamps hold at extremes."""
    from storm_spark.functions.similarity import choose_pq_params

    p = choose_pq_params(2000, dim=64, k=10)
    # the exact pick measured at recall@10 = 1.000 on the clustered
    # fixture in RECALL_r9.txt — a constant drift here invalidates the
    # artifact, so pin it
    assert p == {"n_lists": 45, "n_probe": 12, "m": 4, "ksub": 16, "shortlist": 200}

    # monotone in corpus size (lists) and target (shortlist)
    assert choose_pq_params(10_000_000)["n_lists"] > p["n_lists"]
    assert (
        choose_pq_params(2000, target_recall=0.95)["shortlist"]
        >= p["shortlist"]
    )
    # clamps
    assert choose_pq_params(1)["n_lists"] == 8
    assert choose_pq_params(10**12)["n_lists"] == 4096
    assert choose_pq_params(2000, dim=16)["m"] == 2  # floor
    # shortlist never exceeds the probed volume (scanning more candidates
    # than the probe admits is impossible)
    big = choose_pq_params(100, k=10, target_recall=0.99)
    assert big["shortlist"] <= max(100, 100)


def test_choose_pq_params_uniform_mode_admits_the_scan():
    """clustered=False: recall ~ probed fraction on structureless data
    (measured), so the rule must size n_probe to ~target * n_lists."""
    from storm_spark.functions.similarity import choose_pq_params

    p = choose_pq_params(2000, target_recall=0.9, clustered=False)
    assert p["n_probe"] >= 0.9 * p["n_lists"]
