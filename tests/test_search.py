"""BM25 keyword retrieval (functions/search.py)."""

import pytest
from pyspark.sql import functions as F

from storm_spark.functions.search import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark join spark join spark"),          # heavy on both query terms
        (2, "spark filter scan filter scan"),        # one query term, short
        (3, "table scan " * 30),                     # long doc, no query terms
        (4, "join table window group sort"),         # one hit, average length
        (5, "the quick brown fox jumps"),            # no hits
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_ranking_and_membership(corpus):
    out = bm25_topk(corpus, ["spark", "join"], k=10).collect()
    ids = [r.doc_id for r in out]
    # docs with no query term never appear
    assert 3 not in ids and 5 not in ids
    # doc 1 matches both terms repeatedly -> top rank
    assert ids[0] == 1
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # scores are positive integers (nano-units) strictly ordered w/ id tiebreak
    scores = [(r.score_e9, -r.doc_id) for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(r.score_e9, int) and r.score_e9 > 0 for r in out)


def test_bm25_rarer_term_wins(spark):
    # 'rare' appears in 1 doc, 'common' in all -> rare hit outranks common hit
    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows += [(9, "rare filler words here")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bm25_topk(df, ["rare", "common"], k=3).collect()
    assert out[0].doc_id == 9


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])


def test_bm25_topk_is_take_ordered(corpus):
    """The final cut compiles to TakeOrderedAndProject — per-partition heaps,
    k rows to the driver, never a global sort of the corpus."""
    plan = (
        bm25_topk(corpus, ["spark"], k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_no_matches_is_empty(corpus):
    assert bm25_topk(corpus, ["zzzmissing"], k=5).count() == 0


def test_bm25_matches_naive_model(spark):
    """Seeded-random sweep vs an in-Python BM25 model (third engine after
    Spark and the DuckDB oracle; half-up rounding mirrors Spark's round)."""
    import math
    import random

    rng = random.Random(3)
    vocab = ["join", "spark", "table", "filter", "scan", "merge"]
    terms = ["join", "spark"]
    for case in range(5):
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))))
            for i in range(rng.randint(2, 10))
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")

        def model(k1=1.2, b=0.75):
            toks = {i: t.split() for i, t in rows}
            n = len(rows)
            avgdl = sum(len(v) for v in toks.values()) / n
            dfreq = {
                t: sum(1 for v in toks.values() if t in v) for t in terms
            }
            out = {}
            for i, v in toks.items():
                s = 0
                for t in terms:
                    tf = v.count(t)
                    if tf == 0 or dfreq[t] == 0:
                        continue
                    idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                    contrib = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                    s += math.floor(contrib * 1e9 + 0.5)  # half-up, positive
                if s > 0:
                    out[i] = s
            return out

        got = {r.doc_id: r.score_e9 for r in bm25_topk(df, terms, k=100).collect()}
        assert got == model(), (case, rows)
