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
