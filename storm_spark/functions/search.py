"""Sparse keyword retrieval — BM25 top-k over an inverted index.

The lexical complement to the dense-embedding paths in
``functions/similarity.py``: rank documents for a bag-of-terms query with
BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework"),
built entirely from DataFrame aggregates — no Python on the hot path.

Determinism contract (shared with the rest of the repo): per-term
contributions are scaled to exact integer nano-units
(``round(score * 1e9) AS BIGINT``) BEFORE the per-document sum, so the
aggregate is an order-free integer sum — float addition order across
partitions/engines can never wiggle the ranking — and every step has an
exact DuckDB twin (same IEEE arithmetic per row, same rounding).

Scale shape: the query's term set is a tiny literal, applied with
``array_filter`` BEFORE the explode, so the inverted index materializes
only matching postings (|docs containing a query term| rows, not corpus
tokens). Document length and the corpus constants (N, avgdl) come from one
cheap aggregate that joins back as a broadcast single row. One shuffle
keyed by doc id for the posting sum; the top-k compiles to
TakeOrderedAndProject (per-partition heaps, k rows to the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from storm_spark.functions.text import tokens
from storm_spark.session import bounded_persist


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Returns ``(id_col, score_e9, rank)`` — ``score_e9`` is the BM25 score
    in exact integer nano-units (sum over query terms of
    ``round(idf(t) * tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)) * 1e9)``), with
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``. Ties rank by smaller
    doc id. Only documents matching at least one query term appear.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms_lit = F.array(*[F.lit(t) for t in sorted(set(query_terms))])
    base = docs.select(F.col(id_col).alias("__id__"), tokens(text_col).alias("__toks__"))
    # ONE tokenization pass: doc length (BM25 normalizes by FULL length) and
    # the query-term matches project together, and the slim result — two
    # ints + matched terms per doc, no full token array — persists so the
    # three consumers (corpus constants, postings, length join) don't each
    # rescan and retokenize the corpus (the repo's tokenize-once rule;
    # plan-measured 3 scans without it)
    slim = bounded_persist(
        base.select(
            "__id__",
            F.size("__toks__").cast("bigint").alias("__dl__"),
            F.filter(F.col("__toks__"), lambda t: F.array_contains(terms_lit, t)).alias("__m__"),
        ),
        "search.bm25.slim",
    )
    corpus = slim.agg(
        F.count(F.lit(1)).alias("__n__"), F.avg("__dl__").alias("__avgdl__")
    )
    tf = (
        slim.select("__id__", F.explode("__m__").alias("__term__"))
        .groupBy("__id__", "__term__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tf__"))
    )
    return bm25_rank_from_index(
        tf, slim.select("__id__", "__dl__"), corpus, id_col, k, k1, b
    )


def bm25_rank_from_index(
    tf: DataFrame,
    doclens: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """:func:`bm25_topk`'s scoring tail over ALREADY-BUILT index state —
    ``tf`` = (__id__, __term__, __tf__ bigint) postings for query-matched
    terms, ``doclens`` = (__id__, __dl__) for matched docs, ``corpus`` =
    one row (__n__, __avgdl__) over ALL docs. Public because the index is
    a LINEAR structure: per-epoch postings fold by (doc, term) SUM,
    doc-length rows append (each doc arrives once), and (n, Σdl) are two
    counters — so a streaming index maintained across micro-batches feeds
    this same tail and must rank identically to the batch build
    (``streaming_bm25``'s oracle equality). df(t) derives from the folded
    postings (distinct docs per term), never folded separately — one less
    thing to desync."""
    df_ = tf.groupBy("__term__").agg(
        F.count(F.lit(1)).cast("double").alias("__df__")
    )
    scored = (
        tf.withColumn("__tfd__", F.col("__tf__").cast("double"))
        .join(df_, on="__term__")
        .join(doclens, on="__id__")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0) + (F.col("__n__") - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
    )
    tf_norm = (F.col("__tfd__") * (k1 + 1)) / (
        F.col("__tfd__")
        + k1 * (1 - b + b * F.col("__dl__") / F.col("__avgdl__"))
    )
    contrib_e9 = F.round(idf * tf_norm * 1e9).cast("bigint")
    agg = (
        scored.select("__id__", contrib_e9.alias("__c__"))
        .groupBy("__id__")
        .agg(F.sum("__c__").alias("score_e9"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition heaps);
    # the rank window then runs on k rows, not the corpus
    topk = agg.orderBy(F.col("score_e9").desc(), F.col("__id__").asc()).limit(k)
    w = Window.orderBy(F.col("score_e9").desc(), F.col("__id__").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("__id__").alias(id_col), "score_e9", "rank"
    )
