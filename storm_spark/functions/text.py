"""Text analysis operators — tokenize, quality score, language ID, fingerprint.

All pure Column expressions (whole-stage codegen; zero Python on the hot
path), so they hold up at 100 TB: a scan + projection, no shuffle, fully
pushdown-friendly. Each has an exact ANSI-SQL twin used by the DuckDB oracle
(see ``storm_spark/queries.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tokens = maximal runs of word characters, lowercased (BPE-ish pre-split)
TOKEN_SPLIT_RE = "[^a-z0-9']+"

# small per-language stopword marker sets for the n-gram/stopword language
# heuristic (deterministic, SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(F.lower(F.trim(c)), TOKEN_SPLIT_RE)
    return F.filter(parts, lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("bigint")


def punct_ratio(col: Column | str, ndigits: int = 6) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    return F.round(n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)), ndigits)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None, ndigits: int = 6) -> Column:
    """Fraction of tokens that are stopwords (a quality signal)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)), ndigits)


def mean_token_len(col: Column | str, ndigits: int = 6) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.round(total.cast("double") / F.greatest(F.size(toks), F.lit(1)), ndigits)


def quality_score(col: Column | str, ndigits: int = 6) -> Column:
    """Composite [0,1] quality heuristic: long-enough docs with low punctuation
    noise and a natural stopword rate score high. Deterministic and
    SQL-expressible; the exact formula is a policy, not a contract."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(c, 10) * 5, F.lit(1.0))
    sw = stopword_ratio(c, None, 10)
    sw_score = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.4)), F.lit(1.0))
    return F.round((len_score + punct_pen + sw_score) / 3.0, ndigits)


def lang_id(col: Column | str) -> Column:
    """Marker-stopword language guesser: the language whose marker tokens
    appear most; ties and no-markers fall back to 'en'. (An n-gram model is
    the production path; markers keep the oracle SQL exactly equivalent.)"""
    toks = tokens(col)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t))))
        )
    # argmax with deterministic tie-break on the declared order
    best = F.lit("en")
    best_score = F.lit(-1)
    for lang, score in scores:
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (whitespace/case folded) — the exact-dedup key."""
    return F.md5(F.concat_ws(" ", tokens(col)))


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """N-gram shingles from an ALREADY-MATERIALIZED token array column.

    Always shingle in two steps (``select tokens(...) as t`` then this) —
    passing ``tokens(text)`` directly would be inlined into the transform
    lambda by projection collapse and re-tokenize per position (~10× slower).
    """
    count = F.size(toks) - (n - 1)
    shingles = F.transform(
        F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    # guard: sequence(1, 0) would count DOWN; short docs get no shingles
    return F.when(count >= 1, shingles).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Word n-gram shingles as an array<string> (for minhash/jaccard dedup).

    Prefer :func:`ngrams_from_tokens` over a pre-tokenized column in hot
    paths — see its note on projection collapse.
    """
    return ngrams_from_tokens(tokens(col), n)


def analyze(df: DataFrame, text_col: str = "text", ndigits: int = 6) -> DataFrame:
    """One-pass text profile: counts, ratios, language, fingerprint."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        char_count(text_col).alias("n_chars_m"),
        punct_ratio(text_col, ndigits).alias("punct_ratio"),
        stopword_ratio(text_col, None, ndigits).alias("stopword_ratio"),
        mean_token_len(text_col, ndigits).alias("mean_token_len"),
        quality_score(text_col, ndigits).alias("quality"),
        lang_id(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fingerprint"),
    )
