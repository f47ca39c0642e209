"""Text analysis operators — tokenize, quality score, language ID, fingerprint.

All pure Column expressions (whole-stage codegen; zero Python on the hot
path), so they hold up at 100 TB: a scan + projection, no shuffle, fully
pushdown-friendly. Each has an exact ANSI-SQL twin used by the DuckDB oracle
(see ``storm_spark/queries.py``).

Hot-path rule: tokenization (regex split) is the expensive step, so every
operator has a ``*_t`` form that takes an ALREADY-MATERIALIZED token-array
column. Materialize once (``select tokens(text) as toks``) and feed the
``*_t`` forms — Catalyst's CollapseProject keeps a multiply-referenced
non-trivial alias as its own projection, so the split runs once per row
instead of once per derived column. The text-column forms are sugar for
single-expression uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from storm_spark.session import bounded_persist

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


# --- token-array (``_t``) forms: the hot path --------------------------------


def token_count_t(toks: Column) -> Column:
    return F.size(toks).cast("bigint")


def stopword_ratio_t(toks: Column, stopwords: list[str] | None = None, ndigits: int = 6) -> Column:
    """Fraction of tokens that are stopwords (a quality signal)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)), ndigits)


def mean_token_len_t(toks: Column, ndigits: int = 6) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.round(total.cast("double") / F.greatest(F.size(toks), F.lit(1)), ndigits)


def lang_id_t(toks: Column) -> Column:
    """Marker-stopword language guesser: the language whose marker tokens
    appear most; ties and no-markers fall back to 'en'. (An n-gram model is
    the production path; markers keep the oracle SQL exactly equivalent.)"""
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))))
    # argmax with deterministic tie-break on the declared order
    best = F.lit("en")
    best_score = F.lit(-1)
    for lang, score in scores:
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def fingerprint_t(toks: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (whitespace/case folded) — the exact-dedup key."""
    return F.md5(F.concat_ws(" ", toks))


# --- text-column sugar -------------------------------------------------------


def token_count(col: Column | str) -> Column:
    return token_count_t(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("bigint")


def punct_ratio(col: Column | str, ndigits: int = 6) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    return F.round(n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)), ndigits)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None, ndigits: int = 6) -> Column:
    return stopword_ratio_t(tokens(col), stopwords, ndigits)


def mean_token_len(col: Column | str, ndigits: int = 6) -> Column:
    return mean_token_len_t(tokens(col), ndigits)


def quality_score_t(col: Column | str, toks: Column, ndigits: int = 6) -> Column:
    """Composite [0,1] quality heuristic: long-enough docs with low punctuation
    noise and a natural stopword rate score high. Deterministic and
    SQL-expressible; the exact formula is a policy, not a contract."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(c, 10) * 5, F.lit(1.0))
    sw = stopword_ratio_t(toks, None, 10)
    sw_score = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.4)), F.lit(1.0))
    return F.round((len_score + punct_pen + sw_score) / 3.0, ndigits)


def quality_score(col: Column | str, ndigits: int = 6) -> Column:
    return quality_score_t(col, tokens(col), ndigits)


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    q: float = 0.25,
    id_col: str = "doc_id",
    ndigits: int = 6,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group relative quality gate: keep documents scoring at or above
    their group's q-th quantile of :func:`quality_score`.

    Absolute thresholds (the ``corpus_clean`` style) misfire across
    languages — tokenizer and stopword behavior shift the score distribution
    per language — so production curation cuts RELATIVE to each group. The
    quantile is nearest-rank (type 1: the value at ``row_number ==
    ceil(q*n)`` under (score, id) order), so the threshold IS one of the
    observed rounded scores and the keep/drop boundary is integer-exact and
    engine-portable; interpolated quantiles put the cut between ulps.

    Returns ``(id_col, group_col, quality)`` for kept rows.

    Scale shape (exact path): one shuffle on the group key; the rank, the
    group count, and the threshold broadcast are three window passes over
    that SAME exchange (no join back). Exact order statistics cost a
    per-group sort of every row — the r4 16x sweep measured that as 9.5x
    query growth, the worst of the window family.

    ``approx=True`` is the 100-TB path: the per-group threshold comes from
    a ``percentile_approx`` sketch (one partial-agg shuffle of
    group-cardinality rows, NO per-group sort of the corpus), lands as a
    |groups|-row table, and broadcast-joins back — the corpus itself never
    shuffles at all. The sketch threshold is a real observed score (KLL
    rank query) within ``1/accuracy`` rank error of the exact nearest-rank
    cut; gate semantics (keep score >= group threshold) are unchanged.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        quality_score(text_col, ndigits).alias("quality"),
    )
    if approx:
        # the scored projection feeds BOTH the sketch agg and the join
        # side — cache the 3 slim columns or the text scoring (the regex
        # tokenization, the expensive step) runs twice over the corpus
        # (measured at 16x sf0.1: 36 s uncached vs 12 s cached)
        scored = bounded_persist(scored, "text.quality_gate.scored")
        qq = max(float(q), 1e-9)  # q=0 -> min score, keeping the whole group
        thr = scored.groupBy(group_col).agg(
            F.percentile_approx("quality", qq, accuracy).alias("__thr__")
        )
        return (
            scored.join(F.broadcast(thr), group_col)
            .filter(F.col("quality") >= F.col("__thr__"))
            .select(id_col, group_col, "quality")
        )
    wo = Window.partitionBy(group_col).orderBy(F.col("quality").asc(), F.col(id_col).asc())
    wg = Window.partitionBy(group_col)
    ranked = scored.withColumn("__rn__", F.row_number().over(wo)).withColumn(
        "__n__", F.count(F.lit(1)).over(wg)
    )
    # q=0 would make cut=0 (no rank matches -> NULL threshold -> EVERYTHING
    # silently dropped); clamp to rank 1, which keeps the whole group — the
    # only sane reading of "the 0th percentile and above"
    cut = F.greatest(F.ceil(F.lit(float(q)) * F.col("__n__")).cast("bigint"), F.lit(1))
    thr = F.max(F.when(F.col("__rn__") == cut, F.col("quality"))).over(wg)
    return (
        ranked.withColumn("__thr__", thr)
        .filter(F.col("quality") >= F.col("__thr__"))
        .select(id_col, group_col, "quality")
    )


def lang_id(col: Column | str) -> Column:
    return lang_id_t(tokens(col))


def fingerprint(col: Column | str) -> Column:
    return fingerprint_t(tokens(col))


def kgram_hashes(col: Column | str, k: int = 8) -> Column:
    """Rolling char-``k``-gram hash array of the normalized text (md5 prefix
    — engine-portable). MATERIALIZE this in its own projection before feeding
    :func:`winnow_from_hashes`: inlined, the per-window slice would recompute
    every hash per window (O(n²) md5s)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(c))
    n_grams = F.length(norm) - (k - 1)
    h = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(norm.substr(i, F.lit(k))), 1, 15), 16, 10
    ).cast("bigint")
    # guard BEFORE building the sequence: sequence(1, n) DESCENDS for n < 1
    return F.when(n_grams >= 1, F.transform(F.sequence(F.lit(1), n_grams), h)).otherwise(
        F.array().cast("array<bigint>")
    )


def winnow_from_hashes(hashes: Column, w: int = 4) -> Column:
    """Winnowing selection (Schleimer et al., SIGMOD 2003) over a
    pre-materialized k-gram hash array: slide a window of ``w`` hashes, keep
    each window's minimum, dedup. Shared fingerprints ⇒ shared substrings of
    length ≥ k — the plagiarism/near-dup detection primitive. Guaranteed
    density ~1/w; pure expressions, no Python, no shuffle."""
    n_windows = F.size(hashes) - (w - 1)
    mins = F.transform(
        F.sequence(F.lit(1), n_windows), lambda j: F.array_min(F.slice(hashes, j, w))
    )
    selected = F.array_distinct(mins)
    # short docs: fewer than w k-grams -> fall back to the global min hash
    short = F.when(F.size(hashes) >= 1, F.array(F.array_min(hashes))).otherwise(
        F.array().cast("array<bigint>")
    )
    return F.when(n_windows >= 1, selected).otherwise(short)


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
    """One-pass text profile: counts, ratios, language, fingerprint.

    Tokenizes once (materialized ``__toks__`` projection), derives every
    token-based metric from the array. The char count is named
    ``n_chars_text`` (not ``n_chars``) because source tables commonly carry
    their own ``n_chars`` metadata column and ``analyze`` keeps all input
    columns; any other collision between an input column and a profile
    column fails fast instead of silently duplicating names.
    """
    profile_cols = [
        "n_tokens", "n_chars_text", "punct_ratio", "stopword_ratio",
        "mean_token_len", "quality", "lang_guess", "fingerprint",
    ]
    clash = [c for c in profile_cols if c in df.columns]
    if clash:
        raise ValueError(f"input columns collide with profile columns: {clash}")
    base = df.select("*", tokens(text_col).alias("__toks__"))
    t = F.col("__toks__")
    return base.select(
        *df.columns,
        token_count_t(t).alias("n_tokens"),
        char_count(text_col).alias("n_chars_text"),
        punct_ratio(text_col, ndigits).alias("punct_ratio"),
        stopword_ratio_t(t, None, ndigits).alias("stopword_ratio"),
        mean_token_len_t(t, ndigits).alias("mean_token_len"),
        quality_score_t(text_col, t, ndigits).alias("quality"),
        lang_id_t(t).alias("lang_guess"),
        fingerprint_t(t).alias("fingerprint"),
    )


def repetition_ratio_t(toks: Column, n: int = 3, ndigits: int = 6) -> Column:
    """Within-document n-gram repetition: ``1 - distinct_ngrams / ngrams``
    (0 = no repeated n-gram, →1 = the same phrase looping). The Gopher-rule
    style quality signal that catches boilerplate/generated loops which
    length and punctuation ratios miss. Expression-only over a materialized
    token array; 0.0 for docs shorter than ``n`` tokens."""
    grams = ngrams_from_tokens(toks, n)
    n_grams = F.size(grams)
    return F.when(n_grams <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams)) / n_grams, ndigits)
    )


# --- PII redaction -----------------------------------------------------------
# Patterns chosen to behave identically under Java regex (Spark) and RE2
# (DuckDB oracle): character classes, bounded repeats, \b word boundaries.

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_redact(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Replace every PII match with ``[<KIND>]`` — the standard pre-training
    scrub pass. Pure ``regexp_replace`` expressions: map-side only, codegen'd,
    zero shuffle at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in (patterns or PII_PATTERNS).items():
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c


def pii_count(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Number of PII matches in the text (all kinds summed)."""
    c = F.col(col) if isinstance(col, str) else col
    out = None
    for pat in (patterns or PII_PATTERNS).values():
        n = F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        out = n if out is None else out + n
    return out.cast("bigint")


# --- URL / domain extraction -------------------------------------------------

URL_RE = r"https?://[A-Za-z0-9.-]+(/[^\s]*)?"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(col: Column | str) -> Column:
    """All URLs in the text as ``array<string>`` (match group 0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(URL_RE), 0)


def url_domain(col: Column | str) -> Column:
    """Domain (host) part of a URL string ('' when not a URL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, DOMAIN_RE, 1)


def domain_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-domain link counts over a corpus — the crawl-frontier /
    source-mix report. Extraction is map-side expressions; the only shuffle
    is the final domain groupBy (map-side combined, low cardinality)."""
    urls = df.select(F.explode(extract_urls(text_col)).alias("url"))
    return (
        urls.select(url_domain("url").alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# --- TF-IDF ------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, ndigits: int = 6
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF
    (``tf · ln(n_docs / df)``) — the classic corpus-summary / keyword
    operator.

    Scale shape: explode → ``groupBy(doc, term)`` (map-side combinable, ONE
    shuffle of (doc, term, partial-count)); document frequency is a groupBy
    of the already-aggregated tf table (vocabulary-sized); the tf⋈df join is
    key-partitioned on term; n_docs rides in as a broadcast 1-row aggregate
    (stays lazy — no driver action at plan-build). Ranking is rounded-value
    ordered with a term tie-break, so the top-k cut is deterministic and
    engine-portable (raw double ordering could differ by ulps across
    engines)."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    # tf feeds two branches (the join side and document frequency) — persist
    # so the corpus is tokenized ONCE, not re-scanned per branch (at scale
    # the second full text pass dwarfs the (doc, term, count) cache;
    # MEMORY_AND_DISK spills rather than recomputes)
    tf = bounded_persist(
        toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")),
        "text.tfidf.tf",
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    return tfidf_from_counts(tf, n_docs, id_col, k, ndigits)


def tfidf_from_counts(
    tf: DataFrame,
    n_docs: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """The TF-IDF scoring tail over ALREADY-FOLDED state — shared
    verbatim by :func:`tfidf_top_terms` (batch) and the
    ``streaming_tfidf`` gate (the ``bm25_rank_from_index`` /
    ``dsir_scores_from_counts`` pattern): ``tf`` = (id, term, tf)
    per-document term counts — each document arrives exactly once, so
    streaming epochs APPEND rows and never merge them; ``n_docs`` = a
    1-row corpus counter. Document frequency derives from the tf table
    itself (vocabulary-sized groupBy), so there is no second stateful
    structure to keep consistent."""
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), ndigits
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "tfidf")
    )


def unigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", ndigits: int = 6
) -> DataFrame:
    """Mean per-token unigram surprisal ``-ln(corpus_freq(tok))`` per
    document — the cheap LM-quality proxy (high = rare-token-dense or noisy
    text, low = common-word boilerplate). Deterministic and SQL-twinnable,
    unlike a real LM score.

    Scale shape: explode → term-count groupBy (map-side combined, persisted
    so the corpus tokenizes once); total-token count joins as a broadcast
    1-row aggregate; the per-doc mean is one doc-keyed shuffle. The term
    frequency table is vocabulary-sized and shuffle-joined, never collected.
    """
    # toks feeds the frequency agg AND the per-token join — persist so the
    # regex tokenization (the expensive step) runs once; freq is
    # vocabulary-sized and also double-consumed (total + join), so it
    # persists too (trivial footprint)
    toks = bounded_persist(
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term")),
        "text.surprisal.toks",
    )
    freq = bounded_persist(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")),
        "text.surprisal.freq",
    )
    total = freq.select(F.sum("cnt").alias("total"))
    return (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("cnt").cast("double") / F.col("total"))), ndigits
            ).alias("surprisal"),
        )
    )


def top_token_ratio_t(toks: Column, ndigits: int = 6) -> Column:
    """Fraction of the document occupied by its single most frequent token —
    high values flag keyword-stuffed or looping text. Expression-only:
    aggregate over the distinct tokens of the count of each.

    Cost is O(distinct × length) per document — fine for web-document
    lengths (the common case this signal exists for); for book-length texts
    compute it via explode → groupBy(doc, token) → max/sum instead (one
    shuffle, linear)."""
    counts = F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    )
    mx = F.array_max(counts)
    return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(
        F.round(mx / F.size(toks), ndigits)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    ``ln( (c_ab / n_bigrams) / ((c_a / n_tokens) · (c_b / n_tokens)) )`` —
    the classic corpus-association miner (phrase detection, tokenizer-merge
    candidates). ``min_count`` filters the unstable low-frequency tail
    (PMI's textbook failure mode: hapax pairs score highest).

    Returns (w1, w2, pair_count, pmi), PMI-descending, bigram tie-break.

    Scale shape: two explode→groupBy counts (map-side combinable — bigram
    and unigram tables are vocabulary-sized after partial agg), two
    vocabulary-keyed joins to attach unigram counts, totals ride in as
    broadcast 1-row aggregates (lazy, no driver action), final top-k is
    TakeOrdered (k·partitions rows to one merge). Ranking uses the ROUNDED
    value + lexicographic tie-break — deterministic and engine-portable.
    """
    base = df.select(tokens(text_col).alias("__toks__"))
    # tokenize once; feeds the bigram and unigram branches
    base = bounded_persist(base, "text.pmi.base")
    uni = (
        base.select(F.explode("__toks__").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        base.select(F.explode(ngrams_from_tokens(F.col("__toks__"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "pair_count",
        )
    )
    n_tokens = base.select(F.sum(F.size("__toks__")).cast("double").alias("n_tok"))
    n_bigrams = base.select(
        F.sum(F.greatest(F.size("__toks__") - 1, F.lit(0))).cast("double").alias("n_big")
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tokens))
        .crossJoin(F.broadcast(n_bigrams))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n_big"))
                    / ((F.col("c1") / F.col("n_tok")) * (F.col("c2") / F.col("n_tok")))
                ),
                ndigits,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """Bigram-LM perplexity scoring — train a Laplace-smoothed bigram
    language model on the corpus itself and score every document's average
    negative log-likelihood under it: the classic statistical quality
    filter (a document whose token transitions are unlike the corpus —
    boilerplate, gibberish, wrong language — scores high). Returns
    ``(id_col, n_bigrams, avg_nll, ppl)`` for documents with at least one
    bigram; ``ppl = exp(avg_nll)``.

    ``p(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V)`` with V = unigram
    vocabulary size; α must be an exact binary fraction (0.5, 0.25) so the
    smoothed probability is the same double on every engine.

    Determinism: counts are exact BIGINTs, p and ln(p) evaluate on
    identical doubles, and the per-document summation folds the log-probs
    in TOKEN-POSITION order on both engines (sorted (pos, lp) structs +
    ``F.aggregate`` vs ``list(... ORDER BY pos)`` + ``list_reduce``) — the
    group_entropy convention, because a plain SUM's fold order is
    engine-dependent in the last ulp.

    Scale shape: the corpus tokenizes ONCE into a cached slim (id, toks)
    projection feeding all three consumers (bigram counts, unigram counts,
    per-doc scoring). Count tables are vocabulary-bounded after map-side-
    combined partial aggs; the scoring join shuffles (doc, pos, w1, w2)
    rows on the bigram key — corpus-token-bounded, the same O(tokens)
    bound tfidf carries; V attaches as a broadcast 1-row aggregate. The
    per-doc collect_list is document-length-bounded (the chunking bound).
    """
    toks = bounded_persist(
        df.select(F.col(id_col), tokens(text_col).alias("__toks__")),
        "text.lm_score.toks",
    )
    big = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                "transform(slice(__toks__, 2, greatest(size(__toks__) - 1, 0)),"
                " (w, i) -> struct(element_at(__toks__, i + 1) AS w1, w AS w2))"
            )
        ).alias("__pos__", "__bg__"),
    ).select(
        id_col, "__pos__", F.col("__bg__.w1").alias("__w1__"), F.col("__bg__.w2").alias("__w2__")
    )
    uni = toks.select(F.explode("__toks__").alias("__w1__"))
    uni_counts = uni.groupBy("__w1__").agg(F.count(F.lit(1)).cast("bigint").alias("__cu__"))
    v = uni_counts.agg(F.count(F.lit(1)).cast("bigint").alias("__V__"))
    bg_counts = big.groupBy("__w1__", "__w2__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cb__")
    )
    a = float(alpha)
    scored = (
        big.join(bg_counts, ["__w1__", "__w2__"])
        .join(uni_counts, "__w1__")
        .crossJoin(F.broadcast(v))
        .select(
            F.col(id_col),
            "__pos__",
            F.log(
                (F.col("__cb__").cast("double") + F.lit(a))
                / (F.col("__cu__").cast("double") + F.lit(a) * F.col("__V__").cast("double"))
            ).alias("__lp__"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sort_array(
            F.collect_list(F.struct(F.col("__pos__").alias("p"), F.col("__lp__").alias("l")))
        ).alias("__lps__"),
    )
    nll = -F.aggregate("__lps__", F.lit(0.0), lambda acc, s: acc + s["l"]) / F.col(
        "n_bigrams"
    ).cast("double")
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.round(nll, ndigits).alias("avg_nll"),
        F.round(F.exp(nll), ndigits).alias("ppl"),
    )


def sql_lm_score(table: str, id_expr: str, text_expr: str, alpha: float = 0.5, ndigits: int = 6) -> str:
    """DuckDB twin of :func:`lm_score` — position-ordered list fold, full
    SELECT ``(id, n_bigrams, avg_nll, ppl)``."""
    # the SQL twin of tokens() — same regex as TOKEN_SPLIT_RE
    toks = (
        f"list_filter(string_split_regex(lower(trim({text_expr})),"
        " '[^a-z0-9'']+'), x -> x <> '')"
    )
    a = float(alpha)
    return f"""
WITH t AS (SELECT {id_expr} AS id, {toks} AS toks FROM {table}),
big AS (
  SELECT id, i AS pos, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
uni AS (
  SELECT w1, COUNT(*) AS cu FROM (
    SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS V FROM uni),
bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
lp AS (
  SELECT big.id, big.pos,
         ln((cb + {a}) / (cu + {a} * V)) AS l
  FROM big JOIN bgc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v)
SELECT id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       round(nll, {ndigits}) AS avg_nll,
       round(exp(nll), {ndigits}) AS ppl
FROM (
  SELECT id, n_bigrams,
         -list_reduce(list_prepend(0.0, lps), (a, b) -> a + b) / n_bigrams AS nll
  FROM (
    SELECT id, COUNT(*) AS n_bigrams, list(l ORDER BY pos) AS lps
    FROM lp GROUP BY id))
"""


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Learn the first ``k`` byte-pair-encoding merge rules from the
    corpus — TOKENIZER TRAINING, the step every LLM data pipeline runs
    before anything else tokenizes. Classic word-level BPE (Sennrich et
    al. 2016): start from characters, repeatedly merge the most frequent
    adjacent symbol pair (ties → lexicographically smallest pair, so the
    answer is unique on any engine). Returns the merge table
    ``(rank, lhs, rhs, cnt)`` — rank 1 = first merge learned, cnt = the
    pair's corpus frequency at the time it was chosen.

    Representation is the whole trick: a word's segmentation is a string
    of PAREN-WRAPPED symbols — ``hello`` → ``(h)(e)(l)(l)(o)`` — so
    applying a merge is ONE plain ``replace(seg, '(l)(r)', '(lr)')``:
    left-to-right non-overlapping replacement over wrapped symbols IS
    greedy BPE merging, exactly, in both engines (``(a)(a)(a)`` →
    ``(aa)(a)``; a space-separated encoding gets this wrong because
    adjacent matches share the boundary space), and the parens make
    pattern hits unambiguous (tokens are ``[a-z0-9']`` only — a symbol
    can never contain a paren, so ``(a)(ab)`` can't false-match inside
    ``(ca)(b)``).

    Scale shape: the corpus collapses ONCE to the word-frequency vocab
    (one map-side-combined shuffle — the only thing that ever sees raw
    rows; frequencies carry the corpus scale from then on). Each round is
    a vocabulary-sized pipeline: explode adjacent pairs (≤ word-length ×
    |vocab| rows), one pair-keyed partial agg, a 1-row argmax fetch (the
    scalar-subquery convention), and one expression-only re-segmentation
    pass, localCheckpointed so plans don't nest across rounds. Early-exit
    when no pair remains. At 100 TB the vocab is ~10⁵⁻⁶ rows regardless
    of corpus size — the rounds cost megabytes.

    Reference parity: the iterative keyed-aggregate loop is Trident's
    persistentAggregate idiom (storm/trident/Stream.java); BPE training
    itself is the beyond-reference LLM-pipeline layer.
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # ONE materialization: the character-level vocab. Each round's merge
    # then rides as a LAZY chained replace expression over this frame (the
    # bpe_segment shape) instead of re-checkpointing the whole vocab per
    # round — one driver action (the argmax fetch) per round instead of
    # two, and k chained replaces over a ~10⁵⁻⁶-row vocab cost megabytes
    # of CPU, far less than a per-round materialization job.
    segs0 = words.select(
        F.regexp_replace("w", "(.)", r"($1)").alias("seg"), "freq"
    ).localCheckpoint()
    pair_expr = F.expr(
        "CASE WHEN size(__syms__) >= 2 THEN "
        "transform(sequence(1, size(__syms__) - 1), "
        "i -> struct(__syms__[i-1] AS l, __syms__[i] AS r)) "
        "ELSE array() END"
    )
    seg_expr = F.col("seg")
    merges: list[tuple] = []
    for rank in range(1, k + 1):
        syms = segs0.select(
            "freq",
            F.split(
                F.substring(seg_expr, F.lit(2), F.length(seg_expr) - 2), r"\)\("
            ).alias("__syms__"),
        )
        cnts = (
            syms.select("freq", F.explode(pair_expr).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        best = cnts.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, cnt))
        seg_expr = F.replace(  # Column args: symbols may contain quotes (')
            seg_expr, F.lit(f"({l})({r})"), F.lit(f"({l}{r})")
        )
        # bound the lazy chain (ADVICE r13 low): re-evaluated from segs0,
        # k chained replaces cost O(k²) total string work and an
        # expression tree of depth k — fine at gate scale (k ≤ 60,
        # measured cheaper than per-round checkpoints), quadratic
        # analysis time / analyzer stack risk at k ~10³⁺. Re-materialize
        # the segmentation every 64 rounds and reset the chain: total
        # work returns to O(k) per 64-round window with one extra job
        # per window, result-identical (the checkpoint holds exactly the
        # chain's value).
        if rank % 64 == 0:
            segs0 = segs0.select(
                seg_expr.alias("seg"), "freq"
            ).localCheckpoint()
            seg_expr = F.col("seg")
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, cnt bigint"
    )


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a LEARNED merge table (from :func:`bpe_train`, in rank
    order) to segment the corpus vocabulary — the tokenizer's ENCODE
    half: greedy replay of the merges over the paren-wrapped
    segmentation, one exact ``replace`` per rule. Returns
    ``(word, freq, n_tokens)`` — the per-word token count after
    merging, i.e. the compression the learned vocabulary buys.

    Scale shape: the merge list is k rows (driver-held by construction —
    it came out of training); segmentation is k chained map-side
    ``replace`` expressions over the word-frequency vocab. Nothing
    touches raw corpus rows after the initial vocab collapse.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    seg = F.regexp_replace("w", "(.)", r"($1)")
    for l, r in merges:
        seg = F.replace(seg, F.lit(f"({l})({r})"), F.lit(f"({l}{r})"))
    segged = words.withColumn("__seg__", seg)
    return segged.select(
        F.col("w").alias("word"),
        "freq",
        F.size(
            F.split(
                F.expr("substring(__seg__, 2, length(__seg__) - 2)"),
                r"\)\(",
            )
        )
        .cast("bigint")
        .alias("n_tokens"),
    )


def dsir_scores(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: float = 1e9,
    tokens_col: str | None = None,
) -> DataFrame:
    """DSIR-style importance scores for training-data selection (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): score every NON-target document by how much more likely
    its bag of tokens is under a unigram model of the TARGET domain than
    under a model of the raw pool — ``Σ_tokens [ln p_target(w) −
    ln p_raw(w)]`` with add-one smoothing over the joint vocabulary. High
    scores = raw documents that LOOK like the target domain; resampling
    by this score is the published recipe for tilting a crawl toward a
    domain without hand-written rules.

    Determinism (the BM25 convention): each term's log-ratio is computed
    once on identical doubles (BIGINT-count ratios), scaled to integer
    nano-units, and SUMMED AS BIGINT — no float accumulation order
    anywhere, so the score is bit-identical across engines and an exact
    DuckDB oracle holds. Returns ``(id, n_tokens, dsir_n)`` for raw
    (non-target) docs; callers rank/threshold.

    Scale shape: the corpus tokenizes ONCE (persisted explode); both
    unigram models collapse into one vocabulary-sized table (single
    map-side-combined agg with conditional sums); totals ride a broadcast
    1-row aggregate; scoring is one join of raw tokens against the
    vocab-sized model table plus one doc-keyed agg. Nothing is ever
    collected; nothing is quadratic."""
    # NULL predicate counts as RAW everywhere: the coalesce makes the
    # model counts (CASE WHEN t semantics) AND the scoring filter agree —
    # the oracle mirrors this with CASE WHEN for the counts and
    # `t IS DISTINCT FROM TRUE` for the scoring filter (plain NOT t would
    # drop NULL-predicate docs from scoring). Without the coalesce a NULL
    # would drop the row from BOTH models (F.sum skips NULLs and ~NULL is
    # NULL), silently diverging from the oracle
    toks = bounded_persist(
        df.select(
            F.col(id_col),
            F.coalesce(target_pred, F.lit(False)).alias("__t__"),
            F.explode(
                F.col(tokens_col) if tokens_col else tokens(text_col)
            ).alias("term"),
        ),
        "text.dsir.toks",
    )
    model = bounded_persist(
        toks.groupBy("term").agg(
            F.sum(F.col("__t__").cast("bigint")).cast("bigint").alias("ct"),
            F.sum((~F.col("__t__")).cast("bigint")).cast("bigint").alias("cr"),
        ),
        "text.dsir.model",
    )
    raw_counts = (
        toks.filter(~F.col("__t__"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    )
    return dsir_scores_from_counts(model, raw_counts, id_col, scale)


def dsir_scores_from_counts(
    model: DataFrame,
    raw_counts: DataFrame,
    id_col: str = "doc_id",
    scale: float = 1e9,
) -> DataFrame:
    """The DSIR scoring tail over ALREADY-FOLDED state — shared verbatim
    by :func:`dsir_scores` (batch) and the ``streaming_dsir`` gate, so
    the streaming twin equals the batch operator by construction (the
    ``bm25_rank_from_index`` pattern). ``model`` = (term, ct, cr) unigram
    counts of the target and raw pools — LINEAR sketches: per-epoch
    (term, Δct, Δcr) rows fold by SUM; ``raw_counts`` = (id, term, __n__)
    per-raw-doc token counts — each doc arrives exactly once, so epochs
    append. dsir_n = Σ __n__·lr(term) in integer nano-units equals the
    row-exploded Σ lr exactly (BIGINT arithmetic, no float accumulation
    order)."""
    tot = model.agg(
        F.sum("ct").cast("bigint").alias("nt"),
        F.sum("cr").cast("bigint").alias("nr"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    p_t = (F.col("ct") + 1).cast("double") / (F.col("nt") + F.col("v")).cast("double")
    p_r = (F.col("cr") + 1).cast("double") / (F.col("nr") + F.col("v")).cast("double")
    scored_terms = (
        model.crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.round((F.log(p_t) - F.log(p_r)) * F.lit(float(scale)))
            .cast("bigint")
            .alias("__lr__"),
        )
    )
    return (
        raw_counts.join(scored_terms, "term")
        .groupBy(id_col)
        .agg(
            F.sum("__n__").cast("bigint").alias("n_tokens"),
            F.sum(F.col("__n__") * F.col("__lr__")).cast("bigint").alias("dsir_n"),
        )
    )


GOPHER_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
    tokens_col: str | None = None,
) -> DataFrame:
    """The published rule-based quality filter suite — Gopher rules (Rae
    et al. 2021, §A1.1) with C4's line heuristics (Raffel et al. 2020):
    per document, the named signals web-corpus pipelines gate on, plus
    the combined ``passes`` verdict at the Gopher thresholds:

    - ``n_words`` in [50, 100 000]
    - ``mean_word_len`` in [3, 10]
    - ``symbol_ratio`` (# characters + ``...`` occurrences per word) < 0.1
    - ``bullet_frac`` (lines starting with a bullet) < 0.9
    - ``ellipsis_frac`` (lines ending with an ellipsis) < 0.3
    - ``alpha_frac`` (words containing a letter) > 0.8
    - ``stop_hits`` (distinct marker stopwords present) ≥ 2

    Everything is a per-row expression — no shuffle, no UDF,
    embarrassingly parallel at any scale; ratios round to ``ndigits`` on
    exact integer counts so the DuckDB oracle matches bit-for-bit. Empty
    documents report zero ratios and fail. This is the ABSOLUTE-rule
    complement to :func:`quality_gate`'s per-group RELATIVE percentile
    cut — production pipelines run both (rules first, then the
    distributional trim).

    ``tokens_col`` names an ALREADY-MATERIALIZED tokens column (the
    tokenize-once composition — ``pretrain_pipeline`` shares one pass
    between this filter and the DSIR models); the line/character rules
    still read the raw text, which tokens cannot carry."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.col(tokens_col) if tokens_col else tokens(text_col)
    n_words = F.size(toks).cast("bigint")
    nz = F.greatest(n_words, F.lit(1)).cast("double")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ell_cnt = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    is_bullet = lambda ln: F.ltrim(ln).rlike("^[-*•]")
    is_ell = lambda ln: F.rtrim(ln).rlike("(\\.\\.\\.|…)$")
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    mean_word_len = F.round(sum_len.cast("double") / nz, ndigits)
    symbol_ratio = F.round((hash_cnt + ell_cnt).cast("double") / nz, ndigits)
    bullet_frac = F.round(
        F.size(F.filter(lines, is_bullet)).cast("double") / n_lines, ndigits
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, is_ell)).cast("double") / n_lines, ndigits
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / nz,
        ndigits,
    )
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stops)).cast(
        "bigint"
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    passes = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_frac") < 0.9)
        & (F.col("ellipsis_frac") < 0.3)
        & (F.col("alpha_frac") > 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("passes", passes)
