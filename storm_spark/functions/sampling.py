"""Deterministic sampling, splitting, and chunking for training-data curation.

The operations a 100 TB corpus pipeline runs between cleaning and training:
assign train/val/test splits, downsample per stratum (language, source,
quality band), and cut documents into token windows for sequence packing.

All expression-only (JVM-side, codegen'd) and **hash-deterministic**: no RNG
state, no ``rand()`` — membership is a pure function of (salt, id), so

- results are identical across runs, executor counts, and retries (a Spark
  ``sample()`` re-draws per task attempt; an md5 threshold cannot),
- splits are STABLE under corpus growth: adding documents never moves an
  existing document between splits — the property training pipelines need to
  avoid test-set leakage across dataset versions,
- every operator has an exact DuckDB twin (md5 is identical everywhere;
  ``conv(substr(md5,1,15),16,10)`` == ``('0x'||substr(md5,1,15))::BIGINT``).

Scale shape: split/sample are stateless per-row projections — zero shuffles,
filters push into the scan's partition pruning when splits are materialized
as partition columns. Chunking is a 1-to-n ``posexplode`` whose output size
is corpus_tokens/stride — the one operator here that grows data; it carries
no shuffle either (explode is map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(col: Column, salt: str, buckets: int = _BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets): the first 60 bits of
    ``md5(salt || ':' || value)`` reduced mod ``buckets``. The salt decouples
    independent decisions on the same key (split vs sample vs shard)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 15), 16, 10
    ).cast("bigint")
    return h % buckets


def _sql_hash_bucket(expr: str, salt: str, buckets: int = _BUCKETS) -> str:
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {buckets})"
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label (train/val/test by default) from its
    id hash. Weights need not sum to 1 — they're normalized. Label order is
    the dict order, so the same weights always carve the same bucket ranges."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    b = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        cum += w
        cond = b < int(cum / total * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment (r9): hash the NEAR-DUP
    CLUSTER id instead of the doc id, so no near-duplicate pair ever
    straddles a split boundary — the classic eval-leakage bug (a
    paraphrase of a test document sitting in train) that a plain per-doc
    hash split cannot prevent, and the reason dedup and split belong in
    one pipeline. ``clusters`` is the ``(id, cluster_id)`` table from
    :func:`storm_spark.functions.dedup.near_dup_clusters` (or the live
    ``IncrementalComponents.labels()``); docs absent from it are
    singletons and key on their own id — the same left-join-coalesce
    convention as ``canonicalize_clusters``.

    Scale: ONE join against the assignment table (cluster assignments
    are a tiny fraction of the corpus — broadcast-able or
    bucket-co-located) and then the same pure hash arithmetic as
    :func:`deterministic_split`: no RNG, no shuffle for the split
    itself. Membership is stable across runs; a new near-dup of an
    existing cluster lands in that cluster's split as long as the
    cluster's min-id key is unchanged (reference parity:
    Trident stateQuery + each composition, storm/trident/Stream.java)."""
    lab = clusters.select(
        F.col("id").alias(id_col), F.col("cluster_id").alias("__cl__")
    )
    keyed = docs.join(lab, id_col, "left").withColumn(
        "__cl__", F.coalesce("__cl__", F.col(id_col))
    )
    return deterministic_split(keyed, "__cl__", weights, salt, out_col).drop("__cl__")


def sql_split_expr(
    id_expr: str, weights: dict[str, float] | None = None, salt: str = "split"
) -> str:
    """DuckDB twin of :func:`deterministic_split`'s label expression."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    b = _sql_hash_bucket(id_expr, salt)
    labels = list(weights.items())
    cases, cum = [], 0.0
    for name, w in labels[:-1]:
        cum += w
        cases.append(f"WHEN {b} < {int(cum / total * _BUCKETS)} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{labels[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: float | dict = 0.1,
    stratum_col: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic fraction of rows — uniformly, or per stratum
    value when ``fractions`` is a ``{stratum: fraction}`` dict (the
    rebalancing move: downsample an over-represented language/source to a
    target rate; strata absent from the dict are kept whole)."""
    b = hash_bucket(F.col(id_col), salt)
    if isinstance(fractions, dict):
        if stratum_col is None:
            raise ValueError("stratum_col is required with per-stratum fractions")
        thr = None
        for val, frac in fractions.items():
            cond = F.col(stratum_col) == val
            t = F.lit(int(frac * _BUCKETS))
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = thr.otherwise(F.lit(_BUCKETS))
        return df.filter(b < thr)
    return df.filter(b < int(fractions * _BUCKETS))


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 100,
    salt: str = "quota",
) -> DataFrame:
    """Exact-quota sampling: keep AT MOST ``k`` rows per group, chosen by
    deterministic hash rank (the "cap documents per domain/source" curation
    move — fraction sampling can't bound a runaway group, a quota can).

    Selection is a pure function of (salt, id): stable across runs, retries,
    executor counts, and corpus growth — a kept row stays kept as its group
    grows, rows only ever *leave* the sample (no churn). One group-keyed
    shuffle; the row_number top-k compiles to WindowGroupLimit, so each
    partition pre-trims to ``k`` before the exchange — the shuffle carries
    at most ``k × partitions`` rows per group, not the raw group (a hot
    group still lands on one reducer; for adversarial skew cap in two
    stages: pre-trim on a salted sub-group, then the true group).
    """
    rank_key = F.md5(F.concat_ws("\x00", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def sql_quota_pred(group_expr: str, id_expr: str, k: int, salt: str = "quota") -> str:
    """DuckDB twin of :func:`sample_k_per_group` (QUALIFY predicate)."""
    return (
        f"row_number() OVER (PARTITION BY {group_expr} "
        f"ORDER BY md5('{salt}' || chr(0) || CAST({id_expr} AS VARCHAR)) ASC, "
        f"{id_expr} ASC) <= {k}"
    )


def weighted_sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: Column | str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weight-biased exact-quota sampling: keep the ``k`` rows per group with
    the smallest priority ``u / w``, where ``u`` is a deterministic 60-bit
    uniform from ``md5(salt, id)`` and ``w`` the row's (positive) weight —
    the curation move "cap documents per source, but PREFER the long/high-
    quality ones" that unweighted :func:`sample_k_per_group` can't express.

    Semantics note (documented deviation): the exact Efraimidis–Spirakis
    PPS key is ``-ln(u01)/w``, but ``ln``'s last ulp differs between the
    JVM's ``Math.log`` and libm — cross-engine ranking would diverge on the
    oracle. The rational key ``u/w`` is ONE correctly-rounded IEEE-754
    division in both engines (bit-identical), stays strictly monotone in the
    weight (pairwise win probability ``1 − w_j/(2·w_i)`` for ``w_i ≥ w_j``),
    and keeps every determinism property of the quota sampler: stable under
    re-runs, retries, executor counts, and corpus growth (rows only ever
    leave the sample as heavier competitors arrive).

    Scale shape: identical to :func:`sample_k_per_group` — one group-keyed
    shuffle; the row_number top-k compiles to WindowGroupLimit, so each map
    partition pre-trims to ``k`` rows before the exchange.
    """
    w_col = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # rows with NULL or non-positive weight are EXCLUDED, not ranked: u/w
    # would be NULL (div-by-zero) or negative, and NULL ordering differs
    # between engines (Spark windows sort NULLS FIRST asc, DuckDB NULLS
    # LAST) — and a zero-weight row has zero selection mass in any
    # weight-proportional scheme anyway. The SQL twin must pre-filter the
    # same way (the gate query guards with greatest(w, 1)).
    eligible = df.filter(w_col.isNotNull() & (w_col > 0))
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x00", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    priority = u.cast("double") / w_col.cast("double")
    w = Window.partitionBy(group_col).orderBy(priority.asc(), F.col(id_col).asc())
    return (
        eligible.withColumn("__wrk__", F.row_number().over(w))
        .filter(F.col("__wrk__") <= k)
        .drop("__wrk__")
    )


def sql_weighted_quota_pred(
    group_expr: str, id_expr: str, weight_expr: str, k: int, salt: str = "wsample"
) -> str:
    """DuckDB twin of :func:`weighted_sample_k_per_group` (QUALIFY pred).
    Callers must pre-filter ``weight_expr`` to positive non-NULL values —
    the Spark side excludes those rows before ranking."""
    u = (
        f"('0x' || substr(md5('{salt}' || chr(0) || CAST({id_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT"
    )
    return (
        f"row_number() OVER (PARTITION BY {group_expr} "
        f"ORDER BY CAST({u} AS DOUBLE) / CAST({weight_expr} AS DOUBLE) ASC, "
        f"{id_expr} ASC) <= {k}"
    )


def sql_sample_pred(
    id_expr: str, fractions: float | dict = 0.1, stratum_expr: str | None = None,
    salt: str = "sample",
) -> str:
    """DuckDB twin of :func:`stratified_sample`'s keep-predicate."""
    b = _sql_hash_bucket(id_expr, salt)
    if isinstance(fractions, dict):
        def lit(v):
            # mirror the Spark comparison's typing: strings quoted (escaped),
            # numerics bare
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return str(v)
        cases = " ".join(
            f"WHEN {stratum_expr} = {lit(v)} THEN {int(f * _BUCKETS)}"
            for v, f in fractions.items()
        )
        return f"{b} < (CASE {cases} ELSE {_BUCKETS} END)"
    return f"{b} < {int(fractions * _BUCKETS)}"


def pack_token_budget(
    df: DataFrame,
    id_cols: list[str],
    len_col: str,
    budget: int,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Assign chunks to fixed-token-budget training bins — the sequence-
    packing step after :func:`chunk_token_windows`. Emits the input plus
    ``(shard, bin)``; a training job reads one (shard, bin) group per sample.

    Distributed next-fit shelf packing: rows hash into ``n_shards``
    independent shards (each shard packs in parallel — the global-sort
    bottleneck of exact first-fit-decreasing never materializes); within a
    shard, a deterministic hash-ordered running sum opens a new bin each
    time the budget would overflow: ``bin = floor(exclusive_cumsum / budget)``.
    Each bin holds ≤ budget tokens plus at most one straddling chunk (bounded
    by the max chunk length — callers chunking at ``max_len ≤ budget`` get
    ≤ ``budget + max_len`` per bin, the standard approximation distributed
    training pipelines accept in exchange for one window shuffle instead of
    a sequential pass).

    One shuffle (partition by shard, sort by hash) — at 100 TB raise
    ``n_shards`` so each shard's chunk list fits a task. Deterministic: the
    order inside a shard is the md5 of the id columns, not arrival order.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(salt), *[F.col(c).cast("string") for c in id_cols]))
    shard = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % n_shards
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("__h__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl_cumsum = F.coalesce(F.sum(len_col).over(w), F.lit(0))
    return (
        df.select("*", shard, h.alias("__h__"))
        .withColumn("bin", F.floor(excl_cumsum / budget))
        .drop("__h__")
    )


def sql_pack_exprs(
    id_exprs: list[str], len_expr: str, budget: int, n_shards: int = 32, salt: str = "pack"
) -> tuple[str, str, str]:
    """DuckDB twin of :func:`pack_token_budget`: (hash, shard, bin) SQL
    snippets — bin needs the hash exposed for the window order."""
    ids = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in id_exprs)
    h = f"md5('{salt}:' || {ids})"
    shard = f"(('0x' || substr({h}, 1, 15))::BIGINT % {n_shards})"
    bin_ = (
        f"CAST(FLOOR(COALESCE(SUM({len_expr}) OVER ("
        f"PARTITION BY {shard} ORDER BY {h} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {budget}) AS BIGINT)"
    )
    return h, shard, bin_


def chunk_token_windows(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    max_len: int,
    stride: int | None = None,
    out_text_col: str = "chunk_text",
) -> DataFrame:
    """Cut each document's token array into (optionally overlapping) windows
    of ``max_len`` tokens every ``stride`` positions — the pre-packing step
    of an LLM training pipeline. Emits one row per window:
    ``(id, chunk_no, chunk_text, n_tokens)``; empty documents emit nothing.

    ``stride`` defaults to ``max_len`` (abutting windows); ``stride <
    max_len`` overlaps them. The LAST window clamps to ``len - max_len + 1``
    instead of running past the end: every window is exactly ``max_len``
    tokens (short docs yield one whole-doc window), no degenerate tail
    chunk whose content is a suffix of the previous window — the tail would
    otherwise be over-weighted in the packed training set. Map-side 1-to-n
    explode, no shuffle; output volume is Σ tokens/stride rows.
    """
    stride = stride or max_len
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = df.select(id_col, toks.alias("__toks__")).filter(F.size("__toks__") > 0)
    L = F.size("__toks__")
    full = F.sequence(F.lit(1), F.greatest(L - max_len + 1, F.lit(1)), F.lit(stride))
    last_end = F.element_at(full, -1) + F.lit(max_len - 1)
    starts = F.when(L <= max_len, F.array(F.lit(1))).otherwise(
        F.when(last_end < L, F.concat(full, F.array(L - max_len + 1))).otherwise(full)
    )
    chunk = F.slice(F.col("__toks__"), F.col("__start__"), max_len)
    return (
        base.select(id_col, "__toks__", F.posexplode(starts).alias("chunk_no", "__start__"))
        .select(
            id_col,
            "chunk_no",
            F.array_join(chunk, " ").alias(out_text_col),
            F.size(chunk).alias("n_tokens"),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    mass_col: Column | str,
    targets: dict[str, float],
    ndigits: int = 6,
) -> DataFrame:
    """Static domain-mixture reweighting: per-group sampling weights that
    reshape a corpus to a target mixture (the dataset-mixing step before
    training — "web 60%, wikipedia 30%, code 10%" — applied downstream as a
    per-document sample probability or repetition factor; cf. DoReMi's
    static reference weights, arXiv:2305.10429).

    ``targets`` maps group value → target share (sum ≤ 1). Groups present in
    the corpus but not listed split the remaining target mass in proportion
    to their actual size (so an unlisted long tail keeps its internal
    balance). Listed groups absent from the corpus contribute nothing — the
    shares observed renormalize over what exists.

    Returns one row per group:
    ``(group_col, mass, actual_share, target_share, weight)`` with
    ``weight = target_share / actual_share``.

    Scale shape: ONE partial-agg shuffle of (group, partial mass) — group
    cardinality is domain/language-sized, never corpus-sized; the corpus
    total attaches as a broadcast single-row aggregate, so nothing collects
    to the driver. Pure expressions end-to-end (exact DuckDB twin).
    """
    tsum = sum(targets.values())
    if tsum > 1.0 + 1e-9:
        # over-subscribed targets would give every UNLISTED group a silently
        # NEGATIVE target share/weight — refuse at the API boundary
        raise ValueError(f"targets sum to {tsum}, must be <= 1")
    if any(v < 0 for v in targets.values()):
        raise ValueError("target shares must be non-negative")
    m = F.col(mass_col) if isinstance(mass_col, str) else mass_col
    per = df.groupBy(F.col(group_col).alias("__grp__")).agg(F.sum(m).alias("mass"))
    tmap = F.create_map(
        *[x for kv in targets.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    per = per.withColumn("__tgt__", tmap[F.col("__grp__")])
    tot = per.agg(
        F.sum("mass").alias("__tot__"),
        F.coalesce(
            F.sum(F.when(F.col("__tgt__").isNotNull(), F.col("mass"))), F.lit(0)
        ).alias("__cov__"),
        F.coalesce(F.sum("__tgt__"), F.lit(0.0)).alias("__tsum__"),
    )
    j = per.crossJoin(F.broadcast(tot))
    actual = F.col("mass") / F.col("__tot__")
    target = F.coalesce(
        F.col("__tgt__"),
        (F.lit(1.0) - F.col("__tsum__"))
        * F.col("mass")
        / F.nullif(F.col("__tot__") - F.col("__cov__"), F.lit(0)),
    )
    return j.select(
        F.col("__grp__").alias(group_col),
        F.col("mass"),
        F.round(actual, ndigits).alias("actual_share"),
        F.round(target, ndigits).alias("target_share"),
        F.round(target / actual, ndigits).alias("weight"),
    )


def training_order(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic global shuffle for training-data delivery: every row
    gets a shard and a position within it, pseudo-randomized by md5 over
    (epoch, id) — a different but reproducible permutation per epoch, no
    RNG state, stable under re-runs and retries (the property samplers here
    share; see :func:`deterministic_split`).

    Returns (id_col, shard, position) — position is 1-based within shard.

    Scale shape: shard assignment is a map-side hash; the position
    row_number shuffles once on the shard key. md5 is uniform, so shards
    balance to |corpus| / n_shards regardless of id distribution — the
    window sort is the per-shard cost, which is exactly the work a
    global orderBy would do, sliced n_shards ways. A data loader reads one
    shard partition, ordered, per worker.
    """
    key = F.md5(F.concat_ws(":", F.lit(epoch).cast("string"), F.col(id_col).cast("string")))
    shard = F.pmod(F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(F.col("__key__").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), key.alias("__key__"), shard.cast("bigint").alias("shard"))
        .select(F.col(id_col), "shard", F.row_number().over(w).cast("bigint").alias("position"))
    )


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity suppression: keep only rows whose quasi-identifier
    combination is shared by at least ``k`` rows — the release gate a
    privacy-aware pipeline runs before publishing (a quasi-identifier
    combination seen fewer than k times re-identifies its subjects;
    Sweeney 2002). NULL-valued quasi-identifiers group together (NULL is
    itself a disclosure-relevant value).

    Scale shape: ONE group-keyed exchange; the group size is a
    whole-partition window count over it (no ORDER BY, no sort; no join
    back), the filter is map-side after. Skewed quasi-groups are safe:
    big groups pass the gate by definition, and the window only counts.

    Returns the surviving rows (all columns) plus ``k_group_size``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("k_group_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("k_group_size") >= k)
    )
