"""Temporal joins — as-of join and interval range join (engine extensions;
absent in both the reference (SURVEY §2.6 'not present') and core Spark).

Two strategies:

- :func:`asof_join` — cogroup + ``pd.merge_asof`` per key group: one shuffle
  per side on the key, sorted merge inside each group, O(n log n) per group
  and no pair blowup. The scale path when each key's history fits a task
  (usual case: per-user/per-symbol series). This is preference order (b) from
  the guide: Pandas-UDF-backed ``applyInPandas`` where built-ins can't
  express the semantics.
- :func:`asof_join_ranked` — pure-DataFrame fallback: range join + ranking
  window. Exact same semantics; use when pandas is unavailable or groups are
  pathologically skewed (AQE splits the skewed join).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' mirrors),
    matching on the equi-key(s) ``on``. Right rows with no match pad null.

    Output: all left columns + right's non-key columns (null-padded).
    """
    import pandas as pd

    on_l = [on] if isinstance(on, str) else list(on)
    right_cols = [c for c in right.columns if c not in on_l]
    shared = [c for c in right_cols if c in left.columns and c != right_ts]
    if shared:
        # pd.merge_asof would keep LEFT's values under these names and the
        # right side's would silently vanish — refuse instead of corrupting
        raise ValueError(
            f"asof_join: right columns {shared} collide with left columns; "
            "rename them (or use asof_join_ranked, which aliases internally)"
        )
    out_fields = list(left.schema.fields) + [
        f for f in right.schema.fields if f.name not in on_l
    ]
    from pyspark.sql.types import StructType

    out_schema = StructType(out_fields)
    l_names = left.columns

    def merge(key, lpdf: "pd.DataFrame", rpdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        # merge_asof raises on null merge keys: null-ts left rows can never
        # match (pad them), null-ts right rows can never BE matched (drop)
        lnull = lpdf[lpdf[left_ts].isna()]
        lpdf = lpdf[lpdf[left_ts].notna()].sort_values(left_ts, kind="mergesort")
        rpdf = rpdf[rpdf[right_ts].notna()]
        frames = []
        if rpdf.empty:
            merged = lpdf.copy()
            for c in right_cols:
                merged[c] = None
            frames.append(merged[l_names + right_cols])
        else:
            rpdf = rpdf.sort_values(right_ts, kind="mergesort")[[right_ts] + [c for c in right_cols if c != right_ts]]
            merged = pd.merge_asof(
                lpdf,
                rpdf,
                left_on=left_ts,
                right_on=right_ts,
                direction=direction,
                suffixes=("", "__r__"),
            )
            if right_ts in merged.columns and f"{right_ts}__r__" in merged.columns:
                merged[right_ts] = merged[f"{right_ts}__r__"]
            frames.append(merged[l_names + right_cols])
        if not lnull.empty:
            padded = lnull.copy()
            for c in right_cols:
                padded[c] = None
            frames.append(padded[l_names + right_cols])
        return pd.concat(frames, ignore_index=True)

    return (
        left.groupBy(*on_l)
        .cogroup(right.groupBy(*on_l))
        .applyInPandas(merge, out_schema)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Interval range join: each point row pairs with the interval rows
    whose ``[start, end)`` contains its timestamp (plus optional equi-keys).

    Scale strategy — interval bucketing: a naive ``ts BETWEEN start AND end``
    theta join is a (broadcast) nested loop, O(|points| × |intervals|). Here
    each interval explodes to the coarse time buckets it overlaps and each
    point maps to its one bucket; the join becomes an EQUI-join on
    (bucket [, keys]) followed by the exact range filter — shuffle-parallel,
    cost ∝ co-bucketed pairs. Pick ``bucket_seconds`` near the typical
    interval length: shorter ⇒ more interval replication, longer ⇒ more
    false-pair filtering. All timestamp columns are epoch-second longs.
    """
    if how != "inner":
        raise ValueError("range_join is inner-only (outer + range filter is ill-defined)")
    on_l = [on] if isinstance(on, str) else list(on or [])
    b = F.lit(bucket_seconds)
    pts = points.withColumn("__bkt__", (F.col(ts_col) / b).cast("long"))
    spans = intervals.withColumn(
        "__bkt__",
        F.explode(
            # guard: sequence(a, b) DESCENDS when b < a, so an inverted or
            # empty interval (end <= start — bad data) would explode into
            # thousands of bucket rows instead of zero; emit no buckets
            # (explode of an empty array drops the row)
            F.when(
                F.col(end_col) > F.col(start_col),
                F.sequence(
                    (F.col(start_col) / b).cast("long"),
                    # end is exclusive: an interval ending exactly on a bucket
                    # boundary does not reach into the next bucket
                    ((F.col(end_col) - 1) / b).cast("long"),
                ),
            ).otherwise(F.array().cast("array<long>")),
        ),
    )
    joined = pts.join(spans, on=["__bkt__", *on_l], how=how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bkt__")


def asof_join_ranked(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of via range join + rank-1 window (pure Catalyst).

    The intermediate (left × matching-right) can blow up when many right
    rows precede each left row — prefer :func:`asof_join` for dense
    histories.
    """
    on_l = [on] if isinstance(on, str) else list(on)
    lid = "__lrow__"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    r = right.select(
        *[F.col(c).alias(f"__r_{c}__") for c in right.columns]
    )
    cond = F.lit(True)
    for k in on_l:
        cond = cond & (F.col(k) == F.col(f"__r_{k}__"))
    cond = cond & (F.col(f"__r_{right_ts}__") <= F.col(left_ts))
    joined = l.join(r, cond, "left")
    w = Window.partitionBy(lid).orderBy(F.col(f"__r_{right_ts}__").desc_nulls_last())
    ranked = joined.withColumn("__rk__", F.row_number().over(w)).filter(F.col("__rk__") == 1)
    right_cols = [c for c in right.columns if c not in on_l]
    return ranked.select(
        *left.columns, *[F.col(f"__r_{c}__").alias(c) for c in right_cols]
    )


def rolling_distinct_count(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
    out_day: str = "window_day",
    out_count: str = "active",
) -> DataFrame:
    """Trailing-``window_days`` distinct-key count per calendar day (the
    retention / rolling-active-users report): for each day ``d``, the number
    of distinct keys seen in days ``(d - window_days, d]``.

    Scale shape: (day, key) pairs are DEDUPED FIRST (one shuffle — collapses
    raw event volume to daily-active pairs), each pair then fans out
    map-side to the ``window_days`` windows it contributes to (a bounded
    explode of the already-deduped set, not of raw events), and the final
    ``groupBy(day).countDistinct(key)`` is the second and last shuffle. A
    naive window-function formulation would need a per-day full-history
    sort; this is two bounded shuffles at any corpus size.
    """
    day = F.to_date(F.col(ts_col))
    daily = df.select(day.alias("__d__"), F.col(key_col).alias("__k__")).distinct()
    fanned = daily.select(
        F.explode(F.sequence(F.col("__d__"), F.date_add(F.col("__d__"), window_days - 1))).alias(
            out_day
        ),
        "__k__",
    )
    return (
        fanned.groupBy(out_day)
        .agg(F.count_distinct(F.col("__k__")).alias(out_count))
        .orderBy(out_day)
    )


def gap_fill(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: Column | str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Resample an event stream onto a regular per-group time grid and
    forward-fill the holes — the time-series regularization step a metrics /
    feature pipeline runs before windowed models (every group gets one row
    per ``step_seconds`` bucket from its first to its last event; buckets
    with no events carry the last observed value and ``is_gap = true``).

    Returns ``(group_col, bucket, value_c, is_gap)`` — ``bucket`` is the
    bucket's epoch-seconds start (integer: engine-portable, no timestamp
    representation skew), ``value_c`` the per-bucket SUM of ``value_col``
    forward-filled across empty buckets.

    Exactness: bucketing is pure integer arithmetic (``unix_micros div 1e6
    div step × step`` — no double division anywhere), so grid membership and
    fill values are bit-identical to the SQL twin.

    Scale shape: one (group, bucket) partial-agg shuffle collapses raw
    events to bucket rows; the grid explodes map-side from a per-group
    (min, max) aggregate — output is |groups| × |buckets|, dense by design
    (that's the contract); the fill is one window over the SAME group key
    (sorted within group by bucket). The left join grid←buckets is
    group+bucket keyed and AQE-planned. A group's whole grid lands on one
    reducer for the fill — at 100 TB with multi-year spans, split the fill
    window by (group, year) and stitch the year boundaries with a second
    pass over the |groups| × |years| boundary rows.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    secs = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div 1000000")
    bucket = (secs - F.pmod(secs, F.lit(step_seconds))).alias("bucket")
    per_bucket = (
        df.select(F.col(group_col), bucket, v.alias("__v__"))
        .groupBy(group_col, "bucket")
        .agg(F.sum("__v__").alias("__v__"))
    )
    grid = (
        per_bucket.groupBy(group_col)
        .agg(F.min("bucket").alias("__lo__"), F.max("bucket").alias("__hi__"))
        .select(
            group_col,
            F.explode(
                F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(step_seconds))
            ).alias("bucket"),
        )
    )
    joined = grid.join(per_bucket, [group_col, "bucket"], "left")
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        group_col,
        "bucket",
        F.last("__v__", ignorenulls=True).over(w).alias("value_c"),
        F.col("__v__").isNull().alias("is_gap"),
    )


def sql_gap_fill(
    table: str, group_expr: str, ts_expr: str, value_expr: str, step_seconds: int = 3600
) -> str:
    """DuckDB twin of :func:`gap_fill` (full SELECT).

    Bucketing FLOORS like the Spark side (``secs - pmod(secs, step)``) —
    DuckDB's integer ``//`` truncates toward zero, which would diverge for
    pre-1970 (negative-epoch) timestamps, so the twin floors via double
    division (exact here: |secs| < 2^53 and any non-multiple's fractional
    part ≥ 1/step, far above the quotient's ulp)."""
    secs = f"(epoch_us(CAST({ts_expr} AS TIMESTAMP)) // 1000000)"
    b = (
        f"CAST(floor(CAST({secs} AS DOUBLE) / {step_seconds}) AS BIGINT)"
        f" * {step_seconds}"
    )
    return f"""
WITH __pb__ AS (
  SELECT {group_expr} AS grp, {b} AS bucket, SUM({value_expr}) AS v
  FROM {table} GROUP BY 1, 2),
__grid__ AS (
  SELECT grp, unnest(generate_series(lo, hi, {step_seconds})) AS bucket
  FROM (SELECT grp, MIN(bucket) AS lo, MAX(bucket) AS hi FROM __pb__ GROUP BY grp)),
__j__ AS (
  SELECT g.grp, g.bucket, p.v FROM __grid__ g LEFT JOIN __pb__ p USING (grp, bucket))
SELECT grp, bucket,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY grp ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_c,
       v IS NULL AS is_gap
FROM __j__
"""


def series_vectors(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: Column | str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-key dense, CENTERED time series on the corpus-wide bucket grid —
    the feature-building step for time-series similarity search (cf. EDBT
    2019 "Time Series Similarity Search for Streaming Data in Distributed
    Systems"): every key becomes one fixed-length vector (span/step
    entries; buckets with no events are 0), centered by the key's mean so
    a downstream cosine is Pearson-style shape correlation rather than
    magnitude match.

    Returns ``(key_col, series)`` with ``series: array<double>``.

    Exactness: with integer-unit values the per-bucket sums are BIGINT, so
    the centering mean is one exact integer sum divided once in double —
    order-independent, bit-identical across engines; the centered entries
    are single-subtraction doubles.

    Scale shape: one (key, bucket) partial-agg shuffle collapses raw
    events; the global (min, max) bucket bounds attach as a broadcast
    1-row aggregate; the dense vector assembles per key from a
    map_from_entries + sequence transform (map-side after one key
    shuffle). Output is |keys| rows of span/step doubles — size the step
    so vectors stay task-sized (a year of hours is 8.8k entries).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    secs = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div 1000000")
    bucket = (secs - F.pmod(secs, F.lit(step_seconds))).alias("__b__")
    per = (
        df.select(F.col(key_col), bucket, v.alias("__v__"))
        .groupBy(key_col, "__b__")
        .agg(F.sum("__v__").cast("bigint").alias("__v__"))
    )
    bounds = per.agg(
        F.min("__b__").alias("__lo__"),
        ((F.max("__b__") - F.min("__b__")) / step_seconds + 1)
        .cast("bigint")
        .alias("__n__"),
    )
    entries = (
        per.crossJoin(F.broadcast(bounds))
        .select(
            F.col(key_col),
            F.col("__n__"),
            F.struct(
                ((F.col("__b__") - F.col("__lo__")) / step_seconds)
                .cast("bigint")
                .alias("key"),
                F.col("__v__").alias("value"),
            ).alias("__e__"),
        )
        .groupBy(key_col)
        .agg(
            F.map_from_entries(F.collect_list("__e__")).alias("__m__"),
            F.max("__n__").alias("__n__"),
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("__n__") - 1),
        # __m__ is a MAP keyed by grid position — element_at looks up the
        # key itself (array-style 1-based indexing does not apply)
        lambda i: F.coalesce(F.element_at(F.col("__m__"), i), F.lit(0)).cast("double"),
    )
    with_dense = entries.withColumn("__dense__", dense)
    mean = F.aggregate(
        F.col("__dense__"), F.lit(0.0), lambda acc, x: acc + x
    ) / F.size("__dense__")
    return with_dense.withColumn("__mu__", mean).select(
        F.col(key_col),
        F.transform(F.col("__dense__"), lambda x: x - F.col("__mu__")).alias("series"),
    )


def series_similarity_topk(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: Column | str,
    query_keys: list,
    step_seconds: int = 3600,
    k: int = 5,
) -> DataFrame:
    """Top-k most similar activity series to each query key's series —
    centered cosine (≡ Pearson shape correlation) over the common dense
    grid from :func:`series_vectors`. Returns ``(query_key, neighbor_key,
    sim, rank)``; self-matches excluded; tie-break smaller neighbor key.

    Scale shape: the |query_keys| vectors broadcast against the corpus
    vectors (one map-side pass — same shape as cosine_topk); rank is a
    per-query window with WindowGroupLimit pre-trim.
    """
    from storm_spark.functions.similarity import _cos

    from storm_spark.session import bounded_persist

    # Both branches (broadcast query side + corpus side) read the vectors —
    # persist so the grid/center pipeline runs once, not twice. The cache is
    # the DISTILLED |keys| × (span/step) vectors, not raw events — the right
    # thing to pin at scale; bounded_persist caps it at one live cache per
    # session (the returned DF is lazy, so unpersist-after-action is
    # impossible from inside the operator).
    vecs = bounded_persist(
        series_vectors(df, key_col, ts_col, value_col, step_seconds),
        "temporal.series_similarity_topk.vecs",
    )
    q = vecs.filter(F.col(key_col).isin(query_keys)).select(
        F.col(key_col).alias("query_key"), F.col("series").alias("__qs__")
    )
    c = vecs.select(F.col(key_col).alias("neighbor_key"), F.col("series").alias("__cs__"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_key") != F.col("neighbor_key"))
    sim = pairs.select(
        "query_key", "neighbor_key", _cos(F.col("__qs__"), F.col("__cs__")).alias("sim")
    )
    w = Window.partitionBy("query_key").orderBy(F.col("sim").desc(), F.col("neighbor_key").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_key", "neighbor_key", F.round("sim", 6).alias("sim"), "rank")
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    type_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition counts: ``(from_type, to_type, n)``
    over each key's ordered event sequence — the behavioral-model /
    next-event-prediction input. A key's first event has no predecessor and
    contributes nothing.

    ``order_cols`` must make the per-key order total (e.g. ``[ts,
    event_id]``) — ties would make lag() nondeterministic across engines.

    Scale shape: one key-keyed exchange for the lag window (each key's
    sequence sorts within its partition), then a partial-agg shuffle of
    (from, to) pairs whose cardinality is |types|² — the classic
    window-then-tiny-agg plan; no self-join (a ts-based self-join would be
    O(events × avg-run-length)).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev = F.lag(F.col(type_col)).over(w)
    return (
        df.select(F.col(key_col), F.col(type_col), *[F.col(c) for c in order_cols])
        .withColumn("from_type", prev)
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel conversion counts: for each prefix of ``steps``, how
    many users completed the steps IN ORDER — each step strictly after the
    user's earliest qualifying time for the previous step (the standard
    first-touch funnel; re-orderings and pre-funnel events don't count).

    Returns ``(step, event_type, n_users)`` with ``step`` 1-based.

    Scale shape: ONE scan, ONE user-keyed shuffle. Step events collapse to
    a per-user time-sorted list, and a greedy fold advances a (stage,
    frontier) state machine through it — the greedy scan provably computes
    the same frontiers as the step-by-step ``min(t > prev_frontier)``
    definition (each step advances at its earliest qualifying event). The
    first cut of this operator chained k user-keyed join+min rounds
    instead: semantically identical but it re-scanned the events table
    O(k²/2) times across the union's branches (17 Exchanges for k=3,
    plan-measured) — the fold shape replaces that with one scan and a
    k-row final aggregate. Per-user state is the user's STEP-TYPE events
    only; bound it further by pre-filtering the time window upstream.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("__u__"),
        F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("e")).alias("__ev__"),
    )
    per_user = ev.groupBy("__u__").agg(F.sort_array(F.collect_list("__ev__")).alias("__evs__"))
    init = F.struct(
        F.lit(0).cast("int").alias("stage"), F.lit(None).cast("timestamp").alias("ft")
    )
    # NULL-timestamp events never qualify (matching the SQL twin, where
    # `ts > frontier` is never true for NULL and MIN ignores NULLs); without
    # the isNotNull guard a NULL-ts first event would set ft=NULL and the
    # isNull branch would then let every later matching event advance
    # regardless of time order
    advance = lambda acc, e: F.when(  # noqa: E731
        (acc["stage"] < k)
        & e["t"].isNotNull()
        & (e["e"] == F.element_at(steps_arr, acc["stage"] + 1))
        & (acc["ft"].isNull() | (e["t"] > acc["ft"])),
        F.struct((acc["stage"] + 1).alias("stage"), e["t"].alias("ft")),
    ).otherwise(acc)
    staged = per_user.select(
        F.aggregate("__evs__", init, advance)["stage"].alias("__stage__")
    )
    reached = staged.groupBy("__stage__").agg(F.count(F.lit(1)).alias("__n__"))
    # n_users(step i) = users whose final stage >= i; emit every step, 0s kept
    spark = df.sparkSession
    step_rows = spark.range(1, k + 1).select(
        F.col("id").alias("step"),
        F.element_at(steps_arr, F.col("id").cast("int")).alias("event_type"),
    )
    return (
        step_rows.join(reached, F.col("__stage__") >= F.col("step"), "left")
        .groupBy("step", "event_type")
        .agg(F.coalesce(F.sum("__n__"), F.lit(0)).cast("bigint").alias("n_users"))
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_weeks: int = 12,
) -> DataFrame:
    """Weekly retention triangle: a user's cohort is the ISO week of their
    FIRST event; cell ``(cohort_week, week_offset)`` counts distinct cohort
    members active in that later week — the standard cohort-retention
    report.

    Returns ``(cohort_week date, week_offset, n_active)``.

    Scale shape: activity collapses to distinct (user, week) pairs first
    (one shuffle — bounded by users × weeks, not events); the cohort week
    is a ``min`` WINDOW over the same user partitioning (no join, no second
    shuffle — the first-cut groupBy+join formulation spent 6 Exchanges
    where this spends 4, plan-measured); the final aggregate is
    cohort×offset-sized. Offsets are exact multiples of 7 days divided
    down, so the arithmetic is integer-deterministic in any engine.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    active = df.select(F.col(user_col).alias("__u__"), wk.alias("__w__")).distinct()
    w_user = Window.partitionBy("__u__")
    j = (
        active.withColumn("__cw__", F.min("__w__").over(w_user))
        .withColumn("__off__", (F.datediff("__w__", "__cw__") / 7).cast("bigint"))
        .filter(F.col("__off__") <= max_weeks)
    )
    return (
        j.groupBy(F.col("__cw__").alias("cohort_week"), F.col("__off__").alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


def scd2_from_history(
    df: DataFrame,
    key_col: str,
    attr_cols: list[str],
    order_cols: list[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 table from a raw change
    history — the warehouse versioning step that turns a CDC/event log
    into per-key validity intervals: one row per (key, attribute-state)
    RUN, with ``valid_from`` = the run's first event time and ``valid_to``
    = the next run's start (NULL while current). Consecutive events whose
    tracked attributes are unchanged collapse into one interval;
    NULL-safe comparison, so NULL→NULL is "unchanged" and NULL→value is a
    new version.

    ``order_cols`` must make the per-key order total (e.g. ``[ts,
    event_id]``); ``ts_col`` defaults to ``order_cols[0]`` and supplies
    the interval bounds.

    Scale shape: ONE key-keyed exchange carries both windows (the
    change-point lag and the interval-closing lead run over the same
    partitioning+ordering, so Catalyst plans Exchange → Sort → Window →
    Filter → Window with no second shuffle); output size tracks the CHANGE
    count, not the history. A key's history lands on one reducer — for
    monster keys split by (key, year) and stitch the boundary rows, the
    gap_fill remedy.
    """
    ts_col = ts_col or order_cols[0]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    state = F.struct(*[F.col(c) for c in attr_cols])
    # a first row's lag is a NULL struct, and eqNullSafe(struct, NULL) is
    # false — so the single negation already marks it as a change
    is_change = ~state.eqNullSafe(F.lag(state).over(w))
    # first row of each run survives; lead() then closes each interval with
    # the NEXT surviving row's start — over the same (key, order) window
    w2 = Window.partitionBy(key_col).orderBy(*order_cols)
    changes = (
        df.select(
            F.col(key_col),
            *[F.col(c) for c in attr_cols],
            *[F.col(c) for c in order_cols if c not in attr_cols],
        )
        .withColumn("__chg__", is_change)
        .filter(F.col("__chg__"))
    )
    return changes.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current snapshot of an SCD2 table: rows whose interval is open
    (``valid_to IS NULL``) — a pushable filter, no shuffle."""
    return dim.filter(F.col("valid_to").isNull())


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts: str,
    attr_cols: list[str],
    valid_from: str = "valid_from",
) -> DataFrame:
    """Point-in-time join: attach to each fact row the SCD2 dimension
    version valid AT the fact's timestamp (``valid_from <= fact_ts``,
    latest such version) — the warehouse lookup that makes historical
    reports reproducible (joining the CURRENT dimension instead silently
    rewrites history). Facts before the key's first version pad NULL.

    Pure-expression formulation — NO join at all: version-start rows and
    fact rows UNION into one stream, a single (key)-keyed window ordered
    by ``(ts, version-first)`` carries the latest version's attribute
    STRUCT forward (struct-carry, not per-column carry — a version whose
    attribute is legitimately NULL must not inherit an older version's
    value), and fact rows read the carried struct. One exchange, zero
    fan-out; a key's traffic lands on one reducer (split monster keys by
    (key, year) and stitch — the gap_fill remedy). The version-first tie
    order makes a version effective ON its own start instant (asof <=).

    ``valid_to`` never needs checking: :func:`scd2_from_history` intervals
    are contiguous per key (each ``valid_to`` IS the next ``valid_from``),
    so the latest version at or before t is the containing one. For
    interval tables WITH gaps, use :func:`range_join` instead.

    Output: all fact columns + ``attr_cols`` + ``valid_from``.
    """
    fact_cols = fact.columns
    attrs = F.struct(
        *[F.col(c) for c in attr_cols], F.col(valid_from).alias("__vf__")
    )
    d = dim.select(
        F.col(key_col),
        F.col(valid_from).alias("__ts__"),
        F.lit(0).alias("__tag__"),
        attrs.alias("__ver__"),
        *[F.lit(None).cast(fact.schema[c].dataType).alias(f"__f_{c}__")
          for c in fact_cols if c != key_col],
    )
    f = fact.select(
        F.col(key_col),
        F.col(fact_ts).alias("__ts__"),
        F.lit(1).alias("__tag__"),
        F.lit(None).cast(d.schema["__ver__"].dataType).alias("__ver__"),
        *[F.col(c).alias(f"__f_{c}__") for c in fact_cols if c != key_col],
    )
    # the trailing __ver__ struct orders same-instant versions
    # deterministically (struct comparison is field-lexicographic and
    # engine-portable): two versions sharing one valid_from — e.g. SCD2
    # built from equal-ts change events — always carry the SAME winner
    # instead of whichever row the shuffle ordered last. Fact rows' NULL
    # structs only tie among themselves (tag already sorts them after
    # every dim row at their instant), where order cannot change the
    # carried value.
    w = (
        Window.partitionBy(key_col)
        .orderBy("__ts__", "__tag__", F.col("__ver__").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = d.unionByName(f).withColumn(
        "__cur__", F.last("__ver__", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__tag__") == 1).select(
        F.col(key_col),
        *[F.col(f"__f_{c}__").alias(c) for c in fact_cols if c != key_col],
        *[F.col("__cur__")[c].alias(c) for c in attr_cols],
        F.col("__cur__")["__vf__"].alias(valid_from),
    )


def event_paths(
    df: DataFrame,
    key_col: str,
    type_col: str,
    order_cols: list[str],
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Common event PATHS — every run of ``n`` consecutive events per key,
    counted corpus-wide: the "what journeys do users actually take"
    report, the order-(n−1) generalization of :func:`event_transitions`
    (n=2 degenerates to exactly its pair counts). Returns
    ``(path, n_occurrences)`` with ``path`` = the n types joined by
    ``>`` (e.g. ``view>cart>purchase``); runs shorter than ``n`` at a
    key's start contribute nothing.

    ``order_cols`` must make the per-key order total (lag ties would make
    paths engine-dependent).

    Scale shape: the same ONE key-keyed exchange as event_transitions —
    all n−1 lags ride a single window over one sort — then a
    partial-agg shuffle whose cardinality is ≤ |types|ⁿ (typed event
    vocabularies keep this tiny; for open vocabularies cap n, not the
    data). No self-join: a join-based n-gram build would be
    O(events × run-length) per level.
    """
    if n < 2:
        raise ValueError(f"need n >= 2, got {n}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    steps = [
        F.lag(F.col(type_col), n - 1 - i).over(w).alias(f"__p{i}__")
        for i in range(n - 1)
    ]
    stepped = df.select(F.col(key_col), F.col(type_col), *[F.col(c) for c in order_cols]).select(
        *steps, F.col(type_col).alias(f"__p{n - 1}__")
    )
    full = stepped.filter(F.col("__p0__").isNotNull())
    path = F.concat_ws(">", *[F.col(f"__p{i}__") for i in range(n)])
    return (
        full.groupBy(path.alias("path"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: Column | str,
    end_col: Column | str,
) -> DataFrame:
    """Union of overlapping/touching intervals per key — the interval
    twin of :func:`activity_streaks`'s gaps-and-islands: collapse a pile
    of per-event validity/busy windows into maximal disjoint spans
    (machine busy periods, session coverage, blackout windows, copyright
    embargo spans in a curation pipeline). Returns one row per merged
    span: ``(key, span_start, span_end, n_intervals)``. Touching
    intervals (next start == previous end) merge; a strictly positive gap
    splits.

    The island trick, interval form: order by (start, end) within the
    key; a row opens a NEW span iff its start exceeds the running
    ``MAX(end)`` over all PRECEDING rows (not just the previous row —
    an early long interval can swallow several short later ones); the
    cumulative sum of those break flags is the island id.

    Scale shape: ONE key-keyed exchange — both window passes (preceding
    max, cumulative break sum) and the (key, island) rollup all run on
    the same key partitioning (grouping on (key, island) is satisfied by
    key-partitioning; the :func:`activity_streaks` argument). Integer /
    timestamp comparisons only — exact on any engine.
    """
    s = F.col(start_col) if isinstance(start_col, str) else start_col
    e = F.col(end_col) if isinstance(end_col, str) else end_col
    iv = df.select(
        F.col(key_col).alias("key"), s.alias("__s__"), e.alias("__e__")
    )
    w = Window.partitionBy("key").orderBy("__s__", "__e__")
    prev_max = F.max("__e__").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (
        (prev_max.isNull() | (F.col("__s__") > prev_max)).cast("int")
    )
    islands = iv.withColumn(
        "__island__",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("key", "__island__").agg(
        F.min("__s__").alias("span_start"),
        F.max("__e__").alias("span_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    ).drop("__island__")


def activity_streaks(
    df: DataFrame,
    key_col: str,
    ts_col: Column | str,
) -> DataFrame:
    """Longest consecutive-day activity streak per key — the classic
    gaps-and-islands reduction: distinct active days, then
    ``day − row_number`` is CONSTANT within a consecutive run (each next
    day advances both by one) and jumps at every gap, so grouping on that
    island constant splits runs without self-joins or iteration. Returns
    ``(key, longest_streak, n_active_days, n_streaks)`` — the engagement
    / data-continuity profile (sensor uptime runs, user habit streaks)
    that :func:`sessionize`'s intra-day gap logic doesn't express.

    Exactness: date arithmetic and counts only — no floats anywhere.

    Scale shape: two exchanges, both the ones you'd want — the distinct
    shuffles (key, day) WITH map-side partial dedup (raw event volume
    collapses before the wire), then the window re-keys the already-tiny
    distinct-day rows on ``key`` alone; the island count and the final
    per-key rollup REUSE that key partitioning with zero further
    exchanges (grouping on (key, island) is satisfied by key-partitioning
    — every group lives in one partition).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    days = df.select(
        F.col(key_col).alias("key"), F.to_date(ts).alias("__day__")
    ).distinct()
    w = Window.partitionBy("key").orderBy("__day__")
    islands = days.withColumn(
        "__island__", F.date_sub(F.col("__day__"), F.row_number().over(w))
    )
    runs = islands.groupBy("key", "__island__").agg(
        F.count(F.lit(1)).alias("__len__")
    )
    return runs.groupBy("key").agg(
        F.max("__len__").cast("bigint").alias("longest_streak"),
        F.sum("__len__").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


def seasonal_baseline(
    df: DataFrame,
    key_col: str,
    ts_col: Column | str,
    value_col: Column | str,
    sigma_k: int = 3,
) -> DataFrame:
    """Per-(key, hour-of-day) seasonal profile with an INTEGER-EXACT
    anomaly count — the seasonality-aware screen :func:`trailing
    zscore <storm_spark.functions.robust.trailing_zscore>` isn't: a value
    normal for 14:00 can be a 5-sigma spike for 03:00, so the baseline
    must be the key's OWN distribution at that hour, not its trailing
    window. Returns ``(key, hod, n, mean_v, sd_v, n_anomalies)``.

    The anomaly test |v − mean| > k·sd is evaluated WITHOUT any float:
    squaring both sides and clearing denominators gives
    ``(v·n − sum)² > k²·(n·sumsq − sum²)`` — pure integer arithmetic in
    DECIMAL(38,0) (the ks_drift convention), so the flag is bit-identical
    across engines even exactly ON the boundary; mean/sd are reported as
    6-rounded doubles of exact integer sufficient statistics.

    Scale shape: one (key, hod)-keyed partial agg for the profile (24×
    keys rows), then one join of the events back to it — AQE decides the
    strategy (the profile is key-cardinality-sized; no forced broadcast)
    — and a second tiny agg. Pass integer units (cents).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "decimal(38,0)"
    )
    rows = df.select(
        F.col(key_col).alias("key"), F.hour(ts).alias("hod"), v.alias("__v__")
    ).where(F.col("__v__").isNotNull())
    prof = rows.groupBy("key", "hod").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n__"),
        F.sum("__v__").alias("__s__"),
        F.sum(F.col("__v__") * F.col("__v__")).alias("__s2__"),
    )
    joined = rows.join(prof, ["key", "hod"])
    lhs = (F.col("__v__") * F.col("__n__") - F.col("__s__"))
    rhs = F.lit(int(sigma_k) ** 2) * (
        F.col("__n__") * F.col("__s2__") - F.col("__s__") * F.col("__s__")
    )
    return (
        joined.groupBy("key", "hod")
        .agg(
            F.first("__n__").cast("bigint").alias("n"),
            F.first("__s__").alias("__s__"),
            F.first("__s2__").alias("__s2__"),
            F.sum(F.when(lhs * lhs > rhs, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .select(
            "key",
            "hod",
            "n",
            F.round(
                F.col("__s__").cast("double") / F.col("n").cast("double"), 6
            ).alias("mean_v"),
            F.round(
                F.sqrt(
                    (
                        F.col("n").cast("double")
                            * F.col("__s2__").cast("double")
                        - F.col("__s__").cast("double")
                            * F.col("__s__").cast("double")
                    )
                )
                / F.col("n").cast("double"),
                6,
            ).alias("sd_v"),
            "n_anomalies",
        )
    )
