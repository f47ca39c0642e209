"""Robust statistics — median/MAD outlier detection per group.

The data-quality screen a metrics or training pipeline runs before trusting
a value column: flag rows whose absolute deviation from their group's
MEDIAN exceeds ``k ×`` the group's MAD (median absolute deviation). Median
and MAD are 50%-breakdown-point estimators — unlike mean/stddev z-scores,
the contaminating outliers themselves can't drag the threshold (Hampel's
rule; Leys et al. 2013, J. Exp. Soc. Psych.).

Determinism: with the value pre-scaled to integer units (``cents``), every
intermediate is an exact binary fraction — the interpolated median of
integers is a multiple of 0.5, deviations are multiples of 0.5, the MAD is
a multiple of 0.25, and ``k × MAD`` (k a small integer or exact binary
float) is exact — so the flag is bit-identical across engines and the
operator carries an exact DuckDB oracle (``percentile`` == ``quantile_cont``,
pos = p·(n−1) linear interpolation).

Scale shape: ONE group-keyed exchange. Both medians are whole-partition
window aggregates over the SAME partitioning (no ORDER BY → no sort), so
Catalyst plans Exchange(group) → Window(median) → Window(MAD) with zero
additional shuffles; the per-row flag is a map-side expression after that.
A group still lands on one reducer — group cardinality here is
domain/event-type-sized. For a single monster group, pre-aggregate to a
(value, count) histogram first and run the weighted median on that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    k: float = 3.0,
    out_prefix: str = "",
) -> DataFrame:
    """Append ``median``, ``mad``, and boolean ``is_outlier`` columns
    (optionally prefixed) computed per ``group_col``.

    ``is_outlier`` is strict: ``|v − median| > k × MAD``. A group whose MAD
    is 0 (over half its values identical) flags every value not equal to the
    median — the standard Hampel degenerate case, kept deliberately: those
    groups are exactly the ones where any deviation is suspicious.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = Window.partitionBy(group_col)
    med_c, mad_c, flag_c = (
        out_prefix + "median",
        out_prefix + "mad",
        out_prefix + "is_outlier",
    )
    with_med = df.withColumn(med_c, F.percentile(v, 0.5).over(w))
    dev = F.abs(v - F.col(med_c))
    with_mad = with_med.withColumn(mad_c, F.percentile(dev, 0.5).over(w))
    return with_mad.withColumn(flag_c, dev > F.lit(float(k)) * F.col(mad_c))


def mad_outliers_histogram(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    k: float = 3.0,
) -> DataFrame:
    """The monster-group remedy promised in :func:`mad_outliers`'s
    docstring, implemented: collapse each group to a ``(value, count)``
    histogram FIRST (one map-side-combined shuffle — the only pass over
    raw rows), then read both interpolated medians off cumulative counts.
    Per-group cost is bounded by DISTINCT values, not rows — a
    billion-row group with 50k distinct cents costs 50k histogram rows
    where the window formulation sorts a billion on one reducer.

    Exactness: identical results to :func:`mad_outliers` on integer-unit
    inputs (same ``pos = 0.5·(n−1)`` interpolation; with integer values
    the midpoint math is exact binary fractions, so the interpolation
    grouping can't introduce ulp skew) — the gate query runs against the
    SAME oracle as the window path.

    Returns one row per group: ``(group_col, n, n_outliers, median, mad,
    min_outlier, max_outlier)`` — aggregate-level (the histogram can't
    hand back per-row flags without a re-join; join the output back on
    ``group_col`` and compare when row flags are needed).
    """
    v_raw = F.col(value_col) if isinstance(value_col, str) else value_col
    # F.percentile (the window path) SKIPS nulls; drop them here too or the
    # (group, NULL) bucket inflates n and, sorting first, shifts every
    # cumulative position — medians/MADs would silently diverge on any
    # dataset with missing values. `n` below is therefore the NON-NULL count.
    hist = (
        df.where(v_raw.isNotNull())
        .groupBy(F.col(group_col), v_raw.alias("__v__"))
        .agg(F.count(F.lit(1)).alias("__cnt__"))
    )

    def _median_from(hist_df, grp, val, cnt):
        w_cum = (
            Window.partitionBy(grp)
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_all = Window.partitionBy(grp)
        cum = F.sum(cnt).over(w_cum)
        n = F.sum(cnt).over(w_all)
        pos = F.lit(0.5) * (n - F.lit(1)).cast("double")
        i0 = F.floor(pos)
        frac = pos - i0
        h = hist_df.select(
            F.col(grp),
            F.col(val),
            cum.alias("__cum__"),
            n.alias("__n__"),
            i0.alias("__i0__"),
            frac.alias("__frac__"),
        )
        v0 = F.min(F.when(F.col("__cum__") >= F.col("__i0__") + 1, F.col(val)))
        v1 = F.min(F.when(F.col("__cum__") >= F.col("__i0__") + 2, F.col(val)))
        return h.groupBy(grp).agg(
            F.max("__n__").alias("__n__"),
            (
                F.max(F.col("__frac__"))  # constant per group (function of n)
                * (F.coalesce(v1, v0) - v0)  # n odd or i0+1 in same bucket
                + v0
            ).alias("__med__"),
        )

    med = _median_from(hist, group_col, "__v__", "__cnt__")
    dev_hist = (
        hist.join(med.select(group_col, "__med__"), group_col)
        .select(
            F.col(group_col),
            F.abs(F.col("__v__") - F.col("__med__")).alias("__dev__"),
            "__cnt__",
            "__v__",
        )
    )
    dev_agg = dev_hist.groupBy(group_col, "__dev__").agg(F.sum("__cnt__").alias("__cnt__"))
    mad = _median_from(dev_agg, group_col, "__dev__", "__cnt__").select(
        F.col(group_col), F.col("__med__").alias("__mad__")
    )
    flagged = dev_hist.join(mad, group_col).withColumn(
        "__out__", F.col("__dev__") > F.lit(float(k)) * F.col("__mad__")
    )
    out_v = F.when(F.col("__out__"), F.col("__v__"))
    return (
        flagged.groupBy(group_col)
        .agg(
            F.sum("__cnt__").cast("bigint").alias("n"),
            F.sum(F.when(F.col("__out__"), F.col("__cnt__")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_outliers"),
            F.min(out_v).alias("min_outlier"),
            F.max(out_v).alias("max_outlier"),
            F.min("__mad__").alias("mad"),
        )
        .join(med.select(group_col, F.col("__med__").alias("median")), group_col)
        .select(
            group_col, "n", "n_outliers", "median", "mad", "min_outlier", "max_outlier"
        )
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str = "winsorized",
) -> DataFrame:
    """Append ``out_col`` = the value clipped to its group's
    ``[lower, upper]`` interpolated percentiles — the transform counterpart
    of :func:`mad_outliers` (flagging): tail values are pulled to the
    boundary instead of dropped, preserving row count for downstream
    aggregates that can't tolerate deletion (the classic pre-aggregation
    treatment for long-tailed metrics).

    Same single-exchange shape as :func:`mad_outliers`: both percentile
    bounds are whole-partition window aggregates over one group
    partitioning; the clip is a map-side ``least/greatest``. With integer-
    unit inputs the bounds are exact binary fractions (interpolation of
    integers), so results are engine-portable.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = Window.partitionBy(group_col)
    lo = F.percentile(v, float(lower)).over(w)
    hi = F.percentile(v, float(upper)).over(w)
    # least/greatest SKIP nulls in both engines, which would silently
    # rewrite a missing measurement as the group's lower bound — a NULL
    # value must stay NULL through the transform
    clipped = F.least(F.greatest(v.cast("double"), lo), hi)
    return df.withColumn(out_col, F.when(v.isNotNull(), clipped))


def trailing_zscore(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: Column | str,
    window: int = 24,
    min_periods: int = 8,
    out_col: str = "z",
) -> DataFrame:
    """Append ``out_col`` = the z-score of each value against its key's
    TRAILING window of the previous ``window`` values (current row
    excluded) — the online anomaly screen a metrics pipeline runs where
    :func:`mad_outliers`'s whole-group median would leak the future into
    the past. NULL when fewer than ``min_periods`` trailing values exist
    (warm-up) or the trailing variance is zero.

    Exactness: with integer-unit values the window COUNT/SUM/SUM-of-squares
    are exact BIGINTs; mean and population variance derive from those three
    sums in double with the SAME formula on any engine (``s2/n − (s/n)²``)
    — no Welford-vs-two-pass accumulation skew, so the score is
    bit-identical to the SQL twin. ``greatest(…, 0)`` absorbs the
    cancellation ulp when all trailing values are equal.

    Scale shape: one key-keyed exchange; the frame is ROWS-bounded so the
    window operator streams each key's sorted run with an O(window)
    buffer — no per-key whole-history sort buffer, no second shuffle. The
    per-row score is a map-side expression over the three window sums.

    ``order_cols`` must make the per-key order total (ties would make the
    frame contents engine-dependent).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("bigint")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean = s.cast("double") / n
    var = F.greatest(
        s2.cast("double") / n - mean * mean, F.lit(0.0)
    )
    z = (v.cast("double") - mean) / F.sqrt(var)
    return df.withColumn(
        out_col,
        F.when((n >= F.lit(int(min_periods))) & (var > 0), z),
    )


def sql_trailing_zscore(
    table: str,
    key_expr: str,
    order_by: str,
    value_expr: str,
    window: int = 24,
    min_periods: int = 8,
) -> str:
    """DuckDB twin of :func:`trailing_zscore` — CTE ending in
    ``__tz__(key, val, z)`` with the identical three-sum formula."""
    frame = f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING"
    over = f"OVER (PARTITION BY {key_expr} ORDER BY {order_by} {frame})"
    return f"""
__tzw__ AS (
  SELECT {key_expr} AS key, {value_expr} AS val,
         COUNT({value_expr}) {over} AS n,
         CAST(SUM({value_expr}) {over} AS BIGINT) AS s,
         CAST(SUM({value_expr} * {value_expr}) {over} AS BIGINT) AS s2,
         * FROM {table}),
__tz__ AS (
  SELECT *,
         CASE WHEN n >= {int(min_periods)}
                   AND greatest(CAST(s2 AS DOUBLE)/n
                                - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n), 0) > 0
              THEN (CAST(val AS DOUBLE) - CAST(s AS DOUBLE)/n)
                   / sqrt(greatest(CAST(s2 AS DOUBLE)/n
                                   - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n), 0))
         END AS z
  FROM __tzw__)
"""


def sql_winsorize_ctes(
    table: str, group_expr: str, value_expr: str, lower: float = 0.01, upper: float = 0.99
) -> str:
    """DuckDB twin of :func:`winsorize` — CTE chain ending in
    ``__wins__(grp, val, winsorized)``."""
    return f"""
__wvals__ AS (SELECT {group_expr} AS grp, {value_expr} AS val FROM {table}),
__wbnd__ AS (SELECT grp, quantile_cont(val, {float(lower)}) AS lo,
                    quantile_cont(val, {float(upper)}) AS hi
             FROM __wvals__ GROUP BY grp),
__wins__ AS (SELECT v.grp, val,
                    CASE WHEN val IS NULL THEN NULL
                         ELSE least(greatest(CAST(val AS DOUBLE), lo), hi)
                    END AS winsorized
             FROM __wvals__ v JOIN __wbnd__ USING (grp))
"""


def sql_mad_ctes(
    table: str, group_expr: str, value_expr: str, k: float = 3.0
) -> str:
    """DuckDB twin of :func:`mad_outliers` as a CTE chain ending in a
    relation ``__mad__(grp, val, median, mad, is_outlier)``."""
    return f"""
__vals__ AS (SELECT {group_expr} AS grp, {value_expr} AS val FROM {table}),
__med__ AS (SELECT grp, quantile_cont(val, 0.5) AS median FROM __vals__ GROUP BY grp),
__dev__ AS (SELECT v.grp, val, median, abs(val - median) AS dev
            FROM __vals__ v JOIN __med__ USING (grp)),
__madv__ AS (SELECT grp, quantile_cont(dev, 0.5) AS mad FROM __dev__ GROUP BY grp),
__mad__ AS (SELECT d.grp, val, median, mad, dev > {float(k)} * mad AS is_outlier
            FROM __dev__ d JOIN __madv__ USING (grp))
"""


def trailing_corr(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    x_col: Column | str,
    y_col: Column | str,
    window: int = 24,
    min_periods: int = 8,
    out_col: str = "r",
) -> DataFrame:
    """Append ``out_col`` = the Pearson correlation of (x, y) over the
    key's TRAILING ``window`` rows (current row included) — the online
    co-movement monitor ("has this metric decoupled from that one?") that
    :func:`group_corr`'s whole-group statistic can't give per point in
    time. NULL during warm-up (fewer than ``min_periods`` rows in frame)
    or when either variance is zero.

    Exactness: with integer-unit inputs all six trailing sufficient sums
    (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINT window sums; r derives in
    double from those with the one fixed formula — no accumulation-order
    skew, the :func:`trailing_zscore` argument. (BIGINT is safe here
    because the frame is ROWS-bounded: ``window`` terms of ~10⁶-unit
    products stay far under 2⁶³ — unlike group_corr's unbounded groups,
    which need decimal128.)

    Scale shape: one key-keyed exchange; all six sums ride the SAME
    ROWS-bounded frame (one window operator, O(window) streaming buffer);
    the per-row r is a map-side expression.

    Rows where either input is NULL emit r NULL and contribute nothing to
    the sums, but still occupy frame slots — the ROWS-frame convention
    shared with :func:`trailing_zscore`.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("bigint")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    both = x.isNotNull() & y.isNotNull()
    xv = F.when(both, x)
    yv = F.when(both, y)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    n = F.count(xv).over(w)
    sx = F.sum(xv).over(w)
    sy = F.sum(yv).over(w)
    sxy = F.sum(xv * yv).over(w)
    sxx = F.sum(xv * xv).over(w)
    syy = F.sum(yv * yv).over(w)
    nd = n.cast("double")
    cov = nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")
    vx = nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    vy = nd * syy.cast("double") - sy.cast("double") * sy.cast("double")
    r = cov / F.sqrt(vx * vy)
    return df.withColumn(
        out_col,
        F.when(both & (n >= F.lit(int(min_periods))) & (vx > 0) & (vy > 0), r),
    )


def sql_trailing_corr(
    table: str,
    key_expr: str,
    order_by: str,
    x_expr: str,
    y_expr: str,
    window: int = 24,
    min_periods: int = 8,
) -> str:
    """DuckDB twin of :func:`trailing_corr` — CTE ending in
    ``__tc__(key, xv, yv, r)`` with the identical six-sum formula."""
    frame = f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY {key_expr} ORDER BY {order_by} {frame})"
    x = f"(CASE WHEN ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL THEN {x_expr} END)"
    y = f"(CASE WHEN ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL THEN {y_expr} END)"
    return f"""
__tcw__ AS (
  SELECT {key_expr} AS key, {x_expr} AS xv, {y_expr} AS yv,
         COUNT({x}) {over} AS n,
         CAST(SUM({x}) {over} AS BIGINT) AS sx,
         CAST(SUM({y}) {over} AS BIGINT) AS sy,
         CAST(SUM({x} * {y}) {over} AS BIGINT) AS sxy,
         CAST(SUM({x} * {x}) {over} AS BIGINT) AS sxx,
         CAST(SUM({y} * {y}) {over} AS BIGINT) AS syy,
         * FROM {table}),
__tc__ AS (
  SELECT *,
         CASE WHEN xv IS NOT NULL AND yv IS NOT NULL
                   AND n >= {min_periods}
                   AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
              THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                          * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
              END AS r
  FROM __tcw__)
"""


def trailing_ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: Column | str,
    alpha: float = 0.5,
    lags: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col`` = the exponentially-weighted trailing mean of the
    key's last ``lags`` values (current row included, weight ``(1−α)^j`` at
    lag j, renormalized over the slots that actually exist) — the smoothing
    twin of :func:`trailing_zscore`'s uniform frame: recent points dominate,
    warm-up rows average over the shorter available history instead of
    emitting NULL, and a NULL value contributes neither weight nor mass.

    Truncating the classically-infinite EWMA recursion at ``lags`` terms is
    what makes the operator BOTH scale-safe and engine-exact: the windowed
    form needs only an O(lags) ROWS buffer per key (the untruncated
    recursion is a sequential scan with no partial aggregation), and the
    remaining mass below the cut is (1−α)^lags — pick lags so that's noise.

    Exactness: with α a binary fraction (0.5, 0.25, …) and integer-unit
    values, every term ``x·(1−α)^j`` is a dyadic rational of bounded bits,
    so the lag-chain numerator/denominator sums are EXACT doubles (no
    accumulation rounding at all for |x| ≤ 2^40); the single final divide
    rounds once, identically on any IEEE-754 engine. The weight literals
    are emitted as exact decimal strings (binary fractions have finite
    decimal expansions) so both engines parse the same double.

    Scale shape: ONE key-keyed exchange; all ``lags`` lag() expressions
    ride the SAME window spec, so Spark plans a single Window operator
    streaming each key's sorted run with an O(lags) row buffer. The
    blend is a map-side expression over the lag slots.

    ``order_cols`` must make the per-key order total.
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("double")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(lags):
        wt = F.lit((1.0 - alpha) ** j)
        xj = v if j == 0 else F.lag(v, j).over(w)
        num = num + F.coalesce(xj * wt, F.lit(0.0))
        den = den + F.when(xj.isNotNull(), wt).otherwise(F.lit(0.0))
    return df.withColumn(
        out_col, F.when(den > 0, num / den)
    )


def weighted_percentile(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    weight_col: Column | str,
    p_num: int = 1,
    p_den: int = 2,
    out_col: str = "wpct",
) -> DataFrame:
    """Exact weighted lower-percentile per group: the smallest value v such
    that the total weight of rows with value ≤ v reaches ``p_num/p_den`` of
    the group's weight — weighted median at 1/2. The statistic a WEIGHTED
    corpus needs where plain percentiles mislead ("the discount level at
    which half the quantity ships"; the quality score below which half the
    token mass sits). NULL values/weights contribute nothing.

    Exact and engine-portable by construction: the threshold test is pure
    integer arithmetic (``p_den·cum ≥ p_num·tot`` — no doubles anywhere),
    and the cumulative weight uses the ties-INCLUSIVE default RANGE frame
    (ORDER BY value ⇒ RANGE UNBOUNDED PRECEDING..CURRENT ROW on both
    engines), so every row of a tied value block sees the block-end
    cumulative and the answer is independent of intra-tie row order.

    Scale shape: ONE group-keyed exchange — both window functions (running
    and total weight) ride the same partition, and the final min-aggregate
    groups on the partitioning key, so Catalyst plans no second shuffle.
    Weights/values must be integers (cast upstream: cents, token counts).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast("bigint")
    wt = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "bigint"
    )
    base = df.select(*group_cols, v.alias("__v__"), wt.alias("__w__")).filter(
        F.col("__v__").isNotNull() & F.col("__w__").isNotNull()
    )
    cum = F.sum("__w__").over(
        Window.partitionBy(*group_cols).orderBy("__v__")
    )
    tot = F.sum("__w__").over(Window.partitionBy(*group_cols))
    return (
        base.withColumn("__cum__", cum)
        .withColumn("__tot__", tot)
        .filter(F.lit(int(p_den)) * F.col("__cum__") >= F.lit(int(p_num)) * F.col("__tot__"))
        .groupBy(*group_cols)
        .agg(F.min("__v__").alias(out_col))
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str,
    window_rows: int = 7,
) -> DataFrame:
    """Trailing exact MEDIAN over the last ``window_rows`` rows per key —
    the robust twin of a trailing mean (one spike can drag a mean
    arbitrarily; the trailing median shrugs it off until spikes are half
    the window). Appends ``roll_med`` to every input row.

    Exactness: the window's values are collected, sorted, and the middle
    element(s) indexed — integer inputs (cents) make the even-window
    midpoint ``(a+b)/2`` an exact binary fraction, so the result is
    bit-identical across engines (the :func:`mad_outliers` argument).
    ``(order_col, tiebreak_col)`` must be unique per key so the frame
    content is deterministic.

    Scale shape: ONE key-keyed exchange; the sort is per-key inside the
    window operator. The collected frame is ``window_rows`` elements —
    O(k log k) per row with k fixed and small; this is the
    collect-sort-index formulation Spark's own percentile_approx avoids
    only for UNBOUNDED frames, where a sketch is the right trade. For
    bounded trailing frames the exact sort is both cheaper and exact.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col, tiebreak_col)
        .rowsBetween(-(int(window_rows) - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col).cast("bigint")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    return df.withColumn(
        "roll_med", ((lo + hi) / F.lit(2.0)).cast("double")
    )


def percentiles_from_counts(
    hist: DataFrame,
    group_cols: list[str],
    value_col: str = "v",
    cnt_col: str = "n",
    ps: list[float] | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group from a ``(value, count)``
    histogram — Spark ``percentile`` / DuckDB ``quantile_cont`` semantics
    (``pos = p·(n−1)``, linear interpolation between the two bracketing
    order statistics) RECONSTRUCTED from pre-aggregated counts instead of
    raw rows. Two callers need this shape: a single monster group whose
    raw sort would land on one reducer (pre-aggregate to the histogram —
    its size is the value domain, not the row count), and a STREAMING
    monitor whose state is the histogram (counts are a linear sketch —
    fold each epoch's counts by value SUM and the reconstruction equals
    the batch percentile over all rows exactly; the ``streaming_percentile``
    gate pins this against the batch oracle verbatim).

    Output: one row per group with ``p_<i>`` double columns in ``ps``
    order (callers alias/round). Exactness: the bracketing values are the
    SAME doubles the raw-row formulation sees and the interpolation uses
    Spark's exact form ``lower·(1−d) + higher·d`` (NOT the algebraically
    equal ``lower + d·(higher−lower)``, which differs in the last ulp —
    a hypothesis-found counterexample: values [0×7, −3] at p=0.1), so the
    reconstruction is bit-identical, not approximately equal. NULL values
    must be filtered upstream (a histogram has no NULL bucket).

    Scale shape: ONE group-keyed exchange — the cumulative count rides a
    ties-safe ordered window over the histogram (histogram rows are
    unique per value, so ROWS==RANGE here), the group total is a
    whole-partition window on the same key, and the bracketing lookup is
    |ps| conditional aggregates in one final groupBy on the partitioning
    key (no second shuffle). Per-group cost is O(distinct values), never
    O(rows).
    """
    ps = ps if ps is not None else [0.5]
    v = F.col(value_col).cast("bigint")
    cnt = F.col(cnt_col).cast("bigint")
    base = hist.select(*group_cols, v.alias("__v__"), cnt.alias("__c__"))
    wcum = Window.partitionBy(*group_cols).orderBy("__v__")
    wall = Window.partitionBy(*group_cols)
    rows = (
        base.withColumn("__cum__", F.sum("__c__").over(wcum))
        .withColumn("__n__", F.sum("__c__").over(wall))
        .withColumn("__lo__", F.col("__cum__") - F.col("__c__"))
    )
    aggs = []
    for i, p in enumerate(ps):
        # pos in double exactly as the raw formulation computes it
        pos = F.lit(float(p)) * (F.col("__n__") - 1).cast("double")
        fl = F.floor(pos).cast("bigint")
        ce = F.ceil(pos).cast("bigint")
        in_fl = (F.col("__lo__") <= fl) & (fl < F.col("__cum__"))
        in_ce = (F.col("__lo__") <= ce) & (ce < F.col("__cum__"))
        lower = F.min(F.when(in_fl, F.col("__v__").cast("double")))
        higher = F.min(F.when(in_ce, F.col("__v__").cast("double")))
        frac = F.min(F.when(in_fl, pos - fl.cast("double")))
        aggs.append(
            (lower * (F.lit(1.0) - frac) + higher * frac).alias(f"p_{i}")
        )
    return rows.groupBy(*group_cols).agg(*aggs)
