"""Column profiling — the ``ANALYZE TABLE``-style summary an ingestion
pipeline runs on an unfamiliar table before trusting it: per column, the
null count, exact distinct count, and min/max rendered as strings.

Scale shape: ONE scan. All measures for all columns compute in a single
``agg`` (Catalyst plans the multi-column distinct aggregates via Expand —
one pass over the data fanned |cols|+1 ways, shuffled on the grouping
expand id), and the wide 1-row result is unpivoted driver-side into the
(column, stats) long format — |cols| rows, constant size, the one place a
driver-side reshape is correct by construction. At 100 TB swap the exact
``count_distinct`` for ``approx_count_distinct`` (HLL — no Expand blowup,
one pass, ~2% error); the exact variant is kept here because the gate
oracle hash-compares values.

Determinism: min/max stringification is exact for integer and string
columns (both engines render BIGINT and VARCHAR identically). Float
columns are the caller's responsibility — scale to integer units first
(the integer-cents rule) or exclude them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: ``(column, n_nulls, n_distinct, min_val,
    max_val)`` — ``n_distinct`` excludes NULLs; min/max are cast to string
    after the typed aggregate (so numeric ordering, not lexicographic)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n__")]  # total rows: ONE shared measure
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n__ - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_nulls, n_distinct, min_val, max_val)"
    )


def sql_profile(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`profile_columns` (UNION ALL per column)."""
    parts = [
        f"SELECT '{c}' AS \"column\", "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_val, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_val FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col,
    lo: int,
    hi: int,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-stability-index drift report between two snapshots of a
    numeric column — the standard "did the feature distribution move since
    the last training run" monitor (PSI < 0.1 stable, 0.1-0.25 moderate,
    > 0.25 action; banking scorecard convention). Returns one row per bin:
    ``(bin, n_old, n_new, p_old, p_new, psi_term)`` — total PSI = SUM of
    the terms; the per-bin breakdown is the diagnostic (which region of
    the distribution moved), which a single scalar hides.

    Binning is FIXED equal-width over ``[lo, hi)`` in pure integer
    arithmetic (``(v − lo)·n_bins div (hi − lo)``, clamped to the edge
    bins) — engine-portable with zero float bucketing skew, and stable
    across runs (quantile bins would move with the data, silently
    re-defining the comparison). Pass integer units (cents). Empty-bin
    proportions floor at ``eps`` before the log (the standard PSI
    regularization — a bin appearing from nothing is a large finite term,
    not ±inf).

    Scale shape: each side collapses with ONE map-side-combined
    (bin)-keyed agg (n_bins cells); the join + PSI expression run on
    n_bins rows. Nothing else moves. At 100 TB this is two scans and two
    tiny shuffles, embarrassingly parallel.

    Determinism: counts and proportions are exact (BIGINT / double of
    BIGINTs); ``ln`` evaluates on identical doubles both engines —
    psi_term rounds to 6, far above any libm last-ulp wiggle.
    """
    if not (isinstance(lo, int) and isinstance(hi, int) and hi > lo):
        raise ValueError(f"need integer lo < hi, got ({lo}, {hi})")

    def _bins(df):
        v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
            "bigint"
        )
        clamped = F.least(F.greatest(v, F.lit(int(lo))), F.lit(int(hi) - 1))
        # exact BIGINT floor-div (operands non-negative after the clamp) —
        # no double division anywhere in the bucketing
        num = (clamped - F.lit(int(lo))) * F.lit(int(n_bins))
        return (
            df.where(v.isNotNull())
            .select(num.alias("__num__"))
            .select(F.expr(f"__num__ div {int(hi) - int(lo)}").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    o = _bins(old).select(F.col("bin"), F.col("n").alias("n_old"))
    n = _bins(new).select(F.col("bin"), F.col("n").alias("n_new"))
    # all n_bins rows must exist even when one side has an empty bin
    spark = old.sparkSession
    grid = spark.range(n_bins).select(F.col("id").alias("bin"))
    j = (
        grid.join(o, "bin", "left")
        .join(n, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    # totals floor at 1: an EMPTY snapshot must yield p = eps everywhere
    # (finite terms), not 0/0 — which Spark nulls but DuckDB (IEEE ops)
    # turns into NaN, so an unguarded division would also split the twins
    tot = j.agg(
        F.greatest(F.sum("n_old"), F.lit(1)).cast("double").alias("__to__"),
        F.greatest(F.sum("n_new"), F.lit(1)).cast("double").alias("__tn__"),
    )
    p_old = F.greatest(F.col("n_old") / F.col("__to__"), F.lit(float(eps)))
    p_new = F.greatest(F.col("n_new") / F.col("__tn__"), F.lit(float(eps)))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_old",
            "n_new",
            F.round(p_old, 6).alias("p_old"),
            F.round(p_new, 6).alias("p_new"),
            F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias("psi_term"),
        )
    )
