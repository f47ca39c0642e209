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
