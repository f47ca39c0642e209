"""Data-layout keys — Z-order (Morton) interleaving for multi-dimensional
clustering.

At 100 TB the cheapest query is the one that never reads the file: writers
sort (or range-partition) on a Z-order key over the columns queries filter
by, so each parquet file's min/max footer stats form a TIGHT bounding box
in EVERY interleaved dimension at once — a two-column predicate then
prunes files the way a one-column sort only could for its single leading
column. The key itself is pure bit arithmetic (engine-portable, exactly
oracled); the demo statistic (:func:`zorder_stats`) measures the property
that matters — per-Z-prefix-bucket bounding boxes — with fixed integer
bucket arithmetic, no global sort.

Reference parity: the reference has no storage layer at all (tuples flow
through workers); layout keys are part of the beyond-reference 100-TB
surface, alongside the bucketed-join and partition-pruning gates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 21) -> Column:
    """Morton/Z-order interleave of two non-negative integer columns:
    bit ``i`` of ``x`` lands at position ``2i``, bit ``i`` of ``y`` at
    ``2i+1`` — so truncating the key to any prefix length bounds BOTH
    inputs simultaneously. ``bits`` per dimension (default 21 → a 42-bit
    key, safely BIGINT). Inputs must already be quantized to
    ``[0, 2^bits)``; values beyond that range would silently alias, so
    clamp or bucket first."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    terms = []
    for i in range(int(bits)):
        terms.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def sql_zorder_key(x_expr: str, y_expr: str, bits: int = 21) -> str:
    """DuckDB twin of :func:`zorder_key` (scalar expression)."""
    terms = []
    for i in range(int(bits)):
        terms.append(f"(((CAST({x_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_stats(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    bits: int = 21,
    prefix_bits: int = 5,
) -> DataFrame:
    """The file-skipping property, measured: bucket rows by the TOP
    ``prefix_bits`` of their Z-key (fixed integer division — 2^prefix_bits
    buckets, no global sort, one map-side-combined agg) and report each
    bucket's bounding box ``(zbucket, n, min_x, max_x, min_y, max_y)``.
    A writer that splits files on these buckets gives every file a tight
    min/max footer in BOTH dimensions — exactly what a reader's two-sided
    predicate prunes on. Compare the boxes against a one-column sort's
    (tight in x, full-range in y) to see what Z-ordering buys."""
    xc = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("bigint")
    yc = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    z = zorder_key(xc, yc, bits)
    bucket = F.shiftright(z, 2 * int(bits) - int(prefix_bits))
    return (
        df.select(
            bucket.alias("zbucket"), xc.alias("__x__"), yc.alias("__y__")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__x__").alias("min_x"),
            F.max("__x__").alias("max_x"),
            F.min("__y__").alias("min_y"),
            F.max("__y__").alias("max_y"),
        )
    )


def sql_zorder_stats(
    table: str,
    x_expr: str,
    y_expr: str,
    bits: int = 21,
    prefix_bits: int = 5,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`zorder_stats` — full SELECT."""
    z = sql_zorder_key("x", "y", bits)
    return f"""
SELECT ({z} >> {2 * int(bits) - int(prefix_bits)}) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM (SELECT CAST({x_expr} AS BIGINT) AS x, CAST({y_expr} AS BIGINT) AS y
      FROM {table} WHERE {where})
GROUP BY 1
"""
