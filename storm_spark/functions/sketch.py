"""Count-min sketch — sublinear heavy-hitter / frequency estimation.

The sketch is a ``depth × width`` counter table: row ``d`` buckets each key
by an independent hash; a key's estimate is the MIN of its ``depth`` bucket
counters (over-count only, never under). Cormode & Muthukrishnan 2005.

Scale: building is one groupBy over (depth × |input|) exploded rows — a
shuffle of pre-combined partials whose output is at most ``depth × width``
rows regardless of input size. That fixed size is the point: frequency
estimates for 100 TB of keys live in a table that fits in one broadcast.
Hashes are md5-derived (engine-portable, exactly reproducible in SQL), so
the sketch and its estimates have exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket of a key: md5("d:key") prefix mod width."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}:"), col.cast("string"))), 1, 15), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(width))


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) rows, at most depth × width of them."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), _bucket(F.col(col), d, width).alias("bucket"))
                    for d in range(depth)
                ]
            )
        ).alias("__d__")
    )
    return (
        rows.select(F.col("__d__.d").alias("d"), F.col("__d__.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # stamp the parameters: estimates against a sketch built with
        # different depth/width are silently garbage, so cms_estimate reads
        # them from here instead of trusting caller-supplied defaults
        .withColumn("__depth__", F.lit(depth))
        .withColumn("__width__", F.lit(width))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    depth: int | None = None, width: int | None = None,
) -> DataFrame:
    """Estimate each key's frequency: min over its depth bucket counters.
    The (tiny, fixed-size) sketch is broadcast; missing buckets count 0.

    ``depth``/``width`` default to the parameters STAMPED on the sketch by
    :func:`cms_build` — mismatched probe parameters would compute buckets
    mod the wrong width and collapse every estimate toward 0, violating the
    one-sided-error guarantee with no error raised.

    Returns (key_col, est) — est >= true count always (one-sided error
    ≤ e/width · N with probability 1 - e^-depth).
    """
    if depth is None or width is None:
        if "__depth__" not in sketch.columns:
            raise ValueError(
                "sketch carries no stamped parameters; pass depth= and width= "
                "matching the build"
            )
        meta = sketch.select("__depth__", "__width__").first()
        depth = depth if depth is not None else meta[0]
        width = width if width is not None else meta[1]
    sketch = sketch.select("d", "bucket", "cnt")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), _bucket(F.col(key_col), d, width).alias("bucket"))
                    for d in range(depth)
                ]
            )
        ).alias("__p__"),
    ).select(key_col, F.col("__p__.d").alias("d"), F.col("__p__.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), on=["d", "bucket"], how="left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(key_col).agg(F.min("cnt").cast("bigint").alias("est"))


# HyperLogLog with an EXACT cross-engine oracle ------------------------------

#: bias-correction constant for m = 512 registers (Flajolet et al. 2007,
#: alpha_m = 0.7213/(1 + 1.079/m)) — embedded as the same double literal in
#: the Spark expression and the SQL twin so the estimator is bit-identical
HLL_P = 9
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: bits of hash consumed by the rho scan (15 hex chars = 60 bits)
_HLL_WBITS = 60


def _hll_reg(key: Column) -> Column:
    """Register index: 60-bit md5 prefix of the 'r:'-salted key, mod m."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("r:"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(HLL_M))


def _hll_rho(key: Column) -> Column:
    """rho = 1 + number of leading zero BITS of the 60-bit 'w:'-salted
    hash — computed from the HEX STRING with integer/string ops only
    (leading-'0' run length × 4, plus the first non-zero nibble's
    0-3 internal leading zeros), so both engines agree exactly; an
    all-zero hash caps at 61."""
    hx = F.substring(F.md5(F.concat(F.lit("w:"), key.cast("string"))), 1, 15)
    z = F.length(F.regexp_extract(hx, "^(0*)", 1))
    c = F.substring(hx, z + 1, 1)
    extra = (
        F.when(c == "1", 3)
        .when(c.isin("2", "3"), 2)
        .when(c.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (F.lit(4) * z + extra + F.lit(1)).cast("int")


def hll_registers(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Per-group HLL register table ``(group, reg, rho)`` — rho = the max
    first-one position over the group's keys that hash into the register.
    At most m = 512 rows per group regardless of input size; registers
    merge across partitions/epochs by MAX (HLL is a max-linear sketch, so
    a streaming per-epoch merge is bit-identical to the batch build — the
    CMS-gate argument with max instead of sum)."""
    k = F.col(key_col)
    return (
        df.where(k.isNotNull())
        .select(
            F.col(group_col),
            _hll_reg(k).alias("reg"),
            _hll_rho(k).alias("rho"),
        )
        .groupBy(group_col, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_distinct(
    df: DataFrame, group_col: str, key_col: str, ndigits: int = 4
) -> DataFrame:
    """HyperLogLog distinct-count estimate with an EXACT oracle — what the
    builtin ``approx_count_distinct`` gate can't have (its HLL++ registers
    are engine-internal): every piece here is engine-portable by
    construction. The register harmonic sum Σ 2^−M_j is evaluated as the
    EXACT integer Σ 2^(61−M_j) in DECIMAL(38,0) (dyadic terms — no
    float-accumulation order anywhere), unseen registers contribute
    2^61 each, and the single double division + the standard small-range
    linear-counting branch (raw ≤ 2.5m and zeros > 0 → m·ln(m/zeros))
    happen once per group on exact integers. Returns
    ``(group, est, n_zero_regs)``, est rounded to ``ndigits``.

    Scale shape: ONE (group, reg)-keyed partial agg (map-side max-combine
    collapses raw rows to ≤ m per group per partition before the wire),
    then a group-keyed agg of ≤ m rows. Standard error ≈ 1.04/√m ≈ 4.6%
    at m = 512.
    """
    return hll_estimate(hll_registers(df, group_col, key_col), group_col, ndigits)


def hll_estimate(
    regs: DataFrame, group_col: str, ndigits: int = 4
) -> DataFrame:
    """Estimator over a ``(group, reg, rho)`` register table (built by
    :func:`hll_registers`, possibly merged across partitions/epochs by
    MAX) — split out so the streaming merge gate and the batch operator
    share one estimator body. Returns ``(group, est, n_zero_regs)``."""
    # DataFrame-API shiftleft only takes a literal shift — the SQL form
    # accepts an expression
    shift = F.expr("shiftleft(CAST(1 AS BIGINT), 61 - rho)")
    per_group = regs.groupBy(group_col).agg(
        F.sum(shift.cast("decimal(38,0)")).alias("__sobs__"),
        F.count(F.lit(1)).alias("__nobs__"),
    )
    zeros = (F.lit(HLL_M) - F.col("__nobs__")).cast("bigint")
    s_total = F.col("__sobs__") + zeros.cast("decimal(38,0)") * F.lit(
        1 << 61
    ).cast("decimal(38,0)")
    raw = (
        F.lit(float(HLL_ALPHA) * HLL_M * HLL_M)
        * F.lit(float(1 << 61))
        / s_total.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        F.col(group_col),
        F.round(est, ndigits).alias("est"),
        zeros.alias("n_zero_regs"),
    )


def sql_hll_distinct(
    table: str, group_expr: str, key_expr: str, ndigits: int = 4
) -> str:
    """DuckDB twin of :func:`hll_distinct` — full SELECT
    ``(group, est, n_zero_regs)``."""
    key_s = f"CAST({key_expr} AS VARCHAR)"
    reg = f"(('0x' || substr(md5('r:' || {key_s}), 1, 15))::BIGINT % {HLL_M})"
    hx = f"substr(md5('w:' || {key_s}), 1, 15)"
    return f"""
SELECT g AS {group_expr}, round(
         CASE WHEN raw <= {2.5 * HLL_M} AND zeros > 0
              THEN {float(HLL_M)} * ln({float(HLL_M)} / zeros)
              ELSE raw END, {ndigits}) AS est,
       CAST(zeros AS BIGINT) AS n_zero_regs
FROM (
  SELECT g, zeros,
         {float(HLL_ALPHA) * HLL_M * HLL_M!r} * {float(1 << 61)!r}
           / CAST(sobs + zeros * {1 << 61}::DECIMAL(38,0) AS DOUBLE) AS raw
  FROM (
    SELECT g,
           SUM((1::BIGINT << (61 - rho))::DECIMAL(38,0)) AS sobs,
           {HLL_M} - COUNT(*) AS zeros
    FROM (
      SELECT g, reg, MAX(rho) AS rho FROM (
        SELECT {group_expr} AS g, {reg} AS reg,
               4 * z + CASE substr(hx, z + 1, 1)
                         WHEN '1' THEN 3
                         WHEN '2' THEN 2 WHEN '3' THEN 2
                         WHEN '4' THEN 1 WHEN '5' THEN 1
                         WHEN '6' THEN 1 WHEN '7' THEN 1
                         ELSE 0 END + 1 AS rho
        FROM (
          SELECT {group_expr}, {key_expr},
                 {hx} AS hx,
                 length(regexp_extract({hx}, '^(0*)', 1)) AS z
          FROM {table} WHERE ({key_expr}) IS NOT NULL))
      GROUP BY g, reg)
    GROUP BY g))
"""
