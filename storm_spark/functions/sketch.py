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
