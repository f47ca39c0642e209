"""Z-order layout key (functions/layout.py)."""

from pyspark.sql import functions as F


def test_zorder_bit_interleave_exact(spark):
    """Hand-computed Morton codes: x bits at even positions, y at odd.
    (x=0b11, y=0b01) -> z = 0b0111 = 7; (x=0b10, y=0b11) -> 0b1110 = 14."""
    from storm_spark.functions.layout import zorder_key

    df = spark.createDataFrame([(3, 1), (2, 3), (0, 0)], "x long, y long")
    got = [
        r.z for r in df.select(zorder_key("x", "y", bits=4).alias("z")).collect()
    ]
    assert got == [7, 14, 0], got


def test_zorder_prefix_bounds_both_dims(spark):
    """The property the key exists for: rows sharing a Z-prefix bucket
    have SMALL ranges in BOTH dimensions — against a full 2^8 x 2^8 grid,
    every 16-bucket bounding box must span at most a quarter of each
    dimension (a one-column sort would leave y spanning the full range)."""
    from storm_spark.functions.layout import zorder_stats

    rows = [(x, y) for x in range(0, 256, 8) for y in range(0, 256, 8)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_stats(df, "x", "y", bits=8, prefix_bits=4).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.max_x - r.min_x <= 64, r
        assert r.max_y - r.min_y <= 64, r
