"""Streaming daily-active: dedup->window chain, exactness, late-day drop."""
import os

from pyspark.sql import functions as F

from storm_spark.streaming.analytics import streaming_daily_active


def test_streaming_daily_active(spark, tmp_path):
    indir = tmp_path / "in"
    os.makedirs(indir)
    schema = "ts timestamp, user_id bigint"

    def batch(rows, name):
        df = spark.createDataFrame(rows, "ts string, user_id bigint").select(
            F.to_timestamp("ts").alias("ts"), "user_id"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(indir / name))

    # day 1: u1 twice (dedups), u2 once -> 2 actives
    batch(
        [
            ("2024-01-01 09:00:00", 1),
            ("2024-01-01 23:59:00", 1),
            ("2024-01-01 10:00:00", 2),
        ],
        "b1",
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(
        f"{indir}/*"
    )
    agg = streaming_daily_active(stream, "ts", "user_id", delay="1 day")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("daily_active")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # day 2: u1 again (new day -> counts again), u3; plus a day-1 dup of
        # u2 (still within horizon: dropped by dedup, not double-counted)
        batch(
            [
                ("2024-01-02 08:00:00", 1),
                ("2024-01-02 09:00:00", 3),
                ("2024-01-01 11:00:00", 2),
            ],
            "b2",
        )
        q.processAllAvailable()
        # day 4 advances the watermark past day 1+delay -> day-1 window
        # finalizes; a VERY late day-1 row must be dropped entirely
        batch(
            [
                ("2024-01-04 09:00:00", 9),
                ("2024-01-01 12:00:00", 7),
            ],
            "b3",
        )
        q.processAllAvailable()
        rows = spark.sql(
            "select window.start as s, n_active from daily_active"
        ).collect()
    finally:
        q.stop()

    got = {str(r.s): r.n_active for r in rows}
    # day-1 window emitted exactly (u1, u2) — the late u7 row was dropped
    assert got.get("2024-01-01 00:00:00") == 2, got


def test_stream_stream_join_within_bound(spark, tmp_path):
    """Cross-batch stream-stream join: pairs inside the time bound match
    (across micro-batches), pairs outside it never emit, and the join
    requires an explicit bound (unbounded state refused)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from storm_spark.streaming.analytics import stream_stream_join

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    os.makedirs(ldir), os.makedirs(rdir)
    schema = "ts timestamp, k string, v string"

    def write(d, rows, name):
        spark.createDataFrame(rows, "ts string, k string, v string").select(
            F.to_timestamp("ts").alias("ts"), "k", "v"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / name))

    # impressions (left) in batch 1; clicks (right) in a separate file so the
    # join must buffer across micro-batches
    write(ldir, [("2024-01-01 10:00:00", "a", "imp1"),
                 ("2024-01-01 11:00:00", "b", "imp2")], "b1")
    write(rdir, [("2024-01-01 10:04:00", "a", "clk1"),      # within 5 min -> match
                 ("2024-01-01 11:30:00", "b", "clk2")], "b1")  # 30 min -> no match

    lstream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(f"{ldir}/*")
    rstream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(f"{rdir}/*")

    with pytest.raises(ValueError, match="within is required"):
        stream_stream_join(lstream, rstream, "k", "ts", "ts")

    joined = stream_stream_join(
        lstream.select("ts", "k", F.col("v").alias("lv")),
        rstream.select(F.col("ts").alias("rts"), "k", F.col("v").alias("rv")),
        "k", "ts", "rts", watermark="1 minute", within="5 minutes",
    ).select("k", "lv", "rv")
    q = (
        joined.writeStream.outputMode("append").format("memory")
        .queryName("ssj").option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {(r.k, r.lv, r.rv) for r in spark.sql("select * from ssj").collect()}
    finally:
        q.stop()
    assert rows == {("a", "imp1", "clk1")}
