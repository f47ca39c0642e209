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
