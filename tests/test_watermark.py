"""Event-time semantics under late data: watermark drops too-late rows in
append mode; session windows merge overlapping activity (beyond-reference
surface — the reference has no event time at all, SURVEY §2.8)."""

import os

from pyspark.sql import functions as F


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Append-mode windowed count: a window only emits once the watermark
    passes it, and rows older than the watermark are dropped."""
    indir = tmp_path / "in"
    os.makedirs(indir)
    schema = "ts timestamp, k string"

    def batch(rows, name):
        df = spark.createDataFrame(rows, "ts string, k string").select(
            F.to_timestamp("ts").alias("ts"), "k"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(indir / name))

    # batch 1: two rows in the 10:00 window, one at 10:25 (advances watermark
    # past 10:00+5min once processed)
    batch(
        [
            ("2024-01-01 10:01:00", "a"),
            ("2024-01-01 10:03:00", "a"),
            ("2024-01-01 10:25:00", "a"),
        ],
        "b1",
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(f"{indir}/*")
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes"), "k")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_wc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a VERY late row for the already-closed 10:00 window — must
        # be dropped, not re-emitted
        batch([("2024-01-01 10:04:00", "a"), ("2024-01-01 10:26:00", "a")], "b2")
        q.processAllAvailable()
        rows = spark.sql("select window.start as s, k, n from late_wc").collect()
    finally:
        q.stop()

    emitted = {(str(r.s), r.k): r.n for r in rows}
    # the 10:00 window emitted with the on-time count only (2, not 3)
    assert emitted.get(("2024-01-01 10:00:00", "a")) == 2


def test_session_window_batch_merges_activity(spark):
    """session_window gap-merge: rows within 10min of each other coalesce."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 09:00:00", "u1"),
            ("2024-01-01 09:05:00", "u1"),  # same session (gap 5m)
            ("2024-01-01 10:00:00", "u1"),  # new session
            ("2024-01-01 09:00:00", "u2"),
        ],
        "ts string, user string",
    ).select(F.to_timestamp("ts").alias("ts"), "user")
    out = (
        df.groupBy(F.session_window("ts", "10 minutes"), "user")
        .agg(F.count("*").alias("n"))
        .select("user", "n")
        .collect()
    )
    got = sorted((r.user, r.n) for r in out)
    assert got == [("u1", 1), ("u1", 2), ("u2", 1)]
