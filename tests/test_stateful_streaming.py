"""In-stream per-key state via applyInPandasWithState: cumulative counts
across micro-batches, checkpoint-backed."""

import os

import pytest
from pyspark.sql import functions as F

from storm_spark.streaming.stateful import running_word_counts


def test_running_word_counts_across_batches(spark, tmp_path):
    indir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    os.makedirs(indir)

    schema = "word string"
    b1 = spark.createDataFrame([("the",), ("cow",), ("the",)], schema)
    b2 = spark.createDataFrame([("the",), ("man",)], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = running_word_counts(stream, "word")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_wc")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        after_b1 = {
            r.word: r["count"] for r in spark.sql("select * from running_wc").collect()
        }
        assert after_b1 == {"the": 2, "cow": 1}

        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from running_wc").collect()
    finally:
        q.stop()

    # update-mode memory sink appends each epoch's emissions; counts are
    # monotone, so the max per key is the final running value
    latest = {}
    for r in rows:
        latest[r.word] = max(latest.get(r.word, 0), r["count"])
    assert latest == {"the": 3, "cow": 1, "man": 1}


def test_stateful_sessionize_closes_on_watermark(spark, tmp_path):
    """A session emits once the event-time watermark passes its end + gap."""
    from storm_spark.streaming.stateful import stateful_sessionize

    indir = tmp_path / "sin"
    os.makedirs(indir)

    def batch(rows, name):
        df = spark.createDataFrame(rows, "ts string, user string").select(
            F.to_timestamp("ts").alias("ts"), "user"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(indir / name))

    # batch 1: one session for u1 (2 events, 4 min apart)
    batch([("2024-01-01 10:00:00", "u1"), ("2024-01-01 10:04:00", "u1")], "b1")

    stream = (
        spark.readStream.schema("ts timestamp, user string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    ).withWatermark("ts", "1 minute")
    out = stateful_sessionize(stream, "user", "ts", gap_seconds=600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from sessions").count() == 0  # still open
        # batch 2: much later event advances the watermark past end+gap
        batch([("2024-01-01 11:00:00", "u1")], "b2")
        q.processAllAvailable()
        # one more batch so the timeout fires in a trigger after watermark moved
        batch([("2024-01-01 11:30:00", "u2")], "b3")
        q.processAllAvailable()
        rows = spark.sql("select * from sessions").collect()
    finally:
        q.stop()

    closed = [(r.user, r.n_events) for r in rows]
    assert ("u1", 2) in closed


def test_stateful_gap_fill_across_batches(spark, tmp_path):
    """Streaming forward-fill: batch 2's emissions must bridge the gap from
    batch 1's last bucket, carrying batch 1's value — and already-emitted
    buckets never re-emit."""
    from datetime import datetime

    from storm_spark.streaming.stateful import stateful_gap_fill

    indir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    os.makedirs(indir)
    T = datetime
    schema = "key string, ts timestamp, v double"
    b1 = spark.createDataFrame(
        [("g", T(2024, 1, 1, 0, 15), 5.0), ("g", T(2024, 1, 1, 2, 0), 7.0)], schema
    )
    b2 = spark.createDataFrame([("g", T(2024, 1, 1, 5, 30), 11.0)], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = stateful_gap_fill(stream, "key", "ts", "v", step_seconds=3600)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("gapfill_stream")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        h0 = int(T(2024, 1, 1, 0).timestamp())
        got1 = {
            r.bucket: (r.value, r.is_gap)
            for r in spark.sql("select * from gapfill_stream").collect()
        }
        # batch 1: hours 0 (5.0), 1 (gap -> 5.0), 2 (7.0)
        assert got1 == {
            h0: (5.0, False),
            h0 + 3600: (5.0, True),
            h0 + 7200: (7.0, False),
        }
        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from gapfill_stream").collect()
    finally:
        q.stop()
    got = {}
    for r in rows:
        got.setdefault(r.bucket, []).append((r.value, r.is_gap))
    # every bucket emitted exactly once across both epochs
    assert all(len(v) == 1 for v in got.values()), got
    # batch 2 bridged hours 3, 4 with batch 1's last value, then hour 5
    assert got[h0 + 10800] == [(7.0, True)]
    assert got[h0 + 14400] == [(7.0, True)]
    assert got[h0 + 18000] == [(11.0, False)]
    assert len(got) == 6


def test_stateful_transitions_bridges_batch_boundary(spark, tmp_path):
    """The transition from batch N's last event to batch N+1's first event
    must be counted — the one a per-batch lag() loses."""
    from datetime import datetime

    from storm_spark.streaming.stateful import stateful_transitions

    indir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    os.makedirs(indir)
    T = datetime
    schema = "key string, ts timestamp, t string"
    b1 = spark.createDataFrame(
        [("u1", T(2024, 1, 1, 0), "a"), ("u1", T(2024, 1, 1, 1), "b"),
         ("u2", T(2024, 1, 1, 0), "x")], schema
    )
    b2 = spark.createDataFrame(
        [("u1", T(2024, 1, 1, 2), "c"), ("u2", T(2024, 1, 1, 3), "x")], schema
    )
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = stateful_transitions(stream, "key", "ts", "t")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("trans_stream")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = [(r.from_type, r.to_type, r.n) for r in
                spark.sql("select * from trans_stream").collect()]
        assert sorted(got1) == [("a", "b", 1)]  # u2 has no transition yet
        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        rows = [(r.from_type, r.to_type, r.n) for r in
                spark.sql("select * from trans_stream").collect()]
    finally:
        q.stop()
    # epoch 2 deltas: u1's boundary b->c and u2's boundary x->x
    from collections import Counter

    total = Counter()
    for a, b, n in rows:
        total[(a, b)] += n
    assert total == {("a", "b"): 1, ("b", "c"): 1, ("x", "x"): 1}


def test_stateful_transitions_drops_late_events(spark, tmp_path):
    """An event older than the key's stored last event time is late: it is
    DROPPED, never folded in arrival order (which would emit a transition
    the batch twin — event-time ordered — does not have)."""
    from datetime import datetime

    from storm_spark.streaming.stateful import stateful_transitions

    indir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    os.makedirs(indir)
    T = datetime
    schema = "key string, ts timestamp, t string"
    b1 = spark.createDataFrame([("u1", T(2024, 1, 1, 10), "a")], schema)
    # 09:00 'b' is LATE (state holds 10:00); 11:00 'c' is on time
    b2 = spark.createDataFrame(
        [("u1", T(2024, 1, 1, 9), "b"), ("u1", T(2024, 1, 1, 11), "c")], schema
    )
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = stateful_transitions(stream, "key", "ts", "t")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("trans_late")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        rows = [(r.from_type, r.to_type, r.n) for r in
                spark.sql("select * from trans_late").collect()]
    finally:
        q.stop()
    from collections import Counter

    total = Counter()
    for a, b, n in rows:
        total[(a, b)] += n
    # only a->c; the late 'b' contributes nothing (NOT a->b or b->c)
    assert total == {("a", "c"): 1}


def test_stateful_trailing_zscore_matches_batch_twin(spark, tmp_path):
    """Scores must equal robust.trailing_zscore on the SAME data split
    across two micro-batches — the buffer carries the boundary (a
    per-batch window would restart its warm-up in batch 2)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from storm_spark.functions import robust
    from storm_spark.streaming.stateful import stateful_trailing_zscore

    T = datetime
    vals = [10, 20, 30, 100, 15, 25]
    all_rows = [("u1", T(2024, 1, 1, h), float(v)) for h, v in enumerate(vals)]
    schema = "key string, ts timestamp, v double"
    indir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    os.makedirs(indir)
    b1 = spark.createDataFrame(all_rows[:4], schema)
    b2 = spark.createDataFrame(all_rows[4:], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = stateful_trailing_zscore(stream, "key", "ts", "v", window=3, min_periods=2)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tz_stream")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        got = {
            r.ts.hour: r.z
            for r in spark.sql("select * from tz_stream").collect()
        }
    finally:
        q.stop()
    batch = spark.createDataFrame(all_rows, schema)
    expect = {
        r.ts.hour: r.z
        for r in robust.trailing_zscore(
            batch, "key", ["ts"], "v", window=3, min_periods=2
        ).collect()
    }
    assert set(got) == set(expect)
    for h in expect:
        if expect[h] is None:
            assert got[h] is None, h
        else:
            assert got[h] == pytest.approx(expect[h]), h


def test_stateful_gap_fill_null_values_match_batch_twin(spark, tmp_path):
    """A NULL value must not poison the bucket sum (batch F.sum skips
    NULLs), and a bucket whose rows are ALL null-valued still extends the
    grid but emits as a gap — exactly what the batch twin's per-bucket
    NULL sum does."""
    from datetime import datetime

    from storm_spark.functions import temporal
    from storm_spark.streaming.stateful import stateful_gap_fill

    T = datetime
    schema = "key string, ts timestamp, v double"
    rows = [
        ("g", T(2024, 1, 1, 0, 10), 5.0),
        ("g", T(2024, 1, 1, 0, 20), None),  # mixed bucket: sum skips NULL
        ("g", T(2024, 1, 1, 2, 0), None),   # all-NULL bucket: extends grid, gap
    ]
    indir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    os.makedirs(indir)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(indir / "b1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = stateful_gap_fill(stream, "key", "ts", "v", step_seconds=3600)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("gapfill_nulls")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.bucket: (r.value, r.is_gap)
            for r in spark.sql("select * from gapfill_nulls").collect()
        }
    finally:
        q.stop()
    batch = temporal.gap_fill(
        spark.createDataFrame(rows, schema), "key", "ts", "v", step_seconds=3600
    )
    expect = {r.bucket: (r.value_c, r.is_gap) for r in batch.collect()}
    assert got == expect
    h0 = int(T(2024, 1, 1, 0).timestamp())
    assert got == {
        h0: (5.0, False),          # NULL skipped, not NaN-poisoned
        h0 + 3600: (5.0, True),
        h0 + 7200: (5.0, True),    # all-NULL bucket: present in grid, gap
    }


def test_stateful_trailing_zscore_null_values_match_batch_twin(spark, tmp_path):
    """A NULL value occupies a ROWS-frame slot (shrinking effective n via
    COUNT) and emits its own z-NULL row in the batch twin; the streaming
    buffer must do the same instead of silently dropping the row."""
    from datetime import datetime

    from storm_spark.functions import robust
    from storm_spark.streaming.stateful import stateful_trailing_zscore

    T = datetime
    vals = [10.0, 20.0, None, 30.0, 100.0, None, 15.0, 25.0]
    all_rows = [("u1", T(2024, 1, 1, h), v) for h, v in enumerate(vals)]
    schema = "key string, ts timestamp, v double"
    indir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    os.makedirs(indir)
    b1 = spark.createDataFrame(all_rows[:5], schema)
    b2 = spark.createDataFrame(all_rows[5:], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = stateful_trailing_zscore(stream, "key", "ts", "v", window=3, min_periods=2)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tz_nulls")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        got = {
            r.ts.hour: r.z for r in spark.sql("select * from tz_nulls").collect()
        }
    finally:
        q.stop()
    batch = spark.createDataFrame(all_rows, schema)
    expect = {
        r.ts.hour: r.z
        for r in robust.trailing_zscore(
            batch, "key", ["ts"], "v", window=3, min_periods=2
        ).collect()
    }
    # every input row — NULL-valued included — has an output row
    assert set(got) == set(expect) == set(range(len(vals)))
    for h in expect:
        if expect[h] is None:
            assert got[h] is None, h
        else:
            assert got[h] == pytest.approx(expect[h]), h


def test_stateful_merge_intervals_long_interval_swallows(spark):
    """Streaming twin of the merge_intervals swallow case: [0,100] must
    hold the span open across [10,20] and [30,40] (running MAX(end), not
    lag), touching [100,110] extends, a strict gap [150,160] opens a new
    span, and the final span closes only on watermark timeout."""
    import os
    import tempfile
    import uuid
    from datetime import datetime, timedelta

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from storm_spark.streaming.stateful import stateful_merge_intervals

    T0 = datetime(2024, 1, 1)
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("s_ts", TimestampType()),
            StructField("e_ts", TimestampType()),
        ]
    )

    def iv(k, s, e):
        return (k, T0 + timedelta(seconds=s), T0 + timedelta(seconds=e))

    tmp = tempfile.mkdtemp(prefix="smi_test_")
    indir = os.path.join(tmp, "in")
    os.makedirs(indir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    ).withWatermark("s_ts", "1 second")
    out = stateful_merge_intervals(stream, "k", "s_ts", "e_ts")
    qname = "smit_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    # event-time-ordered feed (the twins' contract): key 2's early
    # interval must ride batch 1 — in a later batch the watermark
    # (advanced past batch 2's s=100) would drop it as late data
    batches = [
        [iv(1, 0, 100), iv(1, 10, 20), iv(2, 5, 6)],
        [iv(1, 30, 40), iv(1, 100, 110)],   # swallow + touch, cross-batch
        [iv(1, 150, 160)],                  # strict gap closes span 1
        [iv(-9, 86400, 86400)],             # sentinel watermark advances
        [iv(-9, 172800, 172800)],
    ]
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(indir, f"b{i}"))
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.k, int(r.span_start), int(r.span_end), r.n_intervals)
        for r in spark.table(qname).filter("k >= 0").collect()
    }
    t0 = T0.timestamp()
    expect = {
        (1, int(t0 + 0), int(t0 + 110), 4),
        (1, int(t0 + 150), int(t0 + 160), 1),
        (2, int(t0 + 5), int(t0 + 6), 1),
    }
    assert got == expect, got
