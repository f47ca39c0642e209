"""Unit coverage for streaming/joins.py interval_join (r6).

The catalog gate (q_streaming_interval_join) proves oracle equality on
the fixture; these pin the operator's edge semantics on a controlled
feed: inclusive interval endpoints, boundary-spanning pairs across
triggers, key isolation, and the column-collision suffix rule.
"""

import os
import tempfile
import uuid
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

T0 = datetime(2024, 1, 1)
SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
    ]
)


def _run(spark, left_batches, right_batches, lower=0, upper=600):
    from storm_spark.streaming.joins import interval_join

    tmp = tempfile.mkdtemp(prefix="sij_test_")
    ld, rd = os.path.join(tmp, "l"), os.path.join(tmp, "r")
    os.makedirs(ld)
    os.makedirs(rd)
    left = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{ld}/*")
    ).withWatermark("ts", "1 second")
    right = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{rd}/*")
    ).withWatermark("ts", "1 second")
    joined = interval_join(left, right, "user_id", "ts", lower, upper)
    qname = "sijt_" + uuid.uuid4().hex[:8]
    q = (
        joined.select("user_id", "event_id", "event_id_r")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    try:
        for i, (lb, rb) in enumerate(zip(left_batches, right_batches)):
            if lb:
                spark.createDataFrame(lb, SCHEMA).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(os.path.join(ld, f"b{i}"))
            if rb:
                spark.createDataFrame(rb, SCHEMA).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(os.path.join(rd, f"b{i}"))
            q.processAllAvailable()
    finally:
        q.stop()
    return {(r["event_id"], r["event_id_r"]) for r in spark.table(qname).collect()}


def _ev(user, seconds, eid):
    return (user, T0 + timedelta(seconds=seconds), eid)


def test_interval_endpoints_inclusive_and_key_isolated(spark):
    left = [[_ev(1, 100, 10), _ev(2, 100, 20)]]
    right = [
        [
            _ev(1, 100, 11),   # lower endpoint: ts diff 0 — IN
            _ev(1, 700, 12),   # upper endpoint: ts diff 600 — IN
            _ev(1, 99, 13),    # before left ts — OUT (lower=0)
            _ev(1, 701, 14),   # past upper — OUT
            _ev(2, 150, 21),   # other key — pairs only with left 20
        ]
    ]
    pairs = _run(spark, left, right)
    assert pairs == {(10, 11), (10, 12), (20, 21)}, pairs


def test_pairs_span_triggers_both_directions(spark):
    # left 10 arrives triggers BEFORE its matches (left buffers waiting
    # for right); right 11 arrives a trigger before its match left 15
    # (right buffers waiting for left) — the symmetric case a one-sided
    # lookup join would miss. Each SIDE's event times are non-decreasing
    # across triggers (the same time-ordered-source contract the catalog
    # gate documents): a cross-trigger event-time regression below the
    # min-of-both-sides watermark is legitimately droppable, and an
    # earlier version of this test was order-dependent for exactly that
    # reason.
    left = [[_ev(1, 100, 10)], [], [], [_ev(1, 400, 15)]]
    right = [[], [_ev(1, 250, 12)], [_ev(1, 450, 11)], []]
    pairs = _run(spark, left, right)
    # 10@100 window [100,700]: matches 12@250 and 11@450 (left buffered
    # across three triggers); 15@400 window [400,1000]: matches 11@450,
    # which arrived a trigger before it (right buffered)
    assert pairs == {(10, 11), (10, 12), (15, 11)}, pairs


def test_suffix_applied_only_on_collision(spark):
    from storm_spark.streaming.joins import interval_join

    left = spark.createDataFrame([_ev(1, 0, 1)], SCHEMA)
    right = spark.createDataFrame([_ev(1, 10, 2)], SCHEMA).withColumnRenamed(
        "event_id", "rid"
    )
    out = interval_join(left, right, "user_id", "ts", 0, 60)
    # colliding names suffixed, unique right name kept as-is
    assert "user_id_r" in out.columns and "ts_r" in out.columns, out.columns
    assert "rid" in out.columns, out.columns


def test_left_outer_flushes_unmatched_on_watermark(spark):
    """left_outer: matches emit when both sides are present; an unmatched
    left row emits with NULL right only after the watermark passes its
    join horizon (forced here by far-future sentinel feeds, the catalog
    gate's pattern). Before the sentinels the unmatched row must NOT
    have been emitted."""
    from storm_spark.streaming.joins import interval_join

    tmp = tempfile.mkdtemp(prefix="soj_test_")
    ld, rd = os.path.join(tmp, "l"), os.path.join(tmp, "r")
    os.makedirs(ld)
    os.makedirs(rd)
    left = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{ld}/*")
    ).withWatermark("ts", "1 second")
    right = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{rd}/*")
    ).withWatermark("ts", "1 second")
    joined = interval_join(
        left, right, "user_id", "ts", 0, 60, how="left_outer"
    )
    qname = "sojt_" + uuid.uuid4().hex[:8]
    q = (
        joined.select("user_id", "event_id", "event_id_r")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    try:
        # 10@0 matches 20@30; 11@100 never matches
        spark.createDataFrame(
            [_ev(1, 0, 10), _ev(1, 100, 11)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(ld, "b0"))
        spark.createDataFrame([_ev(1, 30, 20)], SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(rd, "b0"))
        q.processAllAvailable()
        before = {
            (r["event_id"], r["event_id_r"]) for r in spark.table(qname).collect()
        }
        assert before == {(10, 20)}, before  # no premature outer emission
        for s in (1, 2):
            sent = [(-1, T0 + timedelta(days=s), -s)]
            spark.createDataFrame(sent, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(ld, f"s{s}"))
            spark.createDataFrame(sent, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(rd, f"s{s}"))
            q.processAllAvailable()
    finally:
        q.stop()
    after = {
        (r["event_id"], r["event_id_r"])
        for r in spark.table(qname).filter("user_id >= 0").collect()
    }
    assert after == {(10, 20), (11, None)}, after


def test_full_outer_flushes_both_directions(spark):
    """full_outer's new direction vs left_outer: an unmatched RIGHT row
    must flush with a NULL left side once the watermark proves no left
    partner can arrive; unmatched left still flushes; matches still pair."""
    from storm_spark.streaming.joins import interval_join

    tmp = tempfile.mkdtemp(prefix="sfoj_test_")
    ld, rd = os.path.join(tmp, "l"), os.path.join(tmp, "r")
    os.makedirs(ld)
    os.makedirs(rd)
    left = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{ld}/*")
    ).withWatermark("ts", "1 second")
    right = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{rd}/*")
    ).withWatermark("ts", "1 second")
    joined = interval_join(
        left, right, "user_id", "ts", 0, 600, how="full_outer"
    )
    qname = "sfojt_" + uuid.uuid4().hex[:8]
    q = (
        joined.select("event_id", "event_id_r")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    try:
        # left 10 matches right 11; left 12 unmatched; right 13 unmatched
        spark.createDataFrame(
            [_ev(1, 100, 10), _ev(2, 100, 12)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(ld, "b0"))
        spark.createDataFrame(
            [_ev(1, 200, 11), _ev(3, 200, 13)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(rd, "b0"))
        q.processAllAvailable()
        for s in (1, 2):  # watermark past everything, then a flush batch
            sent = [(-9, T0 + timedelta(days=s), -s)]
            for d in (ld, rd):
                spark.createDataFrame(sent, SCHEMA).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(os.path.join(d, f"s{s}"))
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.table(qname).collect()
        if (r["event_id"] or 0) >= 0 and (r["event_id_r"] or 0) >= 0
    }
    assert got == {(10, 11), (12, None), (None, 13)}, got
