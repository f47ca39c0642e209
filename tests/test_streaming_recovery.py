"""Checkpoint crash-recovery parity for the stateful streaming twins.

The reference's transactional core is surviving coordinator failure —
``MasterBatchCoordinator.java:121-180`` replays uncommitted txids after a
restart and state lands exactly-once. The Spark analogue: a
``StreamingQuery`` killed mid-feed must, when restarted from the same
checkpoint, restore its GroupState snapshots and file-source offsets and
converge to the same answer as a clean batch run. ``q_streaming_recovery``
(queries.py) is the catalog gate at sf0.01; this test proves the same
contract on a tiny synthetic feed where the crash point is pinned to land
INSIDE an open session, so state restoration (not just offset replay) is
what's under test.
"""

import os
import tempfile
import uuid
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

GAP = 1800
T0 = datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _mk(user, minutes):
    return (user, T0 + timedelta(minutes=minutes))


# Feed design: user 1's first session (0,10,20 min) STRADDLES the crash —
# events 0,10 land before the kill, 20 after — so the restarted query must
# restore the open-session GroupState to avoid splitting it in two. User 2
# closes a session entirely pre-crash and opens another post-crash.
BATCH_PRE = [_mk(1, 0), _mk(1, 10), _mk(2, 0)]
BATCH_POST = [_mk(1, 20), _mk(1, 200), _mk(2, 200), _mk(2, 210)]
# expected closed sessions: user 1 -> {0-20 min, 200 min} = 2;
# user 2 -> {0 min, 200-210 min} = 2
EXPECTED = {1: 2, 2: 2}


def test_restart_from_checkpoint_matches_batch(spark):
    from storm_spark.streaming.stateful import stateful_sessionize

    tmp = tempfile.mkdtemp(prefix="srec_test_")
    indir, outdir, ckpt = (os.path.join(tmp, d) for d in ("in", "out", "ckpt"))
    os.makedirs(indir)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{indir}/*")
        ).withWatermark("ts", "1 second")
        out = stateful_sessionize(stream, "user_id", "ts", gap_seconds=GAP)
        return (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .queryName("srec_t_" + uuid.uuid4().hex[:8])
            .start()
        )

    q = start()
    try:
        spark.createDataFrame(BATCH_PRE, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(indir, "b1"))
        q.processAllAvailable()
    finally:
        q.stop()  # crash: user 1's session is OPEN in checkpointed state

    q2 = start()
    try:
        spark.createDataFrame(BATCH_POST, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(indir, "b2"))
        q2.processAllAvailable()
        # sentinel far in the future closes every session via watermark
        sent = [(-1, T0 + timedelta(days=2)), (-1, T0 + timedelta(days=3))]
        for i, row in enumerate(sent):
            spark.createDataFrame([row], SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(indir, f"s{i}"))
            q2.processAllAvailable()
    finally:
        q2.stop()

    rows = (
        spark.read.parquet(outdir)
        .filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r["user_id"]: r["n"] for r in rows}
    assert got == EXPECTED, got

    # the straddling session must be ONE row spanning the crash point —
    # 3 events, 0..20 min — not two fragments
    s1 = (
        spark.read.parquet(outdir)
        .filter((F.col("user_id") == 1) & (F.col("n_events") == 3))
        .collect()
    )
    assert len(s1) == 1, spark.read.parquet(outdir).collect()


def test_dedup_state_survives_restart(spark):
    """The builtin stateful operator's state store (dropDuplicates), not
    just applyInPandasWithState: a key first seen BEFORE the crash must
    still be suppressed when re-delivered AFTER the restart — the
    reference's message-id replay dedup surviving coordinator failure."""
    from storm_spark.streaming.dedup import streaming_dedup_exact

    tmp = tempfile.mkdtemp(prefix="sdd_rec_")
    indir, outdir, ckpt = (os.path.join(tmp, d) for d in ("in", "out", "ckpt"))
    os.makedirs(indir)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{indir}/*")
        )
        out = streaming_dedup_exact(stream, ["user_id"])
        return (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .queryName("sddrec_" + uuid.uuid4().hex[:8])
            .start()
        )

    q = start()
    try:
        spark.createDataFrame(
            [_mk(1, 0), _mk(2, 0), _mk(1, 5)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(indir, "b1"))
        q.processAllAvailable()
    finally:
        q.stop()  # crash with keys {1, 2} in dedup state

    q2 = start()
    try:
        # re-deliver key 1 (pre-crash) and key 2, plus a genuinely new key 3
        spark.createDataFrame(
            [_mk(1, 60), _mk(2, 60), _mk(3, 60)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(indir, "b2"))
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(outdir).groupBy("user_id").count().collect()
    got = {r["user_id"]: r["count"] for r in rows}
    assert got == {1: 1, 2: 1, 3: 1}, got


def test_restart_does_not_replay_committed_batches(spark):
    """Offset-log leg: a batch fully processed before the crash must not
    re-emit after restart (exactly-once, not at-least-once). User 3's
    session closes pre-crash via sentinel; post-restart sentinels must not
    produce a duplicate closed-session row."""
    from storm_spark.streaming.stateful import stateful_sessionize

    tmp = tempfile.mkdtemp(prefix="srec_test2_")
    indir, outdir, ckpt = (os.path.join(tmp, d) for d in ("in", "out", "ckpt"))
    os.makedirs(indir)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{indir}/*")
        ).withWatermark("ts", "1 second")
        out = stateful_sessionize(stream, "user_id", "ts", gap_seconds=GAP)
        return (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .queryName("srec_t2_" + uuid.uuid4().hex[:8])
            .start()
        )

    q = start()
    try:
        spark.createDataFrame([_mk(3, 0), _mk(3, 5)], SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(indir, "b1"))
        q.processAllAvailable()
        # two watermark advances close user 3's session BEFORE the crash
        for i, d in enumerate((1, 2)):
            spark.createDataFrame(
                [(-1, T0 + timedelta(days=d))], SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(os.path.join(indir, f"p{i}"))
            q.processAllAvailable()
        pre = spark.read.parquet(outdir).filter(F.col("user_id") == 3).count()
        assert pre == 1, pre
    finally:
        q.stop()

    q2 = start()
    try:
        for i, d in enumerate((4, 5)):
            spark.createDataFrame(
                [(-1, T0 + timedelta(days=d))], SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(os.path.join(indir, f"r{i}"))
            q2.processAllAvailable()
    finally:
        q2.stop()

    post = spark.read.parquet(outdir).filter(F.col("user_id") == 3).count()
    assert post == 1, "committed batch re-emitted after restart"


def test_stateful_topk_silent_key_emits_once(spark):
    """Regression for the r6 partial-emission bug: a key with data in
    trigger 1, SILENT in trigger 2 while the global watermark advances
    hours past its last event, then active again in trigger 3, must emit
    exactly ONE final top-k (the flush-instant deadline), never a partial
    mid-stream leaderboard plus a second one."""
    from datetime import timedelta

    from pyspark.sql.types import IntegerType, StringType

    from storm_spark.streaming.stateful import stateful_topk

    schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("ts", TimestampType()),
            StructField("score", LongType()),
            StructField("item", LongType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="stopk_test_")
    indir = os.path.join(tmp, "in")
    os.makedirs(indir)
    t = lambda h: T0 + timedelta(hours=h)
    flush_at = t(30)
    batches = [
        # trigger 1: both keys
        [("a", t(0), 10, 1), ("a", t(1), 30, 2), ("b", t(1), 5, 7)],
        # trigger 2: only b — watermark jumps 20h past a's last event
        [("b", t(20), 9, 8), ("b", t(21), 1, 9)],
        # trigger 3: a returns with the true #1 item
        [("a", t(29), 99, 3)],
        # sentinels past the flush instant
        [("__s__", t(40), 0, 0)],
        [("__s__", t(50), 0, 0)],
    ]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    ).withWatermark("ts", "1 second")
    out = stateful_topk(
        stream, "grp", "ts", "score", ["item"], k=2,
        flush_at_ts=flush_at.timestamp(),
    )
    qname = "stopkt_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(indir, f"b{i}"))
            q.processAllAvailable()
    finally:
        q.stop()
    res = [
        (r["grp"], r["score"], r["item"], r["rank"])
        for r in spark.table(qname).filter(F.col("grp") != "__s__").collect()
    ]
    assert sorted(res) == [
        ("a", 30, 2, 2),
        ("a", 99, 3, 1),
        ("b", 5, 7, 2),
        ("b", 9, 8, 1),
    ], sorted(res)


def test_uncommitted_epoch_replays_into_state_exactly_once(spark):
    """Sink-side exactly-once (VERDICT r6 #6, the `streaming_persist_recovery`
    gate's contract, pinned at unit scale): the engine's foreachBatch state
    driver under a crash BETWEEN the state merge and the checkpoint's sink
    commit — injected by deleting the newest commit-log entry (plus its
    Hadoop CRC sidecar). The restarted query must RE-DELIVER that epoch with
    the SAME epoch id (at-least-once, asserted via an epoch spy), and the
    opaque state merge must absorb the duplicate (exactly-once effect:
    counts equal the batch truth, not batch-2-counted-twice). This is
    Trident's ``MasterBatchCoordinator.java:121-180`` uncommitted-txid
    replay with ``PartitionPersistProcessor.java:36`` committer semantics."""
    import glob

    from storm_spark.operations import Count
    from storm_spark.state import ParquetMapState
    from storm_spark.streaming.driver import StreamingTopologyRunner
    from storm_spark.topology import FeederSource, Topology

    tmp = tempfile.mkdtemp(prefix="sprec_test_")
    indir, ckpt, statedir = (os.path.join(tmp, d) for d in ("in", "ckpt", "st"))
    os.makedirs(indir)

    topo = Topology(spark)
    feeder = FeederSource(["user_id", "ts"])
    st = (
        topo.new_stream("ev", feeder)
        .group_by(["user_id"])
        .persistent_aggregate(
            ParquetMapState.factory(statedir), ["user_id"], Count(), ["n"]
        )
    )
    runner = StreamingTopologyRunner(topo, feeder)
    seen_epochs = []
    inner = runner._process_epoch

    def spy(batch_df, epoch_id):
        seen_epochs.append(epoch_id)
        inner(batch_df, epoch_id)

    runner._process_epoch = spy

    def start():
        return runner.start_files(
            f"{indir}/*", SCHEMA, checkpoint_dir=ckpt,
            query_name="sprect_" + uuid.uuid4().hex[:8],
        )

    q = start()
    try:
        for b, rows in enumerate(
            ([_mk(1, 0), _mk(2, 0)], [_mk(1, 1), _mk(3, 1)])
        ):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(indir, f"b{b}"))
            q.processAllAvailable()
    finally:
        q.stop()

    # crash window: state merged epoch 1, but its sink commit never landed
    commits = sorted(
        (p for p in glob.glob(os.path.join(ckpt, "commits", "*"))
         if os.path.basename(p).isdigit()),
        key=lambda p: int(os.path.basename(p)),
    )
    assert [int(os.path.basename(p)) for p in commits] == [0, 1]
    os.remove(commits[-1])
    crc = os.path.join(os.path.dirname(commits[-1]), ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = start()
    try:
        q2.processAllAvailable()  # replays epoch 1
        spark.createDataFrame([_mk(1, 2)], SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(indir, "b2"))
        q2.processAllAvailable()
    finally:
        q2.stop()

    assert seen_epochs == [0, 1, 1, 2], seen_epochs  # epoch 1 re-delivered
    got = {
        r["user_id"]: r["n"]
        for r in st.dataframe().collect()
    }
    # batch truth: user 1 x3, user 2 x1, user 3 x1 — a non-idempotent merge
    # would double epoch 1 into {1: 4, 3: 2}
    assert got == {1: 3, 2: 1, 3: 1}, got


def test_join_state_survives_restart(spark):
    """The THIRD streaming state type after GroupState and dedup state:
    the stream-stream join's buffered-row store. A left row buffered
    BEFORE the crash must (a) match a right row that only arrives AFTER
    the restart, and (b) if unmatched, still outer-flush when the
    watermark finally passes — both require the restarted query to
    restore the join buffer from the checkpoint, not just the offsets."""
    from pyspark.sql.types import (
        LongType as _L,
        StructField as _F,
        StructType as _S,
        TimestampType as _T,
    )

    from storm_spark.streaming.joins import interval_join

    jschema = _S(
        [_F("user_id", _L()), _F("ts", _T()), _F("event_id", _L())]
    )

    def _jev(user, seconds, eid):
        return (user, T0 + timedelta(seconds=seconds), eid)

    tmp = tempfile.mkdtemp(prefix="sjn_rec_")
    ld, rd, outdir, ckpt = (
        os.path.join(tmp, d) for d in ("l", "r", "out", "ckpt")
    )
    os.makedirs(ld)
    os.makedirs(rd)

    def start():
        left = (
            spark.readStream.schema(jschema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{ld}/*")
        ).withWatermark("ts", "1 second")
        right = (
            spark.readStream.schema(jschema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{rd}/*")
        ).withWatermark("ts", "1 second")
        joined = interval_join(
            left, right, "user_id", "ts", 0, 60, how="left_outer"
        ).select("user_id", "event_id", "event_id_r")
        return (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .queryName("sjnrec_" + uuid.uuid4().hex[:8])
            .start()
        )

    q = start()
    try:
        # left 10@0 will match only post-restart; left 11@5 never matches
        spark.createDataFrame(
            [_jev(1, 0, 10), _jev(1, 5, 11)], jschema
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(ld, "b1"))
        spark.createDataFrame([_jev(9, 0, 90)], jschema).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(rd, "b1"))
        q.processAllAvailable()
    finally:
        q.stop()  # crash with rows 10 and 11 buffered in join state

    q2 = start()
    try:
        # the match for 10 arrives only now (t=2s: inside 10@0's [0,60]
        # window, OUTSIDE 11@5's [5,65]); then sentinel feeds flush
        spark.createDataFrame([_jev(1, 2, 20)], jschema).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(rd, "b2"))
        q2.processAllAvailable()
        for s in (1, 2):
            sent = [(-1, T0 + timedelta(days=s), -s)]
            for d in (ld, rd):
                spark.createDataFrame(sent, jschema).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(os.path.join(d, f"s{s}"))
            q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(outdir).filter("user_id >= 0").collect()
    got = {(r["event_id"], r["event_id_r"]) for r in rows}
    assert got == {(10, 20), (11, None)}, got
