"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. FirstN must be lazy (a DRPC-/feeder-bound stream would otherwise freeze to
   the empty first snapshot).
2. MultiCountMetric must count repeated keys (duplicate map keys throw under
   spark.sql.mapKeyDedupPolicy=EXCEPTION).
3. A batch txid BEHIND the stored txid must fail fast (parity:
   ``OpaqueValue.java:44`` "Current batch is behind state's batch") — scalar,
   memory, and parquet paths.
4. A DRPC chain ending in a join/multiReduce must register the post-join
   stream as the terminal.
5. stateful_sessionize must fold events in event-time order and extend a
   session backwards when an earlier in-watermark event arrives.
"""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.metrics import MultiCountMetric, observe
from storm_spark.operations import Count, Split, Sum
from storm_spark.operations.builtin import FirstN, MapGet
from storm_spark.state import MemoryMapState, OpaqueValue, ParquetMapState, StateType
from storm_spark.topology import FeederSource, LocalCluster, Topology


# -- 1: FirstN laziness ------------------------------------------------------


def test_first_n_is_lazy_on_feeder_stream(spark):
    """FirstN applied before any feed must see the fed batch, not the empty
    plan snapshot taken at assembly time (ADVICE: builtin.py FirstN.apply)."""
    topo = Topology(spark)
    feeder = FeederSource(["word", "n"], ["string", "bigint"])
    counts = (
        topo.new_stream("t", feeder)
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["n"], Sum("bigint"), ["total"])
    )
    # assemble the DRPC top-1 chain BEFORE feeding anything
    (
        topo.new_drpc_stream("top")
        .each(["args"], Split(), ["word"])
        .state_query(counts, ["word"], MapGet(), ["total"])
        .project(["word", "total"])
        .apply_assembly(FirstN(1, "total", reverse=True))
    )
    cluster = LocalCluster(topo)
    feeder.feed([["a", 5], ["b", 9], ["a", 2]])
    assert cluster.execute_drpc("top", "a b") == [["b", 9]]


# -- 2: MultiCountMetric with repeated keys ----------------------------------


def test_multi_count_metric_repeated_key(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",), ("a",)], "k string")
    obs = Observation("mc")
    observe(df, obs, MultiCountMetric("k")).count()
    assert obs.get["counts"] == {"a": 3, "b": 1}


# -- 3: txid-behind fail-fast ------------------------------------------------


def test_opaque_value_rejects_stale_txid():
    v = OpaqueValue(5, 10, 7)
    with pytest.raises(ValueError, match="behind"):
        v.update(3, 99)
    # equal and newer txids still fine
    assert v.update(5, 99).curr == 99
    assert v.update(6, 99).prev == 10


def test_memory_map_state_rejects_stale_txid():
    ks = StructType().add("k", "string")
    st = MemoryMapState(ks, "count", "bigint", StateType.OPAQUE)
    st.begin_commit(5)
    st.multi_update([("a",)], [1], lambda a, b: (a or 0) + (b or 0), 0)
    st.commit(5)
    st.begin_commit(2)  # epoch counter reset (fresh checkpoint)
    with pytest.raises(ValueError, match="behind"):
        st.multi_update([("a",)], [1], lambda a, b: (a or 0) + (b or 0), 0)


def test_parquet_map_state_rejects_stale_txid(spark, tmp_path):
    ks = StructType().add("k", "string")
    st = ParquetMapState(
        spark, str(tmp_path / "stale"), ks, "count", "bigint", StateType.OPAQUE, 4
    )

    def batch(pairs):
        return spark.createDataFrame(
            pairs, StructType().add("k", "string").add("__delta__", "long")
        )

    st.begin_commit(5)
    st.update_from_agg(batch([("a", 2)]), Count(), 5)
    st.commit(5)
    st.begin_commit(2)
    with pytest.raises(Exception, match="behind"):
        st.update_from_agg(batch([("a", 1)]), Count(), 2)
        st.as_dict()  # force evaluation


# -- 4: DRPC terminal through joins ------------------------------------------


def test_drpc_terminal_through_join(spark):
    """A DRPC chain ending in a join must execute the post-join stream
    (ADVICE: _track_drpc only wrapped Stream._with)."""
    topo = Topology(spark)
    dims = spark.createDataFrame([("a", 1), ("b", 2)], "word string, dim int")
    dim_stream = topo.new_stream("dims", dims)
    drpc = topo.new_drpc_stream("lookup").each(["args"], Split(), ["word"])
    drpc.join(dim_stream, ["word"], ["word"], ["word", "args", "dim"])
    cluster = LocalCluster(topo)
    rows = sorted(map(tuple, cluster.execute_drpc("lookup", "a b")))
    assert rows == [("a", "a b", 1), ("b", "a b", 2)]


def test_drpc_terminal_through_merge(spark):
    topo = Topology(spark)
    other = topo.new_stream("o", spark.createDataFrame([("zz",)], "args string"))
    drpc = topo.new_drpc_stream("m")
    topo.merge(other, drpc)
    cluster = LocalCluster(topo)
    rows = sorted(map(tuple, cluster.execute_drpc("m", "hello")))
    assert rows == [("hello",), ("zz",)]


# -- 5: sessionize event-time ordering ---------------------------------------


def test_sessionize_out_of_order_within_batch(spark, tmp_path):
    """A later-then-earlier pair inside one batch must form ONE session with
    start = the earlier timestamp (ADVICE: stateful.py arrival-order fold)."""
    import os

    from storm_spark.streaming.stateful import stateful_sessionize

    indir = tmp_path / "sin"
    os.makedirs(indir)
    # out of order: 10:04 arrives before 10:00; gap 600s => one session
    rows = [("2024-01-01 10:04:00", "u1"), ("2024-01-01 10:00:00", "u1")]
    df = spark.createDataFrame(rows, "ts string, user string").select(
        F.to_timestamp("ts").alias("ts"), "user"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))
    # a much later event in a second batch closes u1's session via watermark
    late = spark.createDataFrame(
        [("2024-01-01 12:00:00", "u2")], "ts string, user string"
    ).select(F.to_timestamp("ts").alias("ts"), "user")

    stream = (
        spark.readStream.schema("ts timestamp, user string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    ).withWatermark("ts", "1 minute")
    out = stateful_sessionize(stream, "user", "ts", gap_seconds=600)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_ooo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        late.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        got = {
            r.user: (r.session_start, r.session_end, r.n_events)
            for r in spark.sql("select * from sess_ooo").collect()
        }
    finally:
        q.stop()
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0).timestamp()
    t4 = datetime.datetime(2024, 1, 1, 10, 4).timestamp()
    assert got["u1"] == (t0, t4, 2)
