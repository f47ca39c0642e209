"""Regression tests for the round-2 code-review findings (core engine)."""

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.operations import Count, SnapshotGet, Sum
from storm_spark.state import MemoryMapState
from storm_spark.state.base import StateType
from storm_spark.topology import FeederSource, LocalCluster, Topology


def _mk_memory(state_type=StateType.OPAQUE):
    return MemoryMapState(
        StructType().add("k", "string"), "count", "bigint", state_type
    )


def test_global_persistent_aggregate_three_arg_overload(spark):
    """The documented (state_factory, agg, out_fields) overload — previously
    remapped on the wrong sentinel and crashed."""
    topo = Topology(spark)
    feeder = FeederSource(["word"])
    total = topo.new_stream("w", feeder).persistent_aggregate(
        MemoryMapState.factory(), Count(), ["count"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a"], ["b"], ["a"]])
    snap = total.state.multi_get([(0,)])
    assert snap == [3]


def test_snapshot_get_on_empty_state_emits_null(spark):
    """SnapshotGet before any batch: the reference emits the null snapshot
    value, not zero rows."""
    topo = Topology(spark)
    feeder = FeederSource(["x"], ["bigint"])
    total = topo.new_stream("t", feeder).persistent_aggregate(
        MemoryMapState.factory(), ["x"], Sum("bigint"), ["total"]
    )
    topo.new_drpc_stream("gettotal").state_query(total, None, SnapshotGet(), ["total"])
    cluster = LocalCluster(topo)
    assert cluster.execute_drpc("gettotal", "ignored") == [["ignored", None]]
    cluster.feed(feeder, [[2], [3]])
    assert cluster.execute_drpc("gettotal", "ignored") == [["ignored", 5]]


def test_new_values_stream_empty_after_empty_batch(spark):
    """An empty batch must reset the touched-key set — new_values_stream
    reports the MOST RECENT batch's updates, which are none."""
    topo = Topology(spark)
    feeder = FeederSource(["word"])
    wc = (
        topo.new_stream("w", feeder)
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a"], ["b"]])
    assert wc.new_values_stream().df.count() == 2
    cluster.feed(feeder, [])
    assert wc.new_values_stream().df.count() == 0


def test_memory_multi_put_replay_preserves_original_prev():
    """multi_put on a replayed txid must keep the PRE-BATCH prev, not the
    prior attempt's own write, and must register the key as batch-updated."""
    st = _mk_memory()
    st.begin_commit(1)
    st.multi_put([("k",)], [10])
    st.commit(1)
    st.begin_commit(2)
    st.multi_put([("k",)], [20])
    st.commit(2)
    # replay txid 2 (crash before commit landed downstream)
    st.begin_commit(2)
    st.multi_put([("k",)], [25])
    # the replay's prev must still be txid 1's value...
    assert st._map[("k",)].prev == 10
    # ...and the put registered as batch-updated: reads see the new value
    assert st.multi_get([("k",)]) == [25]
    st.commit(2)


def test_legacy_partition_persist_reordered_in_fields(spark):
    """Legacy StateUpdater tuples index by spec.in_fields order, not the
    stream's column order — by-name access must return the right values."""
    captured = []

    class Capture:
        def __call__(self, state, tuples, collector):
            for t in tuples:
                captured.append((t["b"], t["a"]))

    topo = Topology(spark)
    feeder = FeederSource(["a", "b", "c"], ["bigint", "string", "bigint"])
    topo.new_stream("s", feeder).partition_persist(
        MemoryMapState.factory(), ["b", "a"], Capture()
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [[1, "x", 9], [2, "y", 8]])
    assert sorted(captured) == [("x", 1), ("y", 2)]


def test_multi_reduce_grouped_reordered_keys(spark):
    """Grouped multiReduce with grouping keys NOT in the stream's natural
    column order: key columns must come out correctly typed and valued."""
    class SumBoth:
        out_types = ["bigint"]

        def init(self, collector):
            return {"sum": 0}

        def execute(self, state, stream_index, tup, collector):
            state["sum"] += tup["v"]

        def complete(self, state, collector):
            collector.emit([state["sum"]])

    topo = Topology(spark)
    a = topo.new_stream(
        "a", spark.createDataFrame([(1, "x", 10), (2, "y", 20)], "v int, g string, h int")
    )
    b = topo.new_stream(
        "b", spark.createDataFrame([(5, "x", 10)], "v int, g string, h int")
    )
    # TWO grouping keys in the REVERSE of the streams' column order (h, g):
    # the key schema must follow the grouping order, or the int/string
    # columns come out swapped (Arrow type error / corrupted keys)
    out = topo.multi_reduce(
        [a.group_by(["h", "g"]), b.group_by(["h", "g"])], SumBoth(), ["h", "g", "total"]
    )
    got = sorted(map(tuple, out.df.collect()))
    assert got == [(10, "x", 6), (20, "y", 2)]
