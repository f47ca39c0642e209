"""Scale-path partitionPersist: KeyedStateUpdater runs per partition on the
executors (mapInPandas), deltas combine per key, and merge into
ParquetMapState under the opaque txid protocol — no driver collect.

Parity: ``StateUpdater.java`` + ``PartitionPersistProcessor.java:36`` +
``Stream.java:170-193``.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.operations import Sum
from storm_spark.operations.base import (
    KeyedStateUpdater,
    ReplaceCombiner,
)
from storm_spark.state import MemoryMapState, ParquetMapState, StateType
from storm_spark.topology import FeederSource, LocalCluster, Topology


class WordSumUpdater(KeyedStateUpdater):
    """Custom per-partition updater: accumulates n per word, skipping words
    starting with '_' (arbitrary user logic the built-in aggregates can't
    express declaratively)."""

    def __init__(self):
        super().__init__(["word"], Sum("bigint"))

    def update_state(self, buffer, tuples, collector):
        for t in tuples:
            if not t["word"].startswith("_"):
                buffer.update((t["word"],), t["n"])

    def reduce_expr(self, delta_col):
        return F.sum(delta_col)


def test_keyed_updater_parquet_state(spark, tmp_path):
    topo = Topology(spark)
    feeder = FeederSource(["word", "n"], ["string", "bigint"])
    st = topo.new_stream("s", feeder).partition_persist(
        ParquetMapState.factory(str(tmp_path / "pp")), ["word", "n"], WordSumUpdater(), ["total"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a", 1], ["b", 2], ["_skip", 9], ["a", 3]])
    assert dict(st.state.as_dict()) == {("a",): 4, ("b",): 2}
    # second epoch accumulates
    cluster.feed(feeder, [["a", 10], ["c", 5]])
    assert dict(st.state.as_dict()) == {("a",): 14, ("b",): 2, ("c",): 5}


def test_keyed_updater_opaque_replay(spark, tmp_path):
    """Replaying a txid with CHANGED batch content recomputes from prev —
    the partition_persist path inherits the full opaque guarantee."""
    topo = Topology(spark)
    feeder = FeederSource(["word", "n"], ["string", "bigint"])
    st = topo.new_stream("s", feeder).partition_persist(
        ParquetMapState.factory(str(tmp_path / "ppr")), ["word", "n"], WordSumUpdater(), ["total"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a", 1]])
    t2 = cluster.feed(feeder, [["a", 3]])
    assert dict(st.state.as_dict()) == {("a",): 4}
    # replay t2 with different content: must land at 1 + 10, not 4 + 10
    cluster.feed(feeder, [["a", 10]], txid=t2)
    assert dict(st.state.as_dict()) == {("a",): 11}


def test_keyed_updater_runs_on_executors_no_driver_collect(spark, tmp_path):
    """Behavior proof for the no-collect claim: (1) the updater executes in
    worker processes, not the driver; (2) driver-side mutable state it
    closes over stays untouched (the closure is serialized to workers)."""
    driver_pid = os.getpid()
    driver_side_effects = []

    class PidUpdater(KeyedStateUpdater):
        def __init__(self):
            super().__init__(["word"], Sum("bigint"))

        def update_state(self, buffer, tuples, collector):
            driver_side_effects.append("ran")  # stays empty on the driver
            for t in tuples:
                buffer.update((t["word"],), t["n"])
            buffer.put(("__pid_is_driver__",), 1 if os.getpid() == driver_pid else 0)

    topo = Topology(spark)
    feeder = FeederSource(["word", "n"], ["string", "bigint"])
    st = topo.new_stream("s", feeder).partition_persist(
        ParquetMapState.factory(str(tmp_path / "ppe")), ["word", "n"], PidUpdater(), ["total"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a", 1], ["b", 2]])
    state = dict(st.state.as_dict())
    assert state[("__pid_is_driver__",)] == 0, "updater ran on the driver!"
    assert driver_side_effects == [], "updater closure executed driver-side"
    assert state[("a",)] == 1 and state[("b",)] == 2


def test_keyed_updater_replace_semantics(spark):
    """put()-style state via ReplaceCombiner: last write wins across
    epochs."""

    class LastSeenUpdater(KeyedStateUpdater):
        def __init__(self):
            super().__init__(["word"], ReplaceCombiner("string"))

        def update_state(self, buffer, tuples, collector):
            for t in tuples:
                buffer.put((t["word"],), t["tag"])

    topo = Topology(spark)
    feeder = FeederSource(["word", "tag"], ["string", "string"])
    st = topo.new_stream("s", feeder).partition_persist(
        MemoryMapState.factory(), ["word", "tag"], LastSeenUpdater(), ["tag"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a", "x"]])
    cluster.feed(feeder, [["a", "y"], ["b", "z"]])
    assert dict(st.state.as_dict()) == {("a",): "y", ("b",): "z"}


def test_legacy_driver_updater_still_works(spark):
    """The plain-callable contract keeps working (documented parity path)."""
    seen = []

    def updater(state, tuples, collector):
        seen.extend(t["word"] for t in tuples)

    topo = Topology(spark)
    feeder = FeederSource(["word"])
    topo.new_stream("s", feeder).partition_persist(
        MemoryMapState.factory(), ["word"], updater, ["res"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["x"], ["y"]])
    assert sorted(seen) == ["x", "y"]
