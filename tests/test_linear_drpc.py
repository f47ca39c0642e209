"""LinearDRPCTopologyBuilder — ports of the reference's canonical linear-DRPC
topologies (BasicDRPCTopology's exclaim chain; a reach-style split → count
chain exercising IBatchBolt per-request batches and multi-request
coordination). Parity: ``backtype/storm/drpc/LinearDRPCTopologyBuilder.java``,
``PrepareRequest.java``, ``JoinResult.java``, ``KeyedFairBolt.java``,
``coordination/IBatchBolt.java``."""

import pytest

from storm_spark.builder import BasicBolt
from storm_spark.drpc import BatchBolt, KeyedFairBolt, LinearDRPCTopologyBuilder
from storm_spark.topology import LocalCluster, Topology


class ExclaimBolt(BasicBolt):
    """storm-starter BasicDRPCTopology's ExclaimBolt: result = args + '!'.
    Emits [id, result] — the required last-bolt shape."""

    out_fields = ["id", "result"]
    out_types = ["bigint", "string"]

    def execute(self, tup, collector):
        collector.emit([tup["request"], tup["args"] + "!"])


class SplitWordsBolt(BasicBolt):
    """One row per whitespace token, request id carried through."""

    out_fields = ["id", "word"]
    out_types = ["bigint", "string"]

    def execute(self, tup, collector):
        for w in tup["args"].split():
            collector.emit([tup["request"], w])


class CountJoinBolt(BatchBolt):
    """Per-request batch: word-count the request's tuples, emit ONE
    [id, result] row (JoinResult expects a single result tuple per request)."""

    out_fields = ["id", "result"]
    out_types = ["bigint", "string"]

    def prepare(self, request_id):
        self.request_id = request_id
        self.counts = {}

    def execute(self, tup):
        w = tup["word"]
        self.counts[w] = self.counts.get(w, 0) + 1

    def finish_batch(self, collector):
        result = ",".join(f"{w}:{c}" for w, c in sorted(self.counts.items()))
        collector.emit([self.request_id, result])


class TwoStreamBolt(BasicBolt):
    out_fields = ["id", "result"]
    out_types = ["bigint", "string"]

    def declare_streams(self):
        return {
            "a": (["id", "result"], ["bigint", "string"]),
            "b": (["id", "result"], ["bigint", "string"]),
        }

    def execute(self, tup, collector):
        collector.emit("a", [tup["request"], tup["args"]])


class ThreeFieldBolt(BasicBolt):
    out_fields = ["id", "result", "extra"]
    out_types = ["bigint", "string", "string"]

    def execute(self, tup, collector):
        collector.emit([tup["request"], tup["args"], "x"])


def test_exclaim_single_bolt(spark):
    """BasicDRPCTopology as written: one BasicBolt, execute returns args+'!'."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "exclaim")
    b.add_bolt(ExclaimBolt())
    drpc = b.create_local_topology()
    assert drpc.execute("hello") == "hello!"


def test_split_count_chain_multi_request(spark):
    """Split (BasicBolt) → fields_grouping(id) → per-request count
    (IBatchBolt). Three concurrent requests ride one plan execution and each
    gets its own result (PrepareRequest id isolation + JoinResult pairing)."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "wc")
    b.add_bolt(SplitWordsBolt())
    b.add_bolt(CountJoinBolt()).fields_grouping(["id"])
    drpc = b.create_local_topology()
    out = drpc.execute_many(["the quick the", "fox", "a b a b a", "fox"])
    # one result per request, input-aligned — duplicate args are distinct
    # requests (PrepareRequest assigns each its own id)
    assert out == ["quick:1,the:2", "fox:1", "a:3,b:2", "fox:1"]


def test_keyed_fair_bolt_wrapper(spark):
    """KeyedFairBolt delegates execution (fairness is scheduling, not
    semantics, under Spark's parallel request rows)."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "fair")
    b.add_bolt(SplitWordsBolt())
    b.add_bolt(KeyedFairBolt(CountJoinBolt())).fields_grouping(["id"])
    drpc = b.create_local_topology()
    assert drpc.execute("x y x") == "x:2,y:1"


def test_execute_drpc_entrypoint_routes_to_linear_topology(spark):
    """create_local_topology registers the function with the Topology, so the
    Trident-side LocalCluster.execute_drpc also reaches it (ReturnResults
    projection: result only)."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "exclaim2")
    b.add_bolt(ExclaimBolt())
    b.create_local_topology()
    cluster = LocalCluster(topo)
    assert cluster.execute_drpc("exclaim2", "hey") == [["hey!"]]


def test_last_bolt_must_emit_two_fields(spark):
    """Parity: the reference's RuntimeException when the last component's
    output is not exactly [id, result]."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "bad")
    b.add_bolt(ThreeFieldBolt())
    with pytest.raises(RuntimeError, match="exactly two fields"):
        b.create_local_topology()


def test_last_bolt_must_declare_one_stream(spark):
    """Parity: 'Must declare exactly one stream from last bolt'."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "bad2")
    b.add_bolt(TwoStreamBolt())
    with pytest.raises(RuntimeError, match="exactly one stream"):
        b.create_local_topology()


def test_global_grouping_final_aggregate(spark):
    """global_grouping before a batch bolt (ReachTopology's CountAggregator
    placement): the final bolt still batches per request id."""
    topo = Topology(spark)
    b = LinearDRPCTopologyBuilder(topo, "wc_global")
    b.add_bolt(SplitWordsBolt())
    b.add_bolt(CountJoinBolt()).global_grouping()
    drpc = b.create_local_topology()
    assert drpc.execute_many(["p q p", "r"]) == ["p:2,q:1", "r:1"]
