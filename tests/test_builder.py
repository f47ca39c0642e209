"""Core-Storm TopologyBuilder facade — port of the classic word-count
topology test (integration_test.clj:28-59: TestWordSpout → TestWordCounter
with fields grouping; golden multiset assertions)."""

import pytest

from storm_spark.builder import BasicBolt, TopologyBuilder
from storm_spark.operations.base import TridentCollector, TridentTuple
from storm_spark.topology import FeederSource, LocalCluster, Topology


class WordCounterBolt(BasicBolt):
    """Parity: TestWordCounter (backtype/storm/testing/TestWordCounter.java:58)
    — per-task running count, emits [word, count] per tuple."""

    out_fields = ["word", "count"]
    out_types = ["string", "bigint"]

    def prepare(self):
        self.counts = {}

    def execute(self, tup, collector):
        w = tup["word"]
        self.counts[w] = self.counts.get(w, 0) + 1
        collector.emit([w, self.counts[w]])


class ExclaimBolt(BasicBolt):
    out_fields = ["word"]
    out_types = ["string"]

    def execute(self, tup, collector):
        collector.emit([tup["word"] + "!"])


def test_wordcount_topology(spark):
    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    words = spark.createDataFrame(
        [("nathan",), ("bertels",), ("jackson",), ("nathan",)], "word string"
    )
    builder.set_spout("1", words)
    builder.set_bolt("2", WordCounterBolt(), 4).fields_grouping("1", ["word"])
    out = builder.stream("2").df.collect()
    # golden multiset (ms= semantics): running counts per word
    got = sorted((r.word, r["count"]) for r in out)
    assert got == [("bertels", 1), ("jackson", 1), ("nathan", 1), ("nathan", 2)]


def test_bolt_chain_and_shuffle_grouping(spark):
    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    words = spark.createDataFrame([("a",), ("b",)], "word string")
    builder.set_spout("w", words)
    builder.set_bolt("ex", ExclaimBolt()).shuffle_grouping("w")
    builder.set_bolt("ex2", ExclaimBolt()).shuffle_grouping("ex")
    got = sorted(r.word for r in builder.stream("ex2").df.collect())
    assert got == ["a!!", "b!!"]


def test_bolt_merges_multiple_inputs(spark):
    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    a = spark.createDataFrame([("x",)], "word string")
    b = spark.createDataFrame([("y",)], "word string")
    builder.set_spout("a", a)
    builder.set_spout("b", b)
    builder.set_bolt("ex", ExclaimBolt()).shuffle_grouping("a").shuffle_grouping("b")
    got = sorted(r.word for r in builder.stream("ex").df.collect())
    assert got == ["x!", "y!"]


def test_unwired_bolt_raises(spark):
    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    builder.set_bolt("lonely", ExclaimBolt())
    with pytest.raises(ValueError):
        builder.stream("lonely")


def test_complete_topology_golden_output(spark):
    """testing.clj:436-497 port: mock the spout, run to completion, read
    every stream, assert with multiset (ms=) semantics."""
    from storm_spark.builder import complete_topology

    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    placeholder = spark.createDataFrame([("ignored",)], "word string")
    builder.set_spout("1", placeholder)
    builder.set_bolt("2", WordCounterBolt(), 4).fields_grouping("1", ["word"])

    results = complete_topology(
        builder, mocked_sources={"1": [["nathan"], ["bertels"], ["jackson"], ["nathan"]]}
    )
    # ms= on the spout stream
    assert results["1"] == sorted([("nathan",), ("bertels",), ("jackson",), ("nathan",)])
    # ms= on the counter bolt (integration_test.clj:28-59 expectations)
    assert results["2"] == [("bertels", 1), ("jackson", 1), ("nathan", 1), ("nathan", 2)]


# ---------------------------------------------------------------------------
# Named multi-stream outputs (declareStream / emit(streamId, ...))
# ---------------------------------------------------------------------------


class SplitLenBolt(BasicBolt):
    """One bolt, two named output streams — the trident/integration_test.clj
    :145-164 split-merge shape expressed as a core-Storm component with
    declareStream (OutputFieldsDeclarer) + emit(streamId, tuple)."""

    def declare_streams(self):
        return {
            "words": (["word"], ["string"]),
            "lens": (["len"], ["bigint"]),
        }

    def execute(self, tup, collector):
        for w in tup["args"].split():
            collector.emit("words", [w])
        collector.emit("lens", [len(tup["args"])])


def test_multi_stream_bolt_split_merge(spark):
    """Golden-output port of test-split-merge: two streams from ONE bolt,
    merged downstream; ms= against the reference's expected output."""
    from storm_spark.builder import complete_topology

    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    builder.set_spout("args", spark.createDataFrame([("the man",)], "args string"))
    builder.set_bolt("split", SplitLenBolt()).shuffle_grouping("args")

    words = builder.stream("split", "words")
    lens = builder.stream("split", "lens")
    # merge narrows types to string (documented dynamic-typing narrowing)
    merged = lens.with_column("v", "cast(len as string)").project(["v"]).merge(
        words.with_column("v", "cast(word as string)").project(["v"])
    )
    got = sorted(r.v for r in merged.df.collect())
    # reference expectation: (ms= [[7] ["the"] ["man"]])
    assert got == sorted(["7", "the", "man"])


def test_multi_stream_bolt_wiring_and_capture(spark):
    """Downstream bolts subscribe to named streams via grouping(stream_id);
    complete_topology captures each stream separately (read-tuples parity)."""
    from storm_spark.builder import complete_topology

    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    builder.set_spout("args", spark.createDataFrame([("a bb",), ("ccc",)], "args string"))
    builder.set_bolt("split", SplitLenBolt()).shuffle_grouping("args")
    builder.set_bolt("count", WordCounterBolt()).fields_grouping(
        "split", ["word"], stream_id="words"
    )

    results = complete_topology(builder)
    assert results["split:words"] == [("a",), ("bb",), ("ccc",)]
    assert results["split:lens"] == [(3,), (4,)]
    assert sorted(results["count"]) == [("a", 1), ("bb", 1), ("ccc", 1)]


def test_emit_to_undeclared_stream_raises(spark):
    class BadBolt(BasicBolt):
        out_fields = ["x"]
        out_types = ["string"]

        def execute(self, tup, collector):
            collector.emit("nope", ["v"])

    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    builder.set_spout("s", spark.createDataFrame([("a",)], "x string"))
    builder.set_bolt("bad", BadBolt()).shuffle_grouping("s")
    with pytest.raises(Exception, match="undeclared"):
        builder.stream("bad").df.collect()
