"""Golden-output ports of the reference's Trident integration tests.

Source: ``storm-core/test/clj/storm/trident/integration_test.clj`` — same
inputs, same expected multisets (``t/ms=`` == order-insensitive compare).
"""

import pytest

from storm_spark import FeederSource, LocalCluster, Topology
from storm_spark.operations import (
    Count,
    FilterNull,
    MapGet,
    Split,
    StringLength,
    Sum,
    TrueFilter,
    TupleCollectionGet,
)
from storm_spark.operations.base import Aggregator, TridentCollector
from storm_spark.state import MemoryMapState


class CountAsAggregator(Aggregator):
    """Parity: ``trident/testing/CountAsAggregator.java:26``."""

    out_types = ["bigint"]

    def init(self, batch_id, collector):
        return {"count": 0}

    def aggregate(self, state, tup, collector):
        state["count"] += 1

    def complete(self, state, collector):
        collector.emit([state["count"]])


def _ms(rows):
    return sorted(tuple(r) for r in rows)


def test_word_count(spark):
    # integration_test.clj:55-84
    topo = Topology(spark)
    feeder = FeederSource(["sentence"])
    word_counts = (
        topo.new_stream("tester", feeder)
        .each(["sentence"], Split(), ["word"])
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    (
        topo.new_drpc_stream("words")
        .each(["args"], Split(), ["word"])
        .group_by(["word"])
        .state_query(word_counts, ["word"], MapGet(), ["count"])
        .aggregate(["count"], Sum("bigint"), ["sum"])
        .project(["sum"])
    )
    cluster = LocalCluster(topo)
    feeder.feed([["hello the man said"], ["the"]])
    assert cluster.execute_drpc("words", "the") == [[2]]
    assert cluster.execute_drpc("words", "hello") == [[1]]
    feeder.feed([["the man on the moon"], ["where are you"]])
    assert cluster.execute_drpc("words", "the") == [[4]]
    assert cluster.execute_drpc("words", "man") == [[2]]
    assert cluster.execute_drpc("words", "man where you the") == [[8]]


def test_memory_map_get_tuples(spark):
    # integration_test.clj:28-53 (state scan via TupleCollectionGet)
    topo = Topology(spark)
    feeder = FeederSource(["sentence"])
    word_counts = (
        topo.new_stream("tester", feeder)
        .each(["sentence"], Split(), ["word"])
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    (
        topo.new_drpc_stream("all-tuples")
        .broadcast()
        .state_query(word_counts, None, TupleCollectionGet(), ["word", "count"])
        .project(["word", "count"])
    )
    cluster = LocalCluster(topo)
    feeder.feed([["hello the man said"], ["the"]])
    assert set(map(tuple, cluster.execute_drpc("all-tuples", "man"))) == {
        ("hello", 1),
        ("said", 1),
        ("the", 2),
        ("man", 1),
    }
    feeder.feed([["the foo"]])
    assert set(map(tuple, cluster.execute_drpc("all-tuples", "man"))) == {
        ("hello", 1),
        ("said", 1),
        ("the", 3),
        ("man", 1),
        ("foo", 1),
    }


def test_count_agg(spark):
    # integration_test.clj:127-143 (general Aggregator, incl. empty batch)
    topo = Topology(spark)
    (
        topo.new_drpc_stream("numwords")
        .each(["args"], Split(), ["word"])
        .aggregate(CountAsAggregator(), ["count"])
        .project(["count"])
    )
    cluster = LocalCluster(topo)
    assert cluster.execute_drpc("numwords", "the") == [[1]]
    assert cluster.execute_drpc("numwords", "") == [[0]]
    assert cluster.execute_drpc("numwords", "1 2 3 4 5 6 7 8") == [[8]]


def test_split_merge(spark):
    # integration_test.clj:145-164
    topo = Topology(spark)
    drpc_stream = topo.new_drpc_stream("splitter")
    s1 = drpc_stream.each(["args"], Split(), ["word"]).project(["word"])
    s2 = drpc_stream.each(["args"], StringLength(), ["len"]).project(["len"])
    topo._register_drpc_terminal("splitter", topo.merge(s1, s2))
    cluster = LocalCluster(topo)
    assert _ms(cluster.execute_drpc("splitter", "the man")) == _ms([["7"], ["the"], ["man"]]) or _ms(
        cluster.execute_drpc("splitter", "the man")
    ) == _ms([[7], ["the"], ["man"]])


def test_multiple_groupings_same_stream(spark):
    # integration_test.clj:166-186
    topo = Topology(spark)
    drpc_stream = topo.new_drpc_stream("tester").each(["args"], TrueFilter())
    s1 = drpc_stream.group_by(["args"]).aggregate(CountAsAggregator(), ["count"])
    s2 = drpc_stream.group_by(["args"]).aggregate(CountAsAggregator(), ["count"])
    topo._register_drpc_terminal("tester", topo.merge(s1, s2))
    cluster = LocalCluster(topo)
    assert _ms(cluster.execute_drpc("tester", "the")) == _ms([["the", 1], ["the", 1]])
    assert _ms(cluster.execute_drpc("tester", "aaaaa")) == _ms([["aaaaa", 1], ["aaaaa", 1]])


def test_multi_repartition(spark):
    # integration_test.clj:188-202
    topo = Topology(spark)
    (
        topo.new_drpc_stream("tester")
        .each(["args"], Split(), ["word"])
        .shuffle()
        .shuffle()
        .aggregate(CountAsAggregator(), ["count"])
    )
    cluster = LocalCluster(topo)
    assert _ms(cluster.execute_drpc("tester", "the man")) == _ms([[2]])
    assert _ms(cluster.execute_drpc("tester", "aaa")) == _ms([[1]])


def test_stream_projection_validation(spark):
    # integration_test.clj:204-271 — eager field validation errors
    topo = Topology(spark)
    feeder = FeederSource(["sentence"])
    stream = topo.new_stream("tester", feeder)
    with pytest.raises(ValueError):
        stream.each(["sentence1"], Split(), ["word"])
    with pytest.raises(ValueError):
        stream.each(["sentence"], Split(), ["word"]).group_by(["word1"])
    with pytest.raises(ValueError):
        stream.each(["sentence"], Split(), ["word"]).group_by(["word"]).aggregate(
            ["word1"], Count(), ["count"]
        )
    with pytest.raises(ValueError):
        stream.project(["sentence1"])
    with pytest.raises(ValueError):
        stream.partition_by(["sentence1"])
    with pytest.raises(ValueError):
        stream.each(["sentence"], Split(), ["word"]).partition_aggregate(
            ["word1"], Count(), ["count"]
        )
    word_counts = (
        stream.each(["sentence"], Split(), ["word"])
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    with pytest.raises(ValueError):
        (
            topo.new_drpc_stream("words")
            .each(["args"], Split(), ["word"])
            .group_by(["word"])
            .state_query(word_counts, ["word1"], MapGet(), ["count"])
        )


def test_word_count_filter_null(spark):
    """FilterNull drops missing-key lookups (builtin filter coverage)."""
    topo = Topology(spark)
    feeder = FeederSource(["sentence"])
    word_counts = (
        topo.new_stream("tester", feeder)
        .each(["sentence"], Split(), ["word"])
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    (
        topo.new_drpc_stream("words")
        .each(["args"], Split(), ["word"])
        .group_by(["word"])
        .state_query(word_counts, ["word"], MapGet(), ["count"])
        .each(["count"], FilterNull())
        .aggregate(["count"], Sum("bigint"), ["sum"])
    )
    cluster = LocalCluster(topo)
    feeder.feed([["hello the man said"], ["the"]])
    assert cluster.execute_drpc("words", "the nosuchword") == [[2]]


def test_drpc_multiple_functions_and_requests(spark):
    """drpc_test.clj parity: several functions registered on one topology,
    repeated requests with different args, results independent."""
    from pyspark.sql import functions as F

    from storm_spark import FeederSource, LocalCluster, Topology
    from storm_spark.operations import Count, MapGet, Split
    from storm_spark.state import MemoryMapState

    topo = Topology(spark)
    feeder = FeederSource(["sentence"])
    wc = (
        topo.new_stream("s", feeder)
        .each(["sentence"], Split(), ["word"])
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    # fn 1: per-word counts
    (
        topo.new_drpc_stream("counts")
        .each(["args"], Split(), ["word"])
        .state_query(wc, ["word"], MapGet(), ["count"])
        .project(["word", "count"])
    )
    # fn 2: echo the args uppercased (no state)
    topo.new_drpc_stream("shout").with_column("loud", F.upper(F.col("args"))).project(["loud"])

    cluster = LocalCluster(topo)
    feeder.feed([["the cat and the hat"], ["the dog"]])

    got = dict(cluster.execute_drpc("counts", "the dog emu"))
    assert got == {"the": 3, "dog": 1, "emu": None}
    assert cluster.execute_drpc("shout", "hello") == [["HELLO"]]
    # repeated requests are independent and repeatable
    assert dict(cluster.execute_drpc("counts", "cat")) == {"cat": 1}
    assert dict(cluster.execute_drpc("counts", "cat")) == {"cat": 1}


def test_new_values_stream_emits_only_updated_keys(spark):
    """Parity: TridentState.newValuesStream — only the batch's touched keys."""
    from storm_spark import FeederSource, LocalCluster, Topology
    from storm_spark.operations import Count, Split
    from storm_spark.state import MemoryMapState

    topo = Topology(spark)
    feeder = FeederSource(["sentence"])
    wc = (
        topo.new_stream("s", feeder)
        .each(["sentence"], Split(), ["word"])
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    cluster = LocalCluster(topo)
    feeder.feed([["a b"]])
    assert sorted(map(tuple, wc.new_values_stream().df.collect())) == [("a", 1), ("b", 1)]
    feeder.feed([["b c"]])
    # only b and c were touched by batch 2 (with their NEW running counts)
    assert sorted(map(tuple, wc.new_values_stream().df.collect())) == [("b", 2), ("c", 1)]
    # the full state still holds all three
    assert sorted(map(tuple, wc.dataframe().collect())) == [("a", 1), ("b", 2), ("c", 1)]
