"""Core-Storm TopologyBuilder facade — the record-at-a-time API surface.

Parity: ``backtype/storm/topology/TopologyBuilder.java:90-341`` +
``InputDeclarer`` groupings (``InputDeclarer.java:26-51``) and the
``IBasicBolt`` contract (``topology/IBasicBolt.java:24-32``: ``prepare``,
``execute(tuple) -> emit``, ``declareOutputFields``). A reference user's

    builder.setSpout("words", spout)
    builder.setBolt("count", CountBolt(), 4).fieldsGrouping("words", ["word"])

carries over verb-for-verb. Execution is NOT record-at-a-time: each bolt
compiles onto the Trident-layer :class:`~storm_spark.stream.Stream` (bolts
with expression forms stay JVM-side; python bolts run Arrow-batched), and
groupings become repartitions — semantics preserved, physics replaced
(SURVEY §3.2: the record-at-a-time runtime is what Spark replaces wholesale).

Bolts declare replacement output fields (like TestWordCounter: in ``word`` →
out ``word, count``), unlike Trident functions which append.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame

from storm_spark.operations.base import TridentCollector, TridentTuple
from storm_spark.stream import Stream
from storm_spark.topology import FeederSource, Topology


class BasicBolt:
    """Parity: ``IBasicBolt.java:24-32``. Implement ``execute``; emit 0..n
    output rows per input tuple via the collector. ``out_fields`` and
    ``out_types`` declare the bolt's (replacement) output schema —
    ``declareOutputFields`` in the reference."""

    out_fields: list[str] = []
    out_types: list[str] = []

    def prepare(self) -> None:
        pass

    def execute(self, tup: TridentTuple, collector: TridentCollector) -> None:
        raise NotImplementedError


class _BoltDeclarer:
    """Parity: ``InputDeclarer.java:26-51`` — grouping declaration, fluent."""

    def __init__(self, builder: "TopologyBuilder", bolt_id: str):
        self._builder = builder
        self._bolt_id = bolt_id

    def _wire(self, source_id: str, grouping: tuple) -> "_BoltDeclarer":
        self._builder._inputs[self._bolt_id].append((source_id, grouping))
        return self

    def shuffle_grouping(self, source_id: str) -> "_BoltDeclarer":
        return self._wire(source_id, ("shuffle",))

    def fields_grouping(self, source_id: str, fields: Sequence[str]) -> "_BoltDeclarer":
        return self._wire(source_id, ("fields", list(fields)))

    def global_grouping(self, source_id: str) -> "_BoltDeclarer":
        return self._wire(source_id, ("global",))

    def all_grouping(self, source_id: str) -> "_BoltDeclarer":
        # replicate-to-all is a physical concern in the reference; per-batch
        # semantics are identical to a single consumer seeing every tuple
        return self._wire(source_id, ("all",))

    def none_grouping(self, source_id: str) -> "_BoltDeclarer":
        return self._wire(source_id, ("shuffle",))

    def local_or_shuffle_grouping(self, source_id: str) -> "_BoltDeclarer":
        return self._wire(source_id, ("shuffle",))


class TopologyBuilder:
    """Parity: ``TopologyBuilder.java:90-341``; compiles to Stream plans."""

    def __init__(self, topology: Topology):
        self._topology = topology
        self._spouts: dict[str, Stream] = {}
        self._bolts: dict[str, BasicBolt] = {}
        self._inputs: dict[str, list[tuple[str, tuple]]] = {}
        self._order: list[str] = []

    def set_spout(self, spout_id: str, source: FeederSource | DataFrame) -> None:
        self._spouts[spout_id] = self._topology.new_stream(spout_id, source)

    def set_bolt(self, bolt_id: str, bolt: BasicBolt, parallelism: int = 1) -> _BoltDeclarer:
        """``parallelism`` is accepted for API parity; Spark's scheduler owns
        task counts (SURVEY §4 row 7)."""
        self._bolts[bolt_id] = bolt
        self._inputs[bolt_id] = []
        self._order.append(bolt_id)
        return _BoltDeclarer(self, bolt_id)

    def stream(self, component_id: str) -> Stream:
        """The compiled output Stream of a spout or bolt."""
        if component_id in self._spouts:
            return self._spouts[component_id]
        if component_id not in self._bolts:
            raise KeyError(f"unknown component {component_id!r}")
        return self._compile_bolt(component_id)

    def _compile_bolt(self, bolt_id: str) -> Stream:
        bolt = self._bolts[bolt_id]
        wires = self._inputs[bolt_id]
        if not wires:
            raise ValueError(f"bolt {bolt_id!r} has no inputs")
        upstreams = []
        for source_id, grouping in wires:
            s = self.stream(source_id)
            kind = grouping[0]
            if kind == "fields":
                s = s.partition_by(grouping[1])
            elif kind == "global":
                s = s.global_()
            # shuffle/all: no repartition needed for per-batch semantics
            upstreams.append(s)
        merged = upstreams[0] if len(upstreams) == 1 else upstreams[0].merge(*upstreams[1:])
        return _run_bolt(merged, bolt)


def complete_topology(
    builder: TopologyBuilder, mocked_sources: dict[str, list[list]] | None = None
) -> dict[str, list[tuple]]:
    """Run every component to completion and capture every output stream —
    parity: ``testing.clj:436-497`` (``complete-topology`` + ``read-tuples``:
    mock the spouts with literal tuples, run, read all streams). Compare
    results with multiset semantics (``ms=`` ⇒ sorted-rows equality).

    ``mocked_sources`` maps spout id -> literal rows, replacing that spout's
    frame (the ``FixedTupleSpout`` mock). Returns component id -> rows.
    """
    if mocked_sources:
        for sid, rows in mocked_sources.items():
            if sid not in builder._spouts:
                raise KeyError(f"unknown spout {sid!r}")
            orig = builder._spouts[sid]
            spark = builder._topology.spark
            df = spark.createDataFrame([tuple(r) for r in rows], orig.build().schema)
            builder._spouts[sid] = builder._topology.new_stream(sid, df)
    out: dict[str, list[tuple]] = {}
    for sid in builder._spouts:
        out[sid] = sorted(map(tuple, builder.stream(sid).df.collect()))
    for bid in builder._order:
        out[bid] = sorted(map(tuple, builder.stream(bid).df.collect()))
    return out


def _run_bolt(stream: Stream, bolt: BasicBolt) -> Stream:
    """Execute a BasicBolt over the stream: Arrow-batched, output fields
    REPLACE the input fields (core-Storm contract, unlike Trident append)."""
    from pyspark.sql.types import StructType

    from storm_spark.stream import Context, _parse_ddl

    out_fields = list(bolt.out_fields)
    out_schema = StructType()
    for n, t in zip(out_fields, bolt.out_types):
        out_schema = out_schema.add(n, _parse_ddl(t))
    in_fields = list(stream.fields)

    def build(ctx: Context) -> DataFrame:
        import pandas as pd

        df = stream._build(ctx)
        idx = {f: i for i, f in enumerate(in_fields)}

        def run(batches):
            bolt.prepare()
            for pdf in batches:
                coll = TridentCollector()
                for row in pdf[in_fields].itertuples(index=False, name=None):
                    bolt.execute(TridentTuple(list(row), idx), coll)
                yield pd.DataFrame(coll.rows, columns=out_fields)

        return df.mapInPandas(run, out_schema)

    return Stream(stream._topology, build, out_fields, "bolt")
