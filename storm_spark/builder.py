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

    def execute(self, tup: TridentTuple, collector: "BoltCollector") -> None:
        raise NotImplementedError

    def declare_streams(self) -> dict[str, tuple[list[str], list[str]]]:
        """Declare the bolt's named output streams: ``{stream_id: (fields,
        types)}`` — parity: ``OutputFieldsDeclarer.declareStream`` (thrift
        ``StreamInfo``; components may emit several named streams,
        ``storm.thrift``). Default: one ``'default'`` stream from
        ``out_fields``/``out_types`` (``declareOutputFields``)."""
        return {"default": (list(self.out_fields), list(self.out_types))}


class BoltCollector(TridentCollector):
    """Collector with named-stream emits — parity:
    ``BasicOutputCollector.emit(tuple)`` / ``emit(streamId, tuple)``
    (``topology/BasicOutputCollector.java:30-40``)."""

    def __init__(self):
        super().__init__()
        self.by_stream: dict[str, list[list]] = {}

    def emit(self, values_or_stream, values=None) -> None:
        """``emit(values)`` → the 'default' stream;
        ``emit(stream_id, values)`` → that named stream."""
        if values is None:
            sid, vals = "default", values_or_stream
        else:
            sid, vals = values_or_stream, values
        self.by_stream.setdefault(sid, []).append(list(vals))
        if sid == "default":
            self.rows.append(list(vals))


class _BoltDeclarer:
    """Parity: ``InputDeclarer.java:26-51`` — grouping declaration, fluent.
    Every grouping takes an optional ``stream_id`` to subscribe to a named
    output stream of the source component (the reference's two-arg
    overloads, e.g. ``shuffleGrouping(componentId, streamId)``)."""

    def __init__(self, builder: "TopologyBuilder", bolt_id: str):
        self._builder = builder
        self._bolt_id = bolt_id

    def _wire(self, source_id: str, stream_id: str, grouping: tuple) -> "_BoltDeclarer":
        self._builder._inputs[self._bolt_id].append((source_id, stream_id, grouping))
        return self

    def shuffle_grouping(self, source_id: str, stream_id: str = "default") -> "_BoltDeclarer":
        return self._wire(source_id, stream_id, ("shuffle",))

    def fields_grouping(
        self, source_id: str, fields: Sequence[str], stream_id: str = "default"
    ) -> "_BoltDeclarer":
        return self._wire(source_id, stream_id, ("fields", list(fields)))

    def global_grouping(self, source_id: str, stream_id: str = "default") -> "_BoltDeclarer":
        return self._wire(source_id, stream_id, ("global",))

    def all_grouping(self, source_id: str, stream_id: str = "default") -> "_BoltDeclarer":
        # replicate-to-all is a physical concern in the reference; per-batch
        # semantics are identical to a single consumer seeing every tuple
        return self._wire(source_id, stream_id, ("all",))

    def none_grouping(self, source_id: str, stream_id: str = "default") -> "_BoltDeclarer":
        return self._wire(source_id, stream_id, ("shuffle",))

    def local_or_shuffle_grouping(self, source_id: str, stream_id: str = "default") -> "_BoltDeclarer":
        return self._wire(source_id, stream_id, ("shuffle",))


class TopologyBuilder:
    """Parity: ``TopologyBuilder.java:90-341``; compiles to Stream plans."""

    def __init__(self, topology: Topology):
        self._topology = topology
        self._spouts: dict[str, Stream] = {}
        self._bolts: dict[str, BasicBolt] = {}
        self._inputs: dict[str, list[tuple[str, str, tuple]]] = {}
        self._order: list[str] = []
        self._compiled: dict[str, dict[str, Stream]] = {}

    def set_spout(self, spout_id: str, source: FeederSource | DataFrame) -> None:
        self._spouts[spout_id] = self._topology.new_stream(spout_id, source)

    def set_bolt(self, bolt_id: str, bolt: BasicBolt, parallelism: int = 1) -> _BoltDeclarer:
        """``parallelism`` is accepted for API parity; Spark's scheduler owns
        task counts (SURVEY §4 row 7)."""
        self._bolts[bolt_id] = bolt
        self._inputs[bolt_id] = []
        self._order.append(bolt_id)
        return _BoltDeclarer(self, bolt_id)

    def stream(self, component_id: str, stream_id: str = "default") -> Stream:
        """The compiled output Stream of a spout or bolt — ``stream_id``
        selects a named output stream (``declareStream``/``emit(streamId)``)."""
        if component_id in self._spouts:
            if stream_id != "default":
                raise KeyError(f"spout {component_id!r} has only the default stream")
            return self._spouts[component_id]
        if component_id not in self._bolts:
            raise KeyError(f"unknown component {component_id!r}")
        streams = self._compile_bolt(component_id)
        if stream_id not in streams:
            raise KeyError(
                f"component {component_id!r} declares streams {sorted(streams)}; "
                f"no stream {stream_id!r}"
            )
        return streams[stream_id]

    def _compile_bolt(self, bolt_id: str) -> dict[str, Stream]:
        if bolt_id in self._compiled:
            return self._compiled[bolt_id]
        bolt = self._bolts[bolt_id]
        wires = self._inputs[bolt_id]
        if not wires:
            raise ValueError(f"bolt {bolt_id!r} has no inputs")
        upstreams = []
        for source_id, stream_id, grouping in wires:
            s = self.stream(source_id, stream_id)
            kind = grouping[0]
            if kind == "fields":
                s = s.partition_by(grouping[1])
            elif kind == "global":
                s = s.global_()
            # shuffle/all: no repartition needed for per-batch semantics
            upstreams.append(s)
        merged = upstreams[0] if len(upstreams) == 1 else upstreams[0].merge(*upstreams[1:])
        self._compiled[bolt_id] = _run_bolt(merged, bolt)
        return self._compiled[bolt_id]


def _none_safe(t: tuple):
    """Sort key tolerating None alongside values (None sorts first; mixed
    types compare by string) — nullable bolt outputs must not crash the
    multiset comparison harness."""
    return tuple((v is None, str(v)) for v in t)


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
    # ONE shared Context for every stream read: multi-stream bolts memoize
    # their tagged subtree per Context, so sharing it (plus the persist in
    # _run_bolt) means each bolt kernel executes once no matter how many of
    # its output streams are captured — reference parity (`complete-topology`
    # runs the topology once and reads all streams from that run).
    from storm_spark.stream import Context

    ctx = Context(builder._topology.spark)
    try:
        out: dict[str, list[tuple]] = {}
        for sid in builder._spouts:
            out[sid] = sorted(
                map(tuple, builder.stream(sid).build(ctx).collect()), key=_none_safe
            )
        for bid in builder._order:
            # read-tuples parity: the default stream under the component id,
            # named streams under "component:stream"
            for sid in builder._bolts[bid].declare_streams():
                key = bid if sid == "default" else f"{bid}:{sid}"
                out[key] = sorted(
                    map(tuple, builder.stream(bid, sid).build(ctx).collect()),
                    key=_none_safe,
                )
        return out
    finally:
        ctx.release()


def _run_bolt(stream: Stream, bolt: BasicBolt) -> dict[str, Stream]:
    """Execute a BasicBolt over the stream: Arrow-batched, output fields
    REPLACE the input fields (core-Storm contract, unlike Trident append).
    Returns ``{stream_id: Stream}`` — one entry per declared output stream.

    Multi-stream bolts run ONE kernel emitting a tagged union (a typed
    struct column per stream); each named Stream filters its tag and
    unnests its struct. Consumers of several streams of one bolt share the
    tagged subtree (memoized per Context build)."""
    import weakref

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from storm_spark.stream import Context, _parse_ddl

    decl = bolt.declare_streams()
    in_fields = list(stream.fields)

    if set(decl) == {"default"}:
        out_fields, out_types = decl["default"]
        out_schema = StructType()
        for n, t in zip(out_fields, out_types):
            out_schema = out_schema.add(n, _parse_ddl(t))

        def build(ctx: Context) -> DataFrame:
            import pandas as pd

            df = stream._build(ctx)
            idx = {f: i for i, f in enumerate(in_fields)}

            def run(batches):
                bolt.prepare()
                for pdf in batches:
                    coll = BoltCollector()
                    for row in pdf[in_fields].itertuples(index=False, name=None):
                        bolt.execute(TridentTuple(list(row), idx), coll)
                    bad = set(coll.by_stream) - {"default"}
                    if bad:
                        raise KeyError(f"bolt emitted to undeclared streams {sorted(bad)}")
                    yield pd.DataFrame(coll.rows, columns=out_fields)

            return df.mapInPandas(run, out_schema)

        return {"default": Stream(stream._topology, build, out_fields, "bolt")}

    # multi-stream: __sid__ tag + one struct column per declared stream
    sids = list(decl)
    struct_types = {}
    tagged_schema = StructType().add("__sid__", _parse_ddl("string"))
    for sid in sids:
        fields_l, types_l = decl[sid]
        st = StructType()
        for n, t in zip(fields_l, types_l):
            st = st.add(n, _parse_ddl(t))
        struct_types[sid] = st
        tagged_schema = tagged_schema.add(f"__p_{sid}__", st)

    cache: "weakref.WeakKeyDictionary[Context, DataFrame]" = weakref.WeakKeyDictionary()

    def tagged_build(ctx: Context) -> DataFrame:
        import pandas as pd

        if ctx in cache:
            return cache[ctx]
        df = stream._build(ctx)
        idx = {f: i for i, f in enumerate(in_fields)}

        def run(batches):
            bolt.prepare()
            for pdf in batches:
                coll = BoltCollector()
                for row in pdf[in_fields].itertuples(index=False, name=None):
                    bolt.execute(TridentTuple(list(row), idx), coll)
                bad = set(coll.by_stream) - set(sids)
                if bad:
                    raise KeyError(f"bolt emitted to undeclared streams {sorted(bad)}")
                out_rows = []
                for sid in sids:
                    fields_l, _ = decl[sid]
                    for vals in coll.by_stream.get(sid, []):
                        row_d = {"__sid__": sid}
                        for other in sids:
                            row_d[f"__p_{other}__"] = (
                                dict(zip(fields_l, vals)) if other == sid else None
                            )
                        out_rows.append(row_d)
                yield pd.DataFrame(
                    out_rows, columns=["__sid__"] + [f"__p_{s}__" for s in sids]
                )

        # persist: every consumed output stream runs its own action over
        # this subtree — without a cache each action would re-execute the
        # Python bolt, and a stateful/nondeterministic bolt could emit
        # mutually inconsistent named streams (the reference executes the
        # bolt once). Released on ctx.release().
        tagged = ctx.register_persist(df.mapInPandas(run, tagged_schema))
        cache[ctx] = tagged
        return tagged

    out: dict[str, Stream] = {}
    for sid in sids:
        fields_l, _ = decl[sid]

        def build_sid(ctx: Context, _sid=sid, _fields=fields_l) -> DataFrame:
            return (
                tagged_build(ctx)
                .filter(F.col("__sid__") == _sid)
                .select(*[F.col(f"__p_{_sid}__.{f}").alias(f) for f in _fields])
            )

        out[sid] = Stream(stream._topology, build_sid, fields_l, f"bolt:{sid}")
    return out
