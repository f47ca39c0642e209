"""Topology — stream wiring, persistent state registration, DRPC, joins.

Parity: ``storm/trident/TridentTopology.java``. The reference compiles its
node graph into bolts wired by groupings; here every stream is a deferred
DataFrame plan and Catalyst does the compiling (operator fusion = whole-stage
codegen, exchange insertion = EnsureRequirements — see SURVEY §4).

:class:`LocalCluster` replaces the in-process simulated cluster
(``clj/backtype/storm/LocalCluster.clj`` + ``testing.clj:complete-topology``):
feeding a batch runs every registered state update exactly once under a new
txid with 2-phase begin/commit ordering (parity:
``MasterBatchCoordinator.java:121-180``).
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.fields import as_field_list
from storm_spark.operations.base import (
    CombinerAggregator,
    ReducerAggregator,
    ReducerStateAgg,
    TridentCollector,
    TridentTuple,
)
from storm_spark.operations.builtin import (
    MapGet,
    QueryFunction,
    SnapshotGet,
    TupleCollectionGet,
)
from storm_spark.stream import Context, Stream, _parse_ddl

SNAPSHOT_KEY = "__skey__"


class FeederSource:
    """Test-fixture source fed literal tuples.

    Parity: ``trident/testing/FeederBatchSpout.java:35`` /
    ``FixedBatchSpout.java:33-66``. Each ``feed`` is one micro-batch.
    """

    _ids = itertools.count()

    def __init__(self, fields: Sequence[str], types: Sequence[str] | None = None):
        self.fields = list(fields)
        self.types = list(types) if types else ["string"] * len(self.fields)
        self.id = f"feeder-{next(self._ids)}"
        self._cluster: "LocalCluster | None" = None

    def schema(self) -> StructType:
        s = StructType()
        for n, t in zip(self.fields, self.types):
            s = s.add(n, _parse_ddl(t))
        return s

    def feed(self, rows: Sequence[Sequence[Any]]) -> None:
        if self._cluster is None:
            raise RuntimeError("attach the topology to a LocalCluster before feeding")
        self._cluster.feed(self, rows)

    def encode_rows(self, rows: Sequence[Sequence[Any]]) -> list[list[Any]]:
        """Encode ``object``-typed columns via the global encoder registry
        (Kryo analogue — serialization.py). No-op when no field is typed
        ``object``."""
        from storm_spark.serialization import encode_rows

        return encode_rows(rows, self.types)


class _StateSpec:
    def __init__(self, stream, keys, in_fields, agg, state, value_field, updater=None):
        self.stream = stream
        self.keys = keys
        self.in_fields = in_fields
        self.agg = agg
        self.state = state
        self.value_field = value_field
        self.updater = updater  # partition_persist path
        #: keys touched by the most recent batch (newValuesStream narrowing)
        self.last_touched_keys = None


class _CompositeStateAgg:
    """Adapter exposing an aggregator's composite-state hooks (``state_*``,
    e.g. Avg's Sum+Count struct) under the plain CombinerAggregator surface
    the state backends consume."""

    def __init__(self, agg):
        self._agg = agg
        self.value_type = agg.state_value_type

    def zero_expr(self):
        return self._agg.state_zero_expr()

    def combine_expr(self, a, b):
        return self._agg.state_combine_expr(a, b)

    def zero(self):
        return self._agg.state_zero()

    def combine(self, a, b):
        return self._agg.state_combine(a, b)


class TridentState:
    """Handle to a persistent, queryable state (parity: ``trident/TridentState.java``)."""

    def __init__(self, topology: "Topology", spec: _StateSpec, snapshot: bool):
        self._topology = topology
        self._spec = spec
        self._snapshot = snapshot

    @property
    def state(self):
        return self._spec.state

    def _read_df(self) -> DataFrame:
        """State table with composite values FINISHED to the user-facing
        value (e.g. Avg's struct<s,c> → s/c); key columns intact."""
        df = self._spec.state.dataframe(self._topology.spark)
        finish = getattr(self._spec.agg, "finish_expr", None)
        if finish is not None:
            vf = self._spec.value_field
            df = df.withColumn(vf, finish(F.col(vf)))
        return df

    def dataframe(self) -> DataFrame:
        df = self._read_df()
        if self._snapshot:
            df = df.drop(SNAPSHOT_KEY)
        return df

    def new_values_stream(self) -> Stream:
        """Stream of the rows UPDATED by the most recent batch (keys + new
        value) — parity: ``TridentState.newValuesStream``. Before any batch
        runs, this is the (empty) full state."""
        fields = ([] if self._snapshot else list(self._spec.keys)) + [self._spec.value_field]

        def build(ctx) -> DataFrame:
            df = self.dataframe()
            touched = self._spec.last_touched_keys
            if touched is not None and not self._snapshot:
                df = df.join(F.broadcast(touched), on=self._spec.keys, how="left_semi")
            return df

        return Stream(self._topology, build, fields, "state-values")

    # join implementation behind Stream.state_query
    def _query(self, ctx, df: DataFrame, in_fields: list[str], query_fn: QueryFunction, out_fields: list[str]) -> DataFrame:
        sdf = self._read_df()
        keys = self._spec.keys if not self._snapshot else []
        value_field = self._spec.value_field
        if isinstance(query_fn, MapGet):
            if len(in_fields) != len(keys):
                raise ValueError(f"MapGet needs {len(keys)} key fields, got {in_fields}")
            # rename state cols to avoid collisions; left join = null for misses
            renamed = sdf.select(
                *[F.col(k).alias(f"__sk_{i}__") for i, k in enumerate(keys)],
                F.col(value_field).alias(out_fields[0]),
            )
            cond = None
            for i, f in enumerate(in_fields):
                c = df[f].eqNullSafe(renamed[f"__sk_{i}__"])
                cond = c if cond is None else (cond & c)
            return df.join(renamed, cond, "left").drop(
                *[f"__sk_{i}__" for i in range(len(keys))]
            )
        if isinstance(query_fn, SnapshotGet):
            # reference parity: an empty (never-updated) snapshot emits the
            # null snapshot value, not zero rows — union a null fallback row
            # and keep the real row when one exists (flag-ordered limit 1)
            real = sdf.select(
                F.col(value_field).alias(out_fields[0]), F.lit(0).alias("__fb__")
            )
            vtype = real.schema[out_fields[0]].dataType.simpleString()
            fallback = sdf.sparkSession.sql(
                f"SELECT CAST(NULL AS {vtype}) AS {out_fields[0]}, 1 AS __fb__"
            )
            one = (
                real.unionByName(fallback).orderBy("__fb__").limit(1).drop("__fb__")
            )
            return df.crossJoin(F.broadcast(one))
        if isinstance(query_fn, TupleCollectionGet):
            cols = ([] if self._snapshot else list(keys)) + [value_field]
            if len(out_fields) != len(cols):
                raise ValueError(f"TupleCollectionGet emits {cols}; need {len(cols)} out fields")
            scan = sdf.select(*[F.col(c).alias(o) for c, o in zip(cols, out_fields)])
            return df.crossJoin(scan)
        raise TypeError(f"unsupported query function: {type(query_fn)}")


class Topology:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sources: dict[str, FeederSource] = {}
        self._state_specs: list[_StateSpec] = []
        self._drpc: dict[str, Stream] = {}

    # -- sources ------------------------------------------------------------

    def new_stream(self, name: str, source) -> Stream:
        """Parity: ``TridentTopology.newStream``. ``source`` may be a
        FeederSource (micro-batch fixture), a DataFrame, or a parquet path."""
        if isinstance(source, FeederSource):
            self._sources[source.id] = source
            schema = source.schema()

            def build(ctx: Context) -> DataFrame:
                df = ctx.bindings.get(source.id)
                return df if df is not None else self.spark.createDataFrame([], schema)

            return Stream(self, build, source.fields, name)
        if isinstance(source, DataFrame):
            return Stream(self, lambda ctx: source, source.columns, name)
        if isinstance(source, str):
            df = self.spark.read.parquet(source)
            return Stream(self, lambda ctx: df, df.columns, name)
        raise TypeError(f"unsupported source: {type(source)}")

    def new_drpc_stream(self, function: str) -> Stream:
        """Parity: ``TridentTopology.java:135-157`` — a one-row stream of
        ``[args]`` per request; the terminal stream of the chain is what
        ``execute_drpc`` runs (ReturnResults routing is implicit: results are
        collected back to the caller)."""
        binding = f"__drpc__:{function}"

        def build(ctx: Context) -> DataFrame:
            df = ctx.bindings.get(binding)
            if df is None:
                return self.spark.createDataFrame([], StructType().add("args", "string"))
            return df

        s = Stream(self, build, ["args"], f"drpc:{function}")
        # every stream derived from this one (through _with, joins, merge,
        # multiReduce — see Stream._adopt_drpc) re-registers as the terminal
        s._drpc_names = (function,)
        self._register_drpc_terminal(function, s)
        return s

    def _register_drpc_terminal(self, function: str, stream: Stream) -> None:
        self._drpc[function] = stream

    # -- state registration --------------------------------------------------

    def _register_persistent_aggregate(
        self, stream: Stream, keys, in_fields, agg, out_fields, state_factory
    ) -> TridentState:
        if not isinstance(agg, (CombinerAggregator, ReducerAggregator)):
            raise NotImplementedError(
                "persistent_aggregate requires a CombinerAggregator (fast "
                "path) or ReducerAggregator (MapReducerAggStateUpdater parity)"
            )
        value_field = out_fields[0]
        snapshot = not keys
        # key schema from the upstream plan (empty-bindings build)
        up_schema = {f.name: f.dataType for f in stream.build(Context(self.spark)).schema.fields}
        ks = StructType()
        if snapshot:
            ks = ks.add(SNAPSHOT_KEY, _parse_ddl("int"))
        else:
            for k in keys:
                ks = ks.add(k, up_schema[k])
        # composite-state aggregators (e.g. Avg) store a mergeable pair, not
        # the user-facing scalar; reads finish it back (TridentState._read_df)
        state = state_factory(
            ks, value_field, getattr(agg, "state_value_type", agg.value_type)
        )
        spec = _StateSpec(stream, keys if not snapshot else [SNAPSHOT_KEY], in_fields, agg, state, value_field)
        spec.snapshot = snapshot
        self._state_specs.append(spec)
        return TridentState(self, spec, snapshot)

    def _register_partition_persist(self, stream, in_fields, updater, out_fields, state_factory) -> TridentState:
        from storm_spark.operations.base import KeyedStateUpdater

        up_fields = {f.name: f for f in stream.build(Context(self.spark)).schema.fields}
        if isinstance(updater, KeyedStateUpdater):
            # scale path: state is keyed by the updater's key fields; deltas
            # merge via the updater's CombinerAggregator
            ks = StructType([up_fields[k] for k in updater.key_fields])
            value_field = (out_fields or ["value"])[0]
            state = state_factory(ks, value_field, updater.agg.value_type)
            spec = _StateSpec(
                stream, updater.key_fields, in_fields, updater.agg, state, value_field, updater
            )
        else:
            # legacy driver-side row-at-a-time contract (test/parity path for
            # MemoryMapState fixtures only — see LocalCluster._process_spec)
            up_schema = StructType([up_fields[f] for f in in_fields])
            state = state_factory(up_schema, (out_fields or ["value"])[0], "string")
            spec = _StateSpec(stream, in_fields, in_fields, None, state, (out_fields or ["value"])[0], updater)
        spec.snapshot = False
        self._state_specs.append(spec)
        return TridentState(self, spec, False)

    # -- multi-stream --------------------------------------------------------

    def merge(self, *streams: Stream) -> Stream:
        return streams[0].merge(*streams[1:])

    def join(self, streams, join_fields, out_fields, join_type="inner") -> Stream:
        """Equi-join of N streams within the batch.

        Parity: ``TridentTopology.java:237-263`` + ``JoinerMultiReducer.java``:
        Trident joins are *per batch* (no cross-batch buffering), which in the
        engine is a plain DataFrame join of the per-batch frames — in streaming
        the join runs inside ``foreachBatch``, never a stream-stream join.
        ``join_type``: 'inner' | 'outer' | list per stream ('inner'/'outer'),
        e.g. ['inner','outer'] keeps unmatched rows of the second stream.
        """
        return join_streams(
            self, list(streams), [as_field_list(j) for j in join_fields],
            as_field_list(out_fields), join_type,
        )

    def multi_reduce_streams(self, streams, reducer, out_fields) -> Stream:
        """Ungrouped N-input operator over the whole batch.

        Parity: ``TridentTopology.java:171-204`` / ``MultiReducer.java:25-30``
        / ``MultiReducerProcessor.java:35-93`` — one reducer instance sees
        every tuple of every input stream (tagged by stream index), then
        ``complete`` emits. The reference runs this per partition after a
        repartition; a batch is the engine's unit, so the tagged union is
        processed as one group (= the reference's ``global()`` placement)."""
        out_l = as_field_list(out_fields)
        slist = list(streams)

        def build(ctx: Context) -> DataFrame:
            import pandas as pd

            # typed struct-column tagged union: each stream carries its own
            # payload struct column (others null) — Arrow moves native typed
            # structs, no per-row JSON codec anywhere
            dfs = [s._build(ctx) for s in slist]
            payload_types = [StructType(d.schema.fields.copy()) for d in dfs]
            tagged = None
            for i, (s, df) in enumerate(zip(slist, dfs)):
                cols = [F.lit(i).alias("__src__")]
                for j in range(len(slist)):
                    if j == i:
                        cols.append(F.struct(*[F.col(c) for c in s.fields]).alias(f"__p{j}__"))
                    else:
                        cols.append(F.lit(None).cast(payload_types[j]).alias(f"__p{j}__"))
                d = df.select(*cols)
                tagged = d if tagged is None else tagged.union(d)

            out_schema = StructType()
            for name, t in zip(out_l, reducer.out_types):
                out_schema = out_schema.add(name, _parse_ddl(t))
            field_orders = [list(s.fields) for s in slist]

            # hoisted per-source index maps, shared across tuples (TridentTuple
            # never mutates its field map); batch-extract the Arrow columns to
            # plain lists ONCE — per-row .iloc is ~10x slower than list walks
            idx_maps = [{f: i for i, f in enumerate(fo)} for fo in field_orders]

            def run(batches):
                coll = TridentCollector()
                state = reducer.init(coll)
                for pdf in batches:
                    srcs = pdf["__src__"].tolist()
                    payloads = [
                        pdf[f"__p{j}__"].tolist() for j in range(len(field_orders))
                    ]
                    for r, src in enumerate(srcs):
                        row = payloads[src][r]  # Arrow struct -> dict
                        fo = field_orders[src]
                        tup = TridentTuple([row[f] for f in fo], idx_maps[src])
                        reducer.execute(state, src, tup, coll)
                reducer.complete(state, coll)
                yield pd.DataFrame(coll.rows, columns=out_l)

            # single group (the reference's global() placement): the whole
            # batch through one reducer instance — an inherent one-partition
            # bound of the ungrouped MultiReducer contract
            return tagged.coalesce(1).mapInPandas(run, out_schema)

        return Stream(self, build, out_l, "multireduce")._adopt_drpc(*slist)

    def multi_reduce(self, grouped_streams, reducer, out_fields) -> Stream:
        """Keyed cogroup over N streams (what join compiles to in the
        reference). Parity: ``TridentTopology.java:206-219`` /
        ``GroupedMultiReducerExecutor.java:37-95``. Engine: tagged union +
        grouped applyInPandas."""
        from storm_spark.stream import GroupedStream

        out_l = as_field_list(out_fields)
        streams = [gs._stream for gs in grouped_streams]
        keys_list = [gs.keys for gs in grouped_streams]
        nkeys = len(keys_list[0])
        topo = self

        def build(ctx: Context) -> DataFrame:
            import pandas as pd

            # typed struct payloads per source stream (see multi_reduce_streams)
            dfs = [s._build(ctx) for s in streams]
            by_name = {f.name: f for f in dfs[0].schema.fields}
            key_schema = [by_name[k] for k in keys_list[0]]
            rest_list = [
                [c for c in df.columns if c not in ks] for df, ks in zip(dfs, keys_list)
            ]
            payload_types = [
                StructType([f for f in df.schema.fields if f.name in rest])
                for df, rest in zip(dfs, rest_list)
            ]
            tagged = None
            for i, (df, ks, rest) in enumerate(zip(dfs, keys_list, rest_list)):
                cols = [F.col(k).alias(f"__k{j}__") for j, k in enumerate(ks)]
                cols.append(F.lit(i).alias("__src__"))
                for j in range(len(streams)):
                    if j == i:
                        cols.append(F.struct(*[F.col(c) for c in rest]).alias(f"__p{j}__"))
                    else:
                        cols.append(F.lit(None).cast(payload_types[j]).alias(f"__p{j}__"))
                d = df.select(*cols)
                tagged = d if tagged is None else tagged.union(d)

            out_schema = StructType()
            for j, f in enumerate(key_schema):
                out_schema = out_schema.add(out_l[j], f.dataType)
            for name, t in zip(out_l[nkeys:], reducer.out_types):
                out_schema = out_schema.add(name, _parse_ddl(t))
            field_orders = list(rest_list)

            # Sort-based streaming cogroup instead of groupBy().applyInPandas:
            # one hash exchange on the keys + a partition-local sort, then a
            # SINGLE mapInPandas pass that walks key runs. applyInPandas pays
            # a Python callback + pandas-DataFrame construction PER GROUP —
            # with per-entity keys (millions of small groups at scale) that
            # per-group overhead dominates the reducer itself; the sorted
            # stream pays one callback per Arrow batch regardless of group
            # count. Hoisted per-source index maps are shared across tuples
            # (TridentTuple never mutates its field map).
            idx_maps = [{f: i for i, f in enumerate(fo)} for fo in field_orders]
            kcols = [f"__k{j}__" for j in range(nkeys)]
            out_cols = [f.name for f in out_schema.fields]
            nsrc = len(field_orders)

            def run_stream(batches):
                coll = TridentCollector()
                cur_key, state, out_rows = None, None, []

                def close_key():
                    if cur_key is not None:
                        reducer.complete(state, coll)
                        for r in coll.rows:
                            out_rows.append(list(cur_key) + r)
                        coll.rows.clear()

                for pdf in batches:
                    # NaN/NaT -> None so a NULL key forms ONE contiguous run
                    # (groupBy's null==null semantics); NaN != NaN would
                    # split it into per-row groups. The astype(object) step
                    # matters: on a float64/datetime64 column, .where(...,
                    # None) coerces None straight back to NaN/NaT — only an
                    # object-dtype column can actually hold None.
                    key_lists = [
                        pdf[c].astype(object).where(pd.notna(pdf[c]), None).tolist()
                        for c in kcols
                    ]
                    srcs = pdf["__src__"].tolist()
                    payloads = [pdf[f"__p{j}__"].tolist() for j in range(nsrc)]
                    for r, src in enumerate(srcs):
                        k = tuple(kl[r] for kl in key_lists)
                        if k != cur_key:
                            close_key()
                            cur_key, state = k, reducer.init(coll)
                        row = payloads[src][r]  # Arrow struct -> dict
                        fo = field_orders[src]
                        vals = [row[f] for f in fo]
                        reducer.execute(
                            state, src, TridentTuple(vals, idx_maps[src]), coll
                        )
                    if out_rows:
                        yield pd.DataFrame(out_rows, columns=out_cols)
                        out_rows = []
                close_key()
                if out_rows:
                    yield pd.DataFrame(out_rows, columns=out_cols)

            parted = tagged.repartition(*[F.col(c) for c in kcols]).sortWithinPartitions(
                *kcols
            )
            return parted.mapInPandas(run_stream, out_schema)

        return Stream(self, build, out_l, "multireduce")._adopt_drpc(*streams)


def _run_keyed_updater(df: DataFrame, in_fields: list[str], updater) -> DataFrame:
    """Run a KeyedStateUpdater per partition and combine its buffered deltas
    per key: mapInPandas (executor-side update_state over the partition's
    tuples) -> one groupBy shuffle on the key fields. Returns one
    ``(key..., __delta__)`` row per touched key, ready for
    ``MapState.update_from_agg``."""
    import pandas as pd

    from storm_spark.operations.base import PartitionBuffer

    key_fields = list(updater.key_fields)
    agg = updater.agg
    names = df.columns
    pos = [names.index(f) for f in in_fields]
    idx = {f: i for i, f in enumerate(in_fields)}
    schema = {f.name: f.dataType for f in df.schema.fields}
    out_schema = StructType([])
    for k in key_fields:
        out_schema = out_schema.add(k, schema[k])
    out_schema = out_schema.add("__delta__", _parse_ddl(agg.value_type))

    def run(batches):
        buffer = PartitionBuffer(agg.combine)
        coll = TridentCollector()
        tuples = [
            TridentTuple([row[p] for p in pos], idx)
            for pdf in batches
            for row in pdf.itertuples(index=False, name=None)
        ]
        updater.update_state(buffer, tuples, coll)
        yield pd.DataFrame(
            [(*k, v) for k, v in buffer.items()],
            columns=key_fields + ["__delta__"],
        )

    deltas = df.mapInPandas(run, out_schema)
    red = updater.reduce_expr(F.col("__delta__"))
    if red is None:
        # generic fold of the updater's combiner over the per-partition
        # deltas — bounded input (≤ one row per key per partition)
        red = F.aggregate(
            F.collect_list("__delta__"),
            F.lit(None).cast(agg.value_type),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(agg.combine_expr(acc, x)),
        )
    return deltas.groupBy(*key_fields).agg(red.alias("__delta__"))


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


def join_streams(
    topology: Topology,
    streams: list[Stream],
    join_fields: list[list[str]],
    out_fields: list[str],
    join_type: str | list[str] = "inner",
) -> Stream:
    """N-way equi-join. Output fields: the join keys once (coalesced across
    sides for outer joins), then every stream's non-key fields in order —
    exactly the reference's output contract (``TridentTopology.java:237-263``).
    """
    nkeys = len(join_fields[0])
    for jf in join_fields:
        if len(jf) != nkeys:
            raise ValueError("all streams must join on the same number of fields")
    types = [join_type] * len(streams) if isinstance(join_type, str) else list(join_type)
    n_out_expected = nkeys + sum(len(s.fields) - nkeys for s in streams)
    if len(out_fields) != n_out_expected:
        raise ValueError(f"expected {n_out_expected} output fields, got {len(out_fields)}")

    def build(ctx: Context) -> DataFrame:
        dfs = []
        for i, (s, jf) in enumerate(zip(streams, join_fields)):
            df = s._build(ctx)
            dfs.append(
                df.select(
                    *[F.col(k).alias(f"__j{i}_{j}__") for j, k in enumerate(jf)],
                    *[F.col(c).alias(f"__v{i}_{c}__") for c in s.fields if c not in jf],
                )
            )
        acc = dfs[0]
        acc_outer = types[0] == "outer"
        for i in range(1, len(dfs)):
            right_outer = types[i] == "outer"
            if acc_outer and right_outer:
                how = "full_outer"
            elif acc_outer:
                how = "left_outer"
            elif right_outer:
                how = "right_outer"
            else:
                how = "inner"
            cond = None
            for j in range(nkeys):
                c = F.coalesce(*[acc[f"__j{k}_{j}__"] for k in range(i) if f"__j{k}_{j}__" in acc.columns]) \
                    if i > 1 else acc[f"__j0_{j}__"]
                eq = c.eqNullSafe(dfs[i][f"__j{i}_{j}__"])
                cond = eq if cond is None else (cond & eq)
            acc = acc.join(dfs[i], cond, how)
            acc_outer = acc_outer or right_outer
        # output: coalesced keys, then per-stream non-key fields in order
        out_cols = []
        for j in range(nkeys):
            out_cols.append(
                F.coalesce(*[F.col(f"__j{i}_{j}__") for i in range(len(streams))]).alias(
                    out_fields[j]
                )
            )
        pos = nkeys
        for i, s in enumerate(streams):
            for c in s.fields:
                if c not in join_fields[i]:
                    out_cols.append(F.col(f"__v{i}_{c}__").alias(out_fields[pos]))
                    pos += 1
        return acc.select(*out_cols)

    return Stream(topology, build, list(out_fields), "join")._adopt_drpc(*streams)


# ---------------------------------------------------------------------------
# LocalCluster — in-process batch driver + DRPC server
# ---------------------------------------------------------------------------


class LocalCluster:
    """Run a topology's state updates batch-by-batch, in txid order.

    Parity: ``LocalCluster.clj`` + ``MasterBatchCoordinator.java:121-180``
    (2-phase: process all, then commit in txid order) and ``LocalDRPC.clj``
    (in-process DRPC execute).
    """

    def __init__(self, topology: Topology):
        self.topology = topology
        self._next_txid = 1
        for src in topology._sources.values():
            src._cluster = self

    def feed(self, source: FeederSource, rows: Sequence[Sequence[Any]], txid: int | None = None) -> int:
        """Process one micro-batch of literal rows. Returns the txid used.
        Passing an explicit ``txid`` replays that transaction (for
        exactly-once semantics tests)."""
        if hasattr(source, "encode_rows"):
            rows = source.encode_rows(rows)
        df = self.topology.spark.createDataFrame([tuple(r) for r in rows], source.schema())
        return self.feed_dataframe(source, df, txid)

    def feed_dataframe(self, source: FeederSource, df: DataFrame, txid: int | None = None) -> int:
        """Process one micro-batch bound to a DataFrame — the scale path
        (rows never touch the driver)."""
        if txid is None:
            txid = self._next_txid
            self._next_txid += 1
        ctx = Context(self.topology.spark, {source.id: df}, txid)
        specs = self.topology._state_specs
        for spec in specs:
            spec.state.begin_commit(txid)
        for spec in specs:
            self._process_spec(spec, ctx, txid)
        for spec in specs:
            spec.state.commit(txid)
        return txid

    def _process_spec(self, spec: _StateSpec, ctx: Context, txid: int) -> None:
        from storm_spark.operations.base import KeyedStateUpdater

        df = spec.stream.build(ctx)
        if isinstance(spec.updater, KeyedStateUpdater):
            # scale path: updater runs per partition on the executors
            # (mapInPandas), its buffered (key, delta) rows combine per key
            # in one shuffle, then merge into the state table — no driver
            # collect anywhere (PartitionPersistProcessor.java:36 parity)
            agg_df = _run_keyed_updater(df, spec.in_fields, spec.updater)
            # no emptiness probe: it would execute the whole batch agg an
            # extra time, and both backends no-op on empty merged input;
            # _record_touched must run even for empty batches so
            # new_values_stream reports THIS batch's (empty) key set
            spec.state.update_from_agg(agg_df, spec.updater.agg, txid)
            self._record_touched(spec, agg_df)
            return
        if spec.updater is not None:
            # legacy driver-side path: StateUpdater(state, tuples, collector)
            # row-at-a-time against the live state handle. Parity/test
            # fixture ONLY (MemoryMapState) — it collects the batch
            rows = [
                TridentTuple(tuple(r), {f: i for i, f in enumerate(spec.in_fields)})
                for r in df.select(*spec.in_fields).collect()
            ]
            coll = TridentCollector()
            spec.updater(spec.state, rows, coll)
            return
        agg = spec.agg
        keys = [k for k in spec.keys if k != SNAPSHOT_KEY]
        if isinstance(agg, ReducerAggregator):
            # MapReducerAggStateUpdater parity: the batch delta is the key's
            # row list; the state layer folds it into the stored value
            gb = df.groupBy(*keys) if keys else df.groupBy()
            agg_df = gb.agg(
                F.collect_list(F.struct(*[F.col(f) for f in spec.in_fields])).alias(
                    "__delta__"
                )
            )
            agg = ReducerStateAgg(agg, spec.in_fields)
            if not keys:
                agg_df = agg_df.withColumn(SNAPSHOT_KEY, F.lit(0))
            spec.state.update_from_agg(agg_df, agg, txid)
            self._record_touched(spec, agg_df)
            return
        cols = [F.col(f) for f in spec.in_fields]
        state_agg_expr = getattr(agg, "state_agg_expr", None)
        expr = state_agg_expr(cols) if state_agg_expr is not None else agg.agg_expr(cols)
        if expr is not None:
            gb = df.groupBy(*keys) if keys else df.groupBy()
            agg_df = gb.agg(expr.alias("__delta__"))
        else:
            # python combiner: per-key fold via applyInPandas
            from storm_spark.stream import ChainedAggregatorDeclarer

            tmp = (
                ChainedAggregatorDeclarer(spec.stream, keys or None)
                .aggregate(spec.in_fields, agg, ["__delta__"])
                .chain_end()
            )
            agg_df = tmp.build(ctx)
        if not keys:  # snapshottable: constant key
            agg_df = agg_df.withColumn(SNAPSHOT_KEY, F.lit(0))
        merge_agg = (
            _CompositeStateAgg(agg) if hasattr(agg, "state_value_type") else agg
        )
        spec.state.update_from_agg(agg_df, merge_agg, txid)
        self._record_touched(spec, agg_df)

    def _record_touched(self, spec: _StateSpec, agg_df: DataFrame) -> None:
        """Track the batch's touched keys for newValuesStream (replacing the
        previous batch's persisted frame)."""
        if spec.last_touched_keys is not None:
            spec.last_touched_keys.unpersist()
        spec.last_touched_keys = agg_df.select(*spec.keys).persist()

    # -- DRPC ---------------------------------------------------------------

    def execute_drpc(self, function: str, args: str) -> list[list[Any]]:
        """Parity: ``LocalDRPC.execute`` — returns the result rows as a list
        of value-lists (the reference returns a JSON string of the same)."""
        return [list(r) for r in self.drpc_dataframe(function, args).collect()]

    def drpc_dataframe(self, function: str, args: str) -> DataFrame:
        """The DRPC result as an (uncollected) DataFrame — for composing the
        parameterized query into larger plans."""
        terminal = self.topology._drpc.get(function)
        if terminal is None:
            raise KeyError(f"no DRPC function {function!r}")
        spark = self.topology.spark
        adf = spark.createDataFrame([(args,)], StructType().add("args", "string"))
        ctx = Context(spark, {f"__drpc__:{function}": adf}, self._next_txid)
        return terminal.build(ctx)
