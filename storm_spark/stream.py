"""Stream — the fluent query API (parity: ``storm/trident/Stream.java``).

A ``Stream`` is a *deferred DataFrame plan*: a ``build(ctx)`` closure plus the
eagerly-tracked output field list. Verbs validate fields at call time (parity:
``Stream.java:362-373`` eager field validation) and compose pure DataFrame
transformations — Catalyst is the planner; there is no custom IR beyond this.

Sources bind late through :class:`Context` so the same pipeline runs over a
static table (batch mode), a feeder batch (micro-batch mode), or a DRPC
argument row (parameterized query), exactly like Trident topologies run the
same graph for all three.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.fields import Fields, as_field_list
from storm_spark.operations.base import (
    Aggregator,
    BaseFilter,
    BaseFunction,
    CombinerAggregator,
    ExprFilter,
    ExprFunction,
    PandasFilter,
    PandasFunction,
    ReducerAggregator,
    TridentCollector,
    TridentTuple,
)
from storm_spark.operations.builtin import (
    MapGet,
    QueryFunction,
    SnapshotGet,
    TupleCollectionGet,
)

if TYPE_CHECKING:
    from storm_spark.topology import Topology, TridentState


class Context:
    """Execution context a plan is built against.

    ``bindings`` maps source ids to DataFrames (feeder batches, DRPC args);
    ``txid`` is the current micro-batch/transaction id (parity: Trident txid,
    = Structured Streaming epoch id in the streaming driver).
    """

    def __init__(
        self,
        spark: SparkSession,
        bindings: dict[str, DataFrame] | None = None,
        txid: int = 0,
    ):
        self.spark = spark
        self.bindings = bindings or {}
        self.txid = txid
        #: DataFrames persisted for the lifetime of this context (shared
        #: subtrees that must execute once, e.g. a multi-stream bolt's
        #: tagged output). Released by :meth:`release`.
        self._persisted: list[DataFrame] = []

    def register_persist(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` until :meth:`release` — for subtrees consumed by
        several downstream actions that must observe ONE execution (a
        stateful/nondeterministic kernel run once, reference parity)."""
        df.persist()
        self._persisted.append(df)
        return df

    def release(self) -> None:
        """Unpersist everything registered via :meth:`register_persist`."""
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()


def _parse_ddl(spark_type: str) -> Any:
    from pyspark.sql.types import BinaryType, _parse_datatype_string

    # "object" = arbitrary registered-encoder payload (Kryo analogue) — lands
    # as BinaryType on the wire; see storm_spark/serialization.py
    if spark_type == "object":
        return BinaryType()
    return _parse_datatype_string(spark_type)


class Stream:
    def __init__(
        self,
        topology: "Topology",
        build: Callable[[Context], DataFrame],
        fields: list[str],
        name: str = "stream",
    ):
        self._topology = topology
        self._build = build
        self.fields = list(fields)
        self._name = name
        #: DRPC functions this stream belongs to — every derived stream
        #: re-registers as the function's terminal (parity: the last node of
        #: the DRPC chain is what executes; ``TridentTopology.java:135-157``).
        #: Propagated through ALL derivation paths, including joins and
        #: multiReduce, so a chain ending in a join is still the terminal.
        self._drpc_names: tuple[str, ...] = ()

    # -- plumbing -----------------------------------------------------------

    def _adopt_drpc(self, *parents: "Stream") -> "Stream":
        names: list[str] = []
        for p in parents:
            for n in getattr(p, "_drpc_names", ()):
                if n not in names:
                    names.append(n)
        self._drpc_names = tuple(names)
        for n in names:
            self._topology._register_drpc_terminal(n, self)
        return self

    def _with(
        self, build: Callable[[Context], DataFrame], fields: list[str] | None = None
    ) -> "Stream":
        s = Stream(self._topology, build, fields if fields is not None else self.fields, self._name)
        return s._adopt_drpc(self)

    def _with_df(self, df: DataFrame) -> "Stream":
        s = Stream(self._topology, lambda ctx: df, df.columns, self._name)
        return s._adopt_drpc(self)

    def _check_fields(self, fields: list[str], what: str = "input") -> None:
        for f in fields:
            if f not in self.fields:
                raise ValueError(
                    f"{what} field {f!r} does not exist in stream fields {self.fields}"
                )

    def build(self, ctx: Context | None = None) -> DataFrame:
        return self._build(ctx or Context(self._topology.spark))

    @property
    def df(self) -> DataFrame:
        """The stream as a DataFrame (static/batch sources only)."""
        return self.build()

    def to_df(self, ctx: Context | None = None) -> DataFrame:
        return self.build(ctx)

    def name(self, name: str) -> "Stream":
        """Parity: ``Stream.java:76-79`` (label the node)."""
        s = self._with(self._build)
        s._name = name
        return s

    # -- projection / per-row ops ------------------------------------------

    def project(self, keep: Fields | list[str]) -> "Stream":
        """Keep only the named columns. Parity: ``Stream.java:81-84``.

        Compiles to ``select`` — Catalyst pushes the pruning into the scan.
        """
        keep_l = as_field_list(keep)
        self._check_fields(keep_l, "projection")
        return self._with(lambda ctx: self._build(ctx).select(*keep_l), keep_l)

    def each(
        self,
        in_fields: Fields | list[str],
        fn: BaseFunction | BaseFilter,
        out_fields: Fields | list[str] | None = None,
    ) -> "Stream":
        """Function: append ``out_fields`` computed from ``in_fields`` (0..n
        rows out). Filter: keep rows where the predicate holds.

        Parity: ``Stream.java:136-144`` (function) / ``:199-201`` (filter).
        """
        in_l = as_field_list(in_fields)
        self._check_fields(in_l)
        if isinstance(fn, BaseFilter):
            if out_fields is not None:
                raise ValueError("filters take no output fields")
            return self._filter_each(in_l, fn)
        out_l = as_field_list(out_fields) or []
        for f in out_l:
            if f in self.fields:
                raise ValueError(f"output field {f!r} already exists in {self.fields}")
        if isinstance(fn, ExprFunction):
            def build(ctx: Context) -> DataFrame:
                df = self._build(ctx)
                cols = [F.col(f) for f in in_l]
                outs = fn.columns(cols)
                if len(outs) != len(out_l):
                    raise ValueError(
                        f"function returned {len(outs)} columns for {len(out_l)} output fields"
                    )
                return df.select("*", *[c.alias(n) for c, n in zip(outs, out_l)])

            return self._with(build, self.fields + out_l)
        if isinstance(fn, PandasFunction):
            return self._pandas_each(in_l, fn, out_l)
        raise TypeError(f"unsupported function type: {type(fn)}")

    def filter(self, condition: Column | str | BaseFilter, in_fields=None) -> "Stream":
        """Engine sugar: filter by a Column/SQL expression directly."""
        if isinstance(condition, BaseFilter):
            return self.each(in_fields or self.fields, condition)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return self._with(lambda ctx: self._build(ctx).filter(cond))

    def with_column(self, name: str, col: Column | str) -> "Stream":
        """Engine sugar: append one computed column (Trident's append-not-copy
        tuple views == Catalyst projections; ``TridentTupleView.java:39``)."""
        c = F.expr(col) if isinstance(col, str) else col
        new_fields = self.fields + ([name] if name not in self.fields else [])
        return self._with(lambda ctx: self._build(ctx).withColumn(name, c), new_fields)

    def _filter_each(self, in_l: list[str], fn: BaseFilter) -> "Stream":
        if isinstance(fn, ExprFilter):
            def build(ctx: Context) -> DataFrame:
                df = self._build(ctx)
                return df.filter(fn.condition([F.col(f) for f in in_l]))

            return self._with(build)
        if isinstance(fn, PandasFilter):
            def build(ctx: Context) -> DataFrame:
                df = self._build(ctx)
                schema = df.schema
                names = df.columns
                pos = [names.index(f) for f in in_l]
                idx = {f: i for i, f in enumerate(in_l)}

                def run(batches):
                    for pdf in batches:
                        keep = [
                            fn.is_keep(TridentTuple([row[p] for p in pos], idx))
                            for row in pdf.itertuples(index=False, name=None)
                        ]
                        yield pdf[keep]

                return df.mapInPandas(run, schema)

            return self._with(build)
        raise TypeError(f"unsupported filter type: {type(fn)}")

    def _pandas_each(self, in_l: list[str], fn: PandasFunction, out_l: list[str]) -> "Stream":
        if len(fn.out_types) != len(out_l):
            raise ValueError(
                f"PandasFunction.out_types {fn.out_types} must match output fields {out_l}"
            )

        def build(ctx: Context) -> DataFrame:
            import pandas as pd

            df = self._build(ctx)
            in_schema = df.schema
            out_schema = StructType(in_schema.fields.copy())
            for name, t in zip(out_l, fn.out_types):
                out_schema = out_schema.add(name, _parse_ddl(t))
            names = df.columns
            pos = [names.index(f) for f in in_l]
            idx = {f: i for i, f in enumerate(in_l)}

            # "object"-typed outputs: emitted python objects encode to tagged
            # bytes via the registry before entering the Arrow batch
            obj_out = [j for j, t in enumerate(fn.out_types) if t == "object"]

            def run(batches):
                fn.prepare()
                if obj_out:
                    from storm_spark.serialization import encode_object
                for pdf in batches:
                    out_rows: list[list[Any]] = []
                    for row in pdf.itertuples(index=False, name=None):
                        coll = TridentCollector()
                        fn.execute(TridentTuple([row[p] for p in pos], idx), coll)
                        for emitted in coll.rows:
                            emitted = list(emitted)
                            for j in obj_out:
                                emitted[j] = encode_object(emitted[j])
                            out_rows.append(list(row) + emitted)
                    yield pd.DataFrame(out_rows, columns=names + out_l)

            return df.mapInPandas(run, out_schema)

        return self._with(build, self.fields + out_l)

    # -- repartitioning verbs (parity: Stream.java:91-121) ------------------
    # In Spark these are mostly advisory: Catalyst/EnsureRequirements inserts
    # the exchanges aggregation and joins actually need. They are kept for API
    # parity and for explicit scale tuning (skew, state co-location).

    def shuffle(self, n: int | None = None) -> "Stream":
        """Random repartition. Parity: ``Stream.java:100-102``."""
        def build(ctx: Context) -> DataFrame:
            df = self._build(ctx)
            return df.repartition(n if n else df.sparkSession.sparkContext.defaultParallelism)

        return self._with(build)

    def partition_by(self, fields: Fields | list[str], n: int | None = None) -> "Stream":
        """Hash-partition by fields. Parity: ``Stream.java:91-94``."""
        fl = as_field_list(fields)
        self._check_fields(fl, "partition")
        cols = [F.col(f) for f in fl]
        return self._with(
            lambda ctx: self._build(ctx).repartition(n, *cols)
            if n
            else self._build(ctx).repartition(*cols)
        )

    def global_(self) -> "Stream":
        """All tuples to one partition. Parity: ``Stream.java:104-108``."""
        return self._with(lambda ctx: self._build(ctx).coalesce(1))

    def batch_global(self) -> "Stream":
        """Each batch to one partition (free: a micro-batch is already one
        unit of work). Parity: ``Stream.java:110-113``."""
        return self._with(lambda ctx: self._build(ctx).coalesce(1))

    def broadcast(self) -> "Stream":
        """Mark for broadcast in downstream joins. Parity: ``Stream.java:115-117``
        (replicate-to-all ⇒ Spark broadcast hint)."""
        return self._with(lambda ctx: F.broadcast(self._build(ctx)))

    def identity_partition(self) -> "Stream":
        """No-op (planner glue). Parity: ``Stream.java:119-121``."""
        return self

    def partition(self, partition_expr: Column | str, n: int | None = None) -> "Stream":
        """Custom partitioner: repartition on an arbitrary expression.
        Parity: ``Stream.java:96-98`` (CustomStreamGrouping)."""
        c = F.expr(partition_expr) if isinstance(partition_expr, str) else partition_expr
        return self._with(
            lambda ctx: self._build(ctx).repartition(n, c) if n else self._build(ctx).repartition(c)
        )

    # -- grouping & aggregation --------------------------------------------

    def group_by(self, fields: Fields | list[str]) -> "GroupedStream":
        """Parity: ``Stream.java:86-89``."""
        fl = as_field_list(fields)
        self._check_fields(fl, "grouping")
        return GroupedStream(self, fl)

    def aggregate(
        self,
        in_fields: Fields | list[str],
        agg=None,
        out_fields: Fields | list[str] | None = None,
    ) -> "Stream":
        """Full-batch aggregation; output = only the new fields.

        Parity: ``Stream.java:233-264`` — partial-per-partition then final is
        exactly Spark's partial+final HashAggregate, done by Catalyst.
        Two-arg form ``aggregate(agg, out_fields)`` matches the reference's
        no-input-fields overload.
        """
        if out_fields is None:
            in_fields, agg, out_fields = [], in_fields, agg
        return self.chained_agg().aggregate(in_fields, agg, out_fields).chain_end()

    def chained_agg(self) -> "ChainedAggregatorDeclarer":
        """Parity: ``Stream.java:203-205`` / ``ChainedAggregatorDeclarer.java``."""
        return ChainedAggregatorDeclarer(self, keys=None)

    def partition_aggregate(
        self,
        in_fields: Fields | list[str],
        agg,
        out_fields: Fields | list[str],
    ) -> "Stream":
        """Aggregate within each partition (no shuffle); output = new fields only.

        Parity: ``Stream.java:148-156``; ``AggregateProcessor.java:33-84``.
        This is the map-side partial-aggregation primitive; built-ins already
        get it from Catalyst, so this exists for API parity and custom
        python aggregators (runs as ``mapInPandas`` per partition).
        """
        in_l = as_field_list(in_fields)
        out_l = as_field_list(out_fields)
        self._check_fields(in_l)

        def build(ctx: Context) -> DataFrame:
            import pandas as pd

            df = self._build(ctx)
            names = df.columns
            pos = [names.index(f) for f in in_l]
            idx = {f: i for i, f in enumerate(in_l)}
            out_schema = StructType()
            for name, t in zip(out_l, _agg_out_types(agg, out_l)):
                out_schema = out_schema.add(name, _parse_ddl(t))
            txid = ctx.txid

            def run(batches):
                coll = TridentCollector()
                state = _AggState(agg, txid, coll)
                n = 0
                for pdf in batches:
                    for row in pdf.itertuples(index=False, name=None):
                        state.accept(TridentTuple([row[p] for p in pos], idx))
                        n += 1
                state.complete()
                yield pd.DataFrame(coll.rows, columns=out_l)

            return df.mapInPandas(run, out_schema)

        return self._with(build, out_l)

    # -- state --------------------------------------------------------------

    def persistent_aggregate(
        self, state_factory, in_fields, agg=None, out_fields=None
    ) -> "TridentState":
        """Global (non-grouped) persistent aggregate into a Snapshottable state.

        Parity: ``Stream.java:282-318`` (global variant wraps
        ``SnapshottableMap.java:26``). Call on a grouped stream for keyed state.
        """
        if out_fields is None:  # (state_factory, agg, out_fields) overload
            in_fields, agg, out_fields = [], in_fields, agg
        return self._topology._register_persistent_aggregate(
            self, [], as_field_list(in_fields) or [], agg, as_field_list(out_fields), state_factory
        )

    def partition_persist(
        self, state_factory, in_fields, updater, out_fields=None
    ) -> "TridentState":
        """Write each batch partition into a State via a StateUpdater.

        Parity: ``Stream.java:170-193``; ``PartitionPersistProcessor.java:36``.
        The engine runs the updater inside the per-batch commit (foreachBatch
        in streaming), giving the same committer semantics.

        Pass a :class:`~storm_spark.operations.base.KeyedStateUpdater` for
        the SCALE path: ``update_state`` runs once per partition on the
        executors (Arrow ``mapInPandas``), buffered writes combine per key in
        one shuffle and merge into the state table under the txid protocol —
        no driver collect. A plain ``callable(state, tuples, collector)``
        keeps the reference's row-at-a-time driver-side contract
        (test/parity fixture for ``MemoryMapState`` only).
        """
        return self._topology._register_partition_persist(
            self, as_field_list(in_fields), updater, as_field_list(out_fields), state_factory
        )

    def state_query(
        self,
        state: "TridentState",
        in_fields: Fields | list[str] | None,
        query_fn: QueryFunction,
        out_fields: Fields | list[str],
    ) -> "Stream":
        """Lookup join against a TridentState.

        Parity: ``Stream.java:158-168``; ``StateQueryProcessor.java:35-106``.
        ``batchRetrieve`` (batched key lookup) becomes a broadcast/shuffle join
        against the state table — the scale-correct equivalent.
        """
        in_l = as_field_list(in_fields) or []
        out_l = as_field_list(out_fields)
        if in_l:
            self._check_fields(in_l)

        def build(ctx: Context) -> DataFrame:
            df = self._build(ctx)
            return state._query(ctx, df, in_l, query_fn, out_l)

        return self._with(build, self.fields + out_l)

    # -- multi-stream -------------------------------------------------------

    def merge(self, *others: "Stream") -> "Stream":
        """UNION ALL by position; this stream's field names win.

        Parity: ``TridentTopology.java:221-235`` (IdentityMultiReducer).
        """
        streams = [self, *others]
        n = len(self.fields)
        for s in streams[1:]:
            if len(s.fields) != n:
                raise ValueError("merged streams must have the same arity")

        def build(ctx: Context) -> DataFrame:
            dfs = [s._build(ctx).toDF(*self.fields) for s in streams]
            # Trident tuples are dynamically typed (Values = List<Object>);
            # the typed engine narrows: positions whose types disagree across
            # streams are coerced to string (documented narrowing, SURVEY §7)
            types_by_col = [{d.schema[f].dataType for d in dfs} for f in self.fields]
            casts = [
                (f if len(ts) == 1 else F.col(f).cast("string").alias(f))
                for f, ts in zip(self.fields, types_by_col)
            ]
            dfs = [d.select(*casts) if any(isinstance(c, Column) for c in casts) else d for d in dfs]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.union(d)
            return out

        return self._with(build, list(self.fields))._adopt_drpc(*streams)

    def join(
        self,
        other: "Stream",
        left_fields,
        right_fields,
        out_fields,
        join_type: str = "inner",
    ) -> "Stream":
        """Equi-join (within the current batch). See ``Topology.join`` for the
        N-way form; parity notes live there."""
        from storm_spark.topology import join_streams

        return join_streams(
            self._topology,
            [self, other],
            [as_field_list(left_fields), as_field_list(right_fields)],
            as_field_list(out_fields),
            join_type,
        )

    # -- assemblies & top-k -------------------------------------------------

    def apply_assembly(self, assembly) -> "Stream":
        """Parity: ``Stream.java:131-133`` / ``operation/Assembly.java:25``."""
        return assembly.apply(self)

    def order_by(self, *cols: Column | str) -> "Stream":
        """Engine extension (the reference has no ORDER BY)."""
        cs = [F.expr(c) if isinstance(c, str) else c for c in cols]
        return self._with(lambda ctx: self._build(ctx).orderBy(*cs))

    def limit(self, n: int) -> "Stream":
        return self._with(lambda ctx: self._build(ctx).limit(n))

    def distinct(self) -> "Stream":
        """Engine extension (free Spark win, SURVEY §2.5 'not present')."""
        return self._with(lambda ctx: self._build(ctx).distinct())

    # -- event-time windows (engine extension; the reference has no event
    # time at all — SURVEY §2.8) --------------------------------------------

    def window_aggregate(
        self,
        ts_field: str,
        duration: str,
        keys: Fields | list[str],
        aggs: dict[str, Column],
        slide: str | None = None,
    ) -> "Stream":
        """Tumbling (or sliding, with ``slide``) event-time window aggregation.

        Output fields: ``window_start``, ``window_end`` (timestamps), the
        keys, then one field per ``aggs`` entry. Works identically over batch
        frames and (with a watermark upstream) streaming frames.
        """
        self._check_fields([ts_field, *as_field_list(keys)])
        key_l = as_field_list(keys)

        def build(ctx: Context) -> DataFrame:
            df = self._build(ctx)
            w = F.window(ts_field, duration, slide) if slide else F.window(ts_field, duration)
            return (
                df.groupBy(w.alias("__w__"), *key_l)
                .agg(*[c.alias(n) for n, c in aggs.items()])
                .select(
                    F.col("__w__.start").alias("window_start"),
                    F.col("__w__.end").alias("window_end"),
                    *key_l,
                    *aggs.keys(),
                )
            )

        return self._with(build, ["window_start", "window_end", *key_l, *aggs.keys()])

    def session_aggregate(
        self,
        ts_field: str,
        gap: str,
        keys: Fields | list[str],
        aggs: dict[str, Column],
    ) -> "Stream":
        """Session-window aggregation: rows within ``gap`` of each other per
        key merge into one session."""
        self._check_fields([ts_field, *as_field_list(keys)])
        key_l = as_field_list(keys)

        def build(ctx: Context) -> DataFrame:
            df = self._build(ctx)
            return (
                df.groupBy(F.session_window(ts_field, gap).alias("__w__"), *key_l)
                .agg(*[c.alias(n) for n, c in aggs.items()])
                .select(
                    F.col("__w__.start").alias("window_start"),
                    F.col("__w__.end").alias("window_end"),
                    *key_l,
                    *aggs.keys(),
                )
            )

        return self._with(build, ["window_start", "window_end", *key_l, *aggs.keys()])

    def semi_join(self, other: "Stream", on: Fields | list[str]) -> "Stream":
        """EXISTS — keep rows with a match in ``other`` (engine extension;
        semi/anti come free in Spark, SURVEY §2.6)."""
        on_l = as_field_list(on)
        self._check_fields(on_l)
        return self._with(
            lambda ctx: self._build(ctx).join(other._build(ctx), on=on_l, how="left_semi")
        )

    def anti_join(self, other: "Stream", on: Fields | list[str]) -> "Stream":
        """NOT EXISTS — keep rows without a match in ``other``."""
        on_l = as_field_list(on)
        self._check_fields(on_l)
        return self._with(
            lambda ctx: self._build(ctx).join(other._build(ctx), on=on_l, how="left_anti")
        )


# ---------------------------------------------------------------------------


class GroupedStream:
    """A keyed stream. Parity: ``trident/fluent/GroupedStream.java:37-174``."""

    def __init__(self, stream: Stream, keys: list[str]):
        self._stream = stream
        self.keys = keys

    def aggregate(self, in_fields, agg=None, out_fields=None) -> Stream:
        """Per-key, per-batch aggregation → keys + new fields.

        Parity: ``GroupedStream.java:84-130`` / ``GroupedAggregator.java:33-95``
        — the reference's in-heap HashMap per group becomes Spark's codegen'd
        spillable hash aggregate.
        """
        if out_fields is None:
            in_fields, agg, out_fields = [], in_fields, agg
        return (
            ChainedAggregatorDeclarer(self._stream, keys=self.keys)
            .aggregate(in_fields, agg, out_fields)
            .chain_end()
        )

    def chained_agg(self) -> "ChainedAggregatorDeclarer":
        return ChainedAggregatorDeclarer(self._stream, keys=self.keys)

    def persistent_aggregate(self, state_factory, in_fields, agg=None, out_fields=None) -> "TridentState":
        """Keyed cross-batch aggregate into a MapState.

        Parity: ``GroupedStream.java:84-130`` →
        ``MapCombinerAggStateUpdater.java:35-80``.
        """
        if agg is None:
            raise ValueError("persistent_aggregate(state_factory, in_fields, agg, out_fields)")
        return self._stream._topology._register_persistent_aggregate(
            self._stream,
            self.keys,
            as_field_list(in_fields) or [],
            agg,
            as_field_list(out_fields),
            state_factory,
        )

    def state_query(self, state, in_fields, query_fn, out_fields) -> Stream:
        """Grouping before a stateQuery is a partitioning hint in the
        reference; the join below already co-partitions by key."""
        return self._stream.state_query(state, in_fields, query_fn, out_fields)

    def to_stream(self) -> Stream:
        return self._stream


class _AggState:
    """Uniform driver for the three aggregator contracts (python path)."""

    def __init__(self, agg, batch_id, collector: TridentCollector):
        self.agg = agg
        self.collector = collector
        if isinstance(agg, CombinerAggregator):
            self.value = agg.zero()
            self.seen = False
        elif isinstance(agg, ReducerAggregator):
            self.value = agg.init()
        elif isinstance(agg, Aggregator):
            self.value = agg.init(batch_id, collector)
        else:
            raise TypeError(f"not an aggregator: {type(agg)}")

    def accept(self, tup: TridentTuple) -> None:
        agg = self.agg
        if isinstance(agg, CombinerAggregator):
            self.value = agg.combine(self.value, agg.init(tup))
            self.seen = True
        elif isinstance(agg, ReducerAggregator):
            self.value = agg.reduce(self.value, tup)
        else:
            agg.aggregate(self.value, tup, self.collector)

    def complete(self) -> None:
        agg = self.agg
        if isinstance(agg, (CombinerAggregator, ReducerAggregator)):
            self.collector.emit([self.value])
        else:
            agg.complete(self.value, self.collector)


def _agg_out_types(agg, out_fields: list[str]) -> list[str]:
    if isinstance(agg, (CombinerAggregator, ReducerAggregator)):
        return [agg.value_type]
    return list(agg.out_types)


class ChainedAggregatorDeclarer:
    """Zip several aggregators over one pass.

    Parity: ``trident/fluent/ChainedAggregatorDeclarer.java:55-112`` — for
    expression aggregators this is literally one ``agg(...)`` call; python
    aggregators run in a single grouped ``applyInPandas`` pass.
    """

    def __init__(self, stream: Stream, keys: list[str] | None):
        self._stream = stream
        self._keys = keys
        self._aggs: list[tuple[list[str], Any, list[str]]] = []

    def aggregate(self, in_fields, agg, out_fields) -> "ChainedAggregatorDeclarer":
        in_l = as_field_list(in_fields) or []
        out_l = as_field_list(out_fields)
        if in_l:
            self._stream._check_fields(in_l)
        self._aggs.append((in_l, agg, out_l))
        return self

    def chain_end(self) -> Stream:
        keys = self._keys or []
        all_out = [f for _, _, outs in self._aggs for f in outs]
        fields = keys + all_out
        all_expr = all(
            isinstance(a, CombinerAggregator) and a.agg_expr([F.col(f) for f in (i or ["*"])]) is not None
            for i, a, _ in self._aggs
        )
        stream = self._stream
        aggs = list(self._aggs)

        if all_expr:
            def build(ctx: Context) -> DataFrame:
                df = stream._build(ctx)
                exprs = []
                for in_l, agg, out_l in aggs:
                    cols = [F.col(f) for f in in_l]
                    e = agg.agg_expr(cols)
                    if not keys:
                        # global agg on an empty batch emits the zero value,
                        # matching Trident's complete()-always semantics
                        # (CombinerAggregatorCombineImpl.java:28-61)
                        e = F.coalesce(e, agg.zero_expr().cast(agg.value_type))
                    exprs.append(e.alias(out_l[0]))
                if keys:
                    return df.groupBy(*keys).agg(*exprs)
                return df.agg(*exprs)

            return stream._with(build, fields)

        # python path: one applyInPandas pass over each group
        def build(ctx: Context) -> DataFrame:
            import pandas as pd

            df = stream._build(ctx)
            names = df.columns
            out_schema = StructType()
            key_schema = {f.name: f.dataType for f in df.schema.fields}
            for k in keys:
                out_schema = out_schema.add(k, key_schema[k])
            for in_l, agg, out_l in aggs:
                for name, t in zip(out_l, _agg_out_types(agg, out_l)):
                    out_schema = out_schema.add(name, _parse_ddl(t))
            txid = ctx.txid

            def run(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
                row_out: list[Any] = list(key) if keys else []
                for in_l, agg, out_l in aggs:
                    pos = [names.index(f) for f in in_l]
                    idx = {f: i for i, f in enumerate(in_l)}
                    coll = TridentCollector()
                    st = _AggState(agg, txid, coll)
                    for row in pdf.itertuples(index=False, name=None):
                        st.accept(TridentTuple([row[p] for p in pos], idx))
                    st.complete()
                    if len(coll.rows) == 1:
                        row_out.extend(coll.rows[0])
                    else:
                        # general Aggregator emitting 0/N rows: only legal as
                        # the sole aggregator in the chain
                        if len(aggs) != 1:
                            raise ValueError(
                                "multi-row Aggregator cannot be chained with others"
                            )
                        return pd.DataFrame(
                            [list(key) + r for r in coll.rows] if keys else coll.rows,
                            columns=[f.name for f in out_schema.fields],
                        )
                return pd.DataFrame([row_out], columns=[f.name for f in out_schema.fields])

            if keys:
                return df.groupBy(*keys).applyInPandas(run, out_schema)
            # Global python aggregation must emit even for an EMPTY batch
            # (Trident always runs init/complete once per batch — e.g.
            # CountAsAggregator on "" emits [[0]]). A marker row keeps the
            # single group non-empty without any driver-side action.
            body = df.select(
                F.lit(1).alias("__g__"), F.lit(1).alias("__real__"), *df.columns
            )
            marker = (
                df.sparkSession.range(1)
                .select(
                    F.lit(1).alias("__g__"),
                    F.lit(0).alias("__real__"),
                    *[F.lit(None).cast(f.dataType).alias(f.name) for f in df.schema.fields],
                )
            )

            def run_global(key, pdf):
                real = pdf[pdf["__real__"] == 1]
                return run((), real.drop(columns=["__g__", "__real__"]))

            return body.union(marker).groupBy("__g__").applyInPandas(run_global, out_schema)

        return stream._with(build, fields)
