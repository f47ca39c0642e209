"""Operation contracts — the engine's UDF/UDAF/UDTF surface.

Parity map (reference -> engine):

- ``trident/operation/Function.java:22``  -> :class:`BaseFunction`
  (``ExprFunction`` fast path compiles to Catalyst columns; ``PandasFunction``
  is the Arrow-batched slow path via ``mapInPandas``).
- ``trident/operation/Filter.java:23``    -> :class:`BaseFilter`.
- ``trident/operation/CombinerAggregator.java:25-28`` -> :class:`CombinerAggregator`
  (monoid: init/combine/zero). The fast path exposes Catalyst expressions so
  Spark's partial+final HashAggregate replaces Trident's combiner fast path
  (``ChainedAggregatorDeclarer.java:130-145``) for free.
- ``trident/operation/ReducerAggregator.java:23-25`` -> :class:`ReducerAggregator`
  (fold; no partials — runs as grouped ``applyInPandas``).
- ``trident/operation/Aggregator.java:22-25`` -> :class:`Aggregator`
  (general: may emit any number of rows; sees the batch id).

Design rule: *everything that can be a Column expression is one* — Python
executes only inside Arrow-batched pandas UDFs, never per row on the hot path.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class TridentTuple:
    """Lightweight named row passed to python-path operations.

    Parity: ``backtype/storm/tuple/Tuple.java:39-170`` — positional access
    (``t[0]``), by-name access (``t['word']`` / ``t.get('word')``).
    """

    __slots__ = ("_values", "_index")

    def __init__(self, values: Sequence[Any], index: dict[str, int]):
        self._values = values
        self._index = index

    def __getitem__(self, key: int | str) -> Any:
        if isinstance(key, str):
            return self._values[self._index[key]]
        return self._values[key]

    def get(self, name: str, default: Any = None) -> Any:
        i = self._index.get(name)
        return default if i is None else self._values[i]

    # typed getters — parity: ``Tuple.java:54-134`` (positional) and the
    # ``…ByField`` overloads (``Tuple.java:111-134``). Python is dynamically
    # typed like the reference's tuples, so these are accessors, not casts.
    def get_value(self, i: int) -> Any:
        return self._values[i]

    def get_value_by_field(self, name: str) -> Any:
        return self._values[self._index[name]]

    get_string = get_integer = get_long = get_boolean = get_value
    get_short = get_byte = get_double = get_float = get_binary = get_value
    get_string_by_field = get_integer_by_field = get_long_by_field = get_value_by_field
    get_boolean_by_field = get_double_by_field = get_float_by_field = get_value_by_field
    get_binary_by_field = get_value_by_field

    def get_object(self, key: int | str) -> Any:
        """Decode an ``object``-typed (registered-encoder) payload — the
        Kryo-analogue read side (see storm_spark/serialization.py). Plain
        binary values pass through unchanged."""
        from storm_spark.serialization import decode_object

        return decode_object(self[key])

    get_object_by_field = get_object

    def contains(self, name: str) -> bool:
        return name in self._index

    def field_index(self, name: str) -> int:
        return self._index[name]

    def get_fields(self) -> list[str]:
        return sorted(self._index, key=self._index.__getitem__)

    def values(self) -> list[Any]:
        return list(self._values)

    def __len__(self) -> int:
        return len(self._values)

    def __repr__(self) -> str:
        return f"TridentTuple({list(self._values)!r})"


class TridentCollector:
    """Collects emitted rows from python-path operations.

    Parity: ``trident/operation/TridentCollector.java`` (``emit(List<Object>)``).
    """

    __slots__ = ("rows",)

    def __init__(self) -> None:
        self.rows: list[list[Any]] = []

    def emit(self, values: Sequence[Any]) -> None:
        self.rows.append(list(values))


# ---------------------------------------------------------------------------
# Functions (each)
# ---------------------------------------------------------------------------


class BaseFunction:
    """Marker base for ``each``-style functions (0..n rows out, appended cols)."""

    #: Spark DDL types for the function's output fields (python path only).
    out_types: list[str] = []


class ExprFunction(BaseFunction):
    """Fast-path function: output fields are Catalyst Column expressions.

    ``columns(cols)`` receives the *input* columns (per ``inFields``) and
    returns one Column per output field. A single generator column (e.g.
    ``F.explode``) is allowed, giving 1-to-n semantics JVM-side.
    """

    def columns(self, cols: list[Column]) -> list[Column]:  # pragma: no cover
        raise NotImplementedError


class LambdaFunction(ExprFunction):
    """Wrap a plain ``lambda cols: [Column, ...]`` as an ExprFunction."""

    def __init__(self, fn: Callable[[list[Column]], list[Column]]):
        self._fn = fn

    def columns(self, cols: list[Column]) -> list[Column]:
        return self._fn(cols)


class PandasFunction(BaseFunction):
    """Slow-path function: arbitrary python, Arrow-batched via ``mapInPandas``.

    Implement ``execute(tuple, collector)`` exactly like the reference's
    ``Function.execute(TridentTuple, TridentCollector)``; emitted rows are the
    *appended* output fields. Set ``out_types`` (Spark DDL) for the outputs.
    """

    def prepare(self) -> None:  # lifecycle hook (Operation.prepare)
        pass

    def execute(self, tup: TridentTuple, collector: TridentCollector) -> None:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


class BaseFilter:
    """Marker base for filters (row -> bool)."""


class ExprFilter(BaseFilter):
    """Fast path: boolean Column over the selected input columns."""

    def condition(self, cols: list[Column]) -> Column:  # pragma: no cover
        raise NotImplementedError


class LambdaFilter(ExprFilter):
    def __init__(self, fn: Callable[[list[Column]], Column]):
        self._fn = fn

    def condition(self, cols: list[Column]) -> Column:
        return self._fn(cols)


class PandasFilter(BaseFilter):
    """Slow path: ``is_keep(tuple) -> bool``, run Arrow-batched."""

    def is_keep(self, tup: TridentTuple) -> bool:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Aggregators
# ---------------------------------------------------------------------------


class CombinerAggregator:
    """Commutative-monoid aggregate: ``init(tuple) -> T``, ``combine(a, b) -> T``,
    ``zero() -> T``.

    Fast path (preferred): override the three ``*_expr`` hooks with Catalyst
    expressions — the engine then compiles to built-in partial+final hash
    aggregation, and the state layer uses ``combine_expr`` for cross-batch
    merges. Python ``init/combine/zero`` remain as the portable slow path.
    """

    #: Spark DDL type of the aggregate value (used for state tables / python path).
    value_type: str = "bigint"

    # -- fast path ---------------------------------------------------------
    def agg_expr(self, cols: list[Column]) -> Column | None:
        """Whole-batch aggregate expression, or None to use the python path."""
        return None

    def combine_expr(self, a: Column, b: Column) -> Column:
        """Merge two partial values (state merge across batches)."""
        raise NotImplementedError

    def zero_expr(self) -> Column:
        return F.lit(self.zero())

    # -- python path -------------------------------------------------------
    def init(self, tup: TridentTuple) -> Any:
        raise NotImplementedError

    def combine(self, a: Any, b: Any) -> Any:
        raise NotImplementedError

    def zero(self) -> Any:
        raise NotImplementedError


class ReducerAggregator:
    """Fold aggregate: ``init() -> T``, ``reduce(curr, tuple) -> T``.

    No partial aggregation is possible (parity:
    ``ReducerAggregator.java:23-25``) — runs as grouped ``applyInPandas``.
    """

    value_type: str = "bigint"

    def init(self) -> Any:
        raise NotImplementedError

    def reduce(self, curr: Any, tup: TridentTuple) -> Any:
        raise NotImplementedError


class ReducerStateAgg:
    """Adapter making a ReducerAggregator usable by the keyed state layer.

    Parity: ``MapReducerAggStateUpdater.java:36`` — per key, the batch's
    contribution is its ROW LIST (not a mergeable partial), and the
    cross-batch merge is ``fold(reduce, curr or init(), rows)``. The state
    protocols (opaque/transactional replay handling) are value-agnostic, so
    this slots into the same multi_update/merge machinery as combiners; the
    fold itself runs in Python (reference parity: reducers never had
    partials).
    """

    def __init__(self, reducer: ReducerAggregator, in_fields: list[str]):
        self.reducer = reducer
        self.in_fields = list(in_fields)
        self.value_type = reducer.value_type
        self._idx = {f: i for i, f in enumerate(self.in_fields)}

    def zero(self) -> Any:
        return None  # sentinel: fold starts from reducer.init()

    def combine(self, curr: Any, rows: Any) -> Any:
        base = self.reducer.init() if curr is None else curr
        for r in rows or []:
            vals = [r[f] for f in self.in_fields] if hasattr(r, "__getitem__") else list(r)
            base = self.reducer.reduce(base, TridentTuple(vals, self._idx))
        return base


class Aggregator:
    """General aggregator: may emit any number of rows at any point.

    Parity: ``trident/operation/Aggregator.java:22-25`` —
    ``init(batch_id, collector) -> S``; ``aggregate(S, tuple, collector)``;
    ``complete(S, collector)``. Runs as grouped ``applyInPandas``; emitted rows
    are the output fields. Set ``out_types`` (one DDL type per output field).
    """

    out_types: list[str] = ["bigint"]

    def init(self, batch_id: Any, collector: TridentCollector) -> Any:
        raise NotImplementedError

    def aggregate(self, state: Any, tup: TridentTuple, collector: TridentCollector) -> None:
        raise NotImplementedError

    def complete(self, state: Any, collector: TridentCollector) -> None:
        raise NotImplementedError


AnyAggregator = CombinerAggregator | ReducerAggregator | Aggregator


# ---------------------------------------------------------------------------
# partitionPersist scale path (StateUpdater contract)
# ---------------------------------------------------------------------------


class ReplaceCombiner(CombinerAggregator):
    """Last-write-wins merge — gives ``PartitionBuffer.put`` its replace
    semantics through the same opaque/transactional state machinery
    (``combine(stored, new) = new``)."""

    def __init__(self, value_type: str = "string"):
        self.value_type = value_type

    def combine_expr(self, a: Column, b: Column) -> Column:
        return F.coalesce(b, a)

    def zero_expr(self) -> Column:
        return F.lit(None)

    def init(self, tup: TridentTuple) -> Any:
        return tup[0]

    def combine(self, a: Any, b: Any) -> Any:
        return b if b is not None else a

    def zero(self) -> Any:
        return None


class PartitionBuffer:
    """Partition-local write buffer handed to
    :meth:`KeyedStateUpdater.update_state` — the executor-side stand-in for
    the reference's live ``State`` handle (which there is a remote KV store
    reachable from workers; here writes buffer locally and merge set-oriented
    afterwards)."""

    def __init__(self, combine: Callable[[Any, Any], Any]):
        self._combine = combine
        self._buf: dict[tuple, Any] = {}

    def update(self, key: tuple, delta: Any) -> None:
        """Accumulate a delta for ``key`` (merged with ``agg.combine``)."""
        key = tuple(key)
        cur = self._buf.get(key)
        self._buf[key] = delta if key not in self._buf else self._combine(cur, delta)

    def put(self, key: tuple, value: Any) -> None:
        """Overwrite ``key`` (within this partition; cross-partition order of
        conflicting puts is undefined, as in the reference)."""
        self._buf[tuple(key)] = value

    def items(self):
        return self._buf.items()


class KeyedStateUpdater:
    """Scale-path StateUpdater for ``partition_persist``.

    Parity: ``trident/state/StateUpdater.java`` +
    ``PartitionPersistProcessor.java:36`` — ``update_state`` runs ONCE PER
    PARTITION per batch, exactly like the reference runs updaters inside each
    partition's bolt. Here it executes inside an Arrow ``mapInPandas``
    kernel on the executors; the rows it writes into the
    :class:`PartitionBuffer` flow out as ``(key..., delta)`` rows, are
    combined per key (one shuffle), and merge into the backing ``MapState``
    under the usual opaque/transactional txid protocol. Nothing collects to
    the driver.

    ``agg`` (a :class:`CombinerAggregator`) defines how deltas merge — with
    each other across partitions and with the stored value across batches.
    Use :class:`ReplaceCombiner` for put-style (last-write-wins) state.
    """

    def __init__(self, key_fields: list[str], agg: CombinerAggregator):
        self.key_fields = list(key_fields)
        self.agg = agg

    def update_state(
        self, buffer: PartitionBuffer, tuples: list[TridentTuple], collector: TridentCollector
    ) -> None:
        raise NotImplementedError

    def reduce_expr(self, delta_col: Column) -> Column | None:
        """Optional: a direct aggregate expression combining this updater's
        deltas per key (e.g. ``F.sum``) — keeps the cross-partition combine
        in codegen'd partial+final hash aggregation. Default: a
        ``collect_list`` + ``F.aggregate`` fold of ``agg.combine_expr``
        (bounded: at most one delta row per key per partition)."""
        return None
