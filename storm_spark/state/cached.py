"""CachedMap — LRU read cache layered over a MapState's point API.

Parity: ``trident/state/map/CachedMap.java:31-79`` ("useful to layer over a
map that communicates with a database; you generally layer opaque map over
this over your database store"): ``multiGet`` serves hits from an LRU map
and fetches only misses from the delegate; ``multiPut`` writes through and
caches.

Engine divergence (documented): the reference's cache sits below the
opaque/transactional wrappers, caching raw stored ``{txid,curr,prev}``
records. Here the protocol lives inside the backends, so the cache holds
*resolved* values — to stay correct under txid replay (where a read must
see ``prev``), the cache clears on ``begin_commit``, and reads during an
OPEN commit attempt bypass cache population (a replayed attempt resolves
un-updated keys to their pre-batch ``prev``, which must not be served as
``curr`` after the commit; update/put write-through still caches — those
define the post-commit ``curr``). The target workload is unchanged:
read-heavy stateQuery/DRPC traffic BETWEEN commits, where hot keys hit
memory instead of the backing store.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from storm_spark.state.base import MapState


class CachedMap(MapState):
    def __init__(self, delegate: MapState, cache_size: int = 1000):
        self._delegate = delegate
        self._cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self._size = cache_size
        self._in_commit = False
        # surface the delegate's protocol metadata
        self.state_type = delegate.state_type
        for attr in ("key_schema", "value_field", "value_type"):
            if hasattr(delegate, attr):
                setattr(self, attr, getattr(delegate, attr))

    # -- cache plumbing -----------------------------------------------------
    def _put(self, key: tuple, val: Any) -> None:
        if key in self._cache:
            self._cache.move_to_end(key)
        self._cache[key] = val
        while len(self._cache) > self._size:
            self._cache.popitem(last=False)

    @property
    def cache_hits(self) -> int:
        return getattr(self, "_hits", 0)

    @property
    def cache_misses(self) -> int:
        return getattr(self, "_misses", 0)

    # -- lifecycle ----------------------------------------------------------
    def begin_commit(self, txid: int) -> None:
        # replay reads must see the delegate's prev values — resolved-value
        # caching across a commit boundary would serve stale curr
        self._cache.clear()
        self._in_commit = True
        self._delegate.begin_commit(txid)

    def commit(self, txid: int) -> None:
        self._delegate.commit(txid)
        self._in_commit = False

    # -- point API (CachedMap.java:40-71) -----------------------------------
    def multi_get(self, keys: Sequence[tuple]) -> list[Any]:
        keys = [tuple(k) for k in keys]
        results: dict[tuple, Any] = {}
        to_get: list[tuple] = []
        for k in keys:
            if k in self._cache:
                self._cache.move_to_end(k)
                results[k] = self._cache[k]
            else:
                to_get.append(k)
        self._hits = self.cache_hits + (len(keys) - len(to_get))
        self._misses = self.cache_misses + len(to_get)
        if to_get:
            fetched = self._delegate.multi_get(to_get)
            # mid-attempt resolved values may be replay PREV values — they
            # must not outlive the attempt as cached "current" values
            cacheable = not self._in_commit
            for k, v in zip(to_get, fetched):
                if cacheable:
                    self._put(k, v)
                results[k] = v
        return [results[k] for k in keys]

    def multi_put(self, keys: Sequence[tuple], vals: Sequence[Any]) -> None:
        self._delegate.multi_put(keys, vals)
        for k, v in zip(keys, vals):
            self._put(tuple(k), v)

    def multi_update(
        self,
        keys: Sequence[tuple],
        deltas: Sequence[Any],
        combine: Callable[[Any, Any], Any],
        zero: Any = None,
    ) -> list[Any]:
        out = self._delegate.multi_update(keys, deltas, combine, zero)
        for k, v in zip(keys, out):
            self._put(tuple(k), v)
        return out

    # -- set-oriented path --------------------------------------------------
    def update_from_agg(self, agg_df: DataFrame, agg, txid: int) -> None:
        # a set merge touches keys the point cache can't see — invalidate
        self._cache.clear()
        self._delegate.update_from_agg(agg_df, agg, txid)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        return self._delegate.dataframe(spark)

    def as_dict(self) -> dict[tuple, Any]:
        return self._delegate.as_dict()

    @classmethod
    def factory(cls, delegate_factory: Callable, cache_size: int = 1000) -> Callable:
        def make(key_schema, value_field, value_type) -> "CachedMap":
            return cls(delegate_factory(key_schema, value_field, value_type), cache_size)

        return make
