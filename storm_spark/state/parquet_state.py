"""ParquetMapState — the scale-path keyed state table.

A direct, shuffle-parallel port of the reference's opaque/transactional value
protocol (``OpaqueValue.java:37-58``, ``OpaqueMap.java:54-85``,
``TransactionalMap.java:66-76``) onto a versioned parquet table:

    state table columns: <key cols...>, __curr__, __prev__, __txid__

Per epoch the engine computes the batch's per-key partial aggregate (one row
per touched key — Spark's partial+final hash agg), then FULL OUTER joins it
with the current state and applies, per key::

    no stored row          -> curr = combine(zero, delta);       prev = zero
    stored.txid == txid    -> curr = combine(prev, delta)        (replay: redo
                              from prev — idempotent even if the batch changed)
    stored.txid != txid    -> prev = curr; curr = combine(curr, delta)
    delta is null          -> row untouched

TRANSACTIONAL skips the update when stored.txid == txid; NON_TRANSACTIONAL
always combines. Writes land in a new version directory; ``commit(txid)``
flips the version pointer — a poor-man's snapshot isolation that at cluster
scale would be a Delta/Iceberg transactional commit (jars not in this image;
the merge logic is identical).

Scale notes: the merge is one shuffle on the key columns (state and batch agg
are both hash-partitioned by key); the state table is written hash-bucketed by
key so successive epochs co-locate. Nothing collects to the driver.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

from storm_spark.state.base import MapState, StateType

CURR, PREV, TXID = "__curr__", "__prev__", "__txid__"


class ParquetMapState(MapState):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_schema: StructType,
        value_field: str,
        value_type: str,
        state_type: StateType = StateType.OPAQUE,
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.key_schema = key_schema
        self.key_names = [f.name for f in key_schema.fields]
        self.value_field = value_field
        self.value_type = value_type
        self.state_type = state_type
        self.num_buckets = num_buckets
        self._cur_txid: int | None = None
        self._pending_seq: int | None = None
        os.makedirs(path, exist_ok=True)

    @classmethod
    def factory(
        cls,
        path: str,
        state_type: StateType = StateType.OPAQUE,
        num_buckets: int = 32,
    ) -> Callable:
        def make(key_schema: StructType, value_field: str, value_type: str) -> "ParquetMapState":
            from storm_spark.session import get_spark

            spark = SparkSession.getActiveSession() or get_spark()
            return cls(spark, path, key_schema, value_field, value_type, state_type, num_buckets)

        return make

    # -- version pointer ---------------------------------------------------
    # Data directories are keyed by a monotonically increasing write sequence
    # (NOT the txid — a replayed txid must be able to read the old version
    # while writing the new one); _VERSION.json points at the committed seq.

    def _meta_path(self) -> str:
        return os.path.join(self.path, "_VERSION.json")

    def _committed_version(self) -> int | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)["version"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v}")

    def _next_seq(self) -> int:
        existing = [
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        ]
        return (max(existing) + 1) if existing else 1

    def _full_schema(self) -> StructType:
        from storm_spark.stream import _parse_ddl

        vt = _parse_ddl(self.value_type)
        s = StructType(self.key_schema.fields.copy())
        return s.add(CURR, vt).add(PREV, vt).add(TXID, LongType())

    def _read_state(self) -> DataFrame:
        v = self._committed_version()
        if v is None:
            return self.spark.createDataFrame([], self._full_schema())
        return self.spark.read.parquet(self._version_dir(v))

    # -- lifecycle ---------------------------------------------------------
    def begin_commit(self, txid: int) -> None:
        self._cur_txid = txid
        self._pending_seq: int | None = None

    def commit(self, txid: int) -> None:
        pending = getattr(self, "_pending_seq", None)
        if pending is not None:
            with open(self._meta_path(), "w") as f:
                json.dump({"version": pending, "txid": txid}, f)
            # the new version fully materialized at commit; drop older ones
            for d in os.listdir(self.path):
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) != pending:
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        self._cur_txid = None
        self._pending_seq = None

    # -- set-oriented merge (the hot path) ---------------------------------
    def update_from_agg(self, agg_df: DataFrame, agg, txid: int) -> None:
        """Merge one epoch's per-key partial aggregates (``__delta__`` col)."""
        state = self._read_state()
        zero = agg.zero_expr().cast(self.value_type)
        batch = agg_df.withColumnRenamed("__delta__", "__b__")

        j = state.alias("s").join(batch.alias("b"), on=self.key_names, how="full_outer")
        s_curr, s_prev, s_txid = F.col(CURR), F.col(PREV), F.col(TXID)
        b = F.col("__b__").cast(self.value_type)
        t = F.lit(txid)

        stored = s_txid.isNotNull()
        if self.state_type is StateType.OPAQUE:
            new_curr = (
                F.when(b.isNull(), s_curr)
                .when(~stored, agg.combine_expr(zero, b))
                .when(s_txid == t, agg.combine_expr(F.coalesce(s_prev, zero), b))
                .otherwise(agg.combine_expr(s_curr, b))
            )
            new_prev = (
                F.when(b.isNull(), s_prev)
                .when(~stored, F.lit(None).cast(self.value_type))
                .when(s_txid == t, s_prev)
                .otherwise(s_curr)
            )
        elif self.state_type is StateType.TRANSACTIONAL:
            new_curr = (
                F.when(b.isNull(), s_curr)
                .when(~stored, agg.combine_expr(zero, b))
                .when(s_txid == t, s_curr)  # same txid replay: skip
                .otherwise(agg.combine_expr(s_curr, b))
            )
            new_prev = F.lit(None).cast(self.value_type)
        else:
            new_curr = F.when(b.isNull(), s_curr).otherwise(
                agg.combine_expr(F.coalesce(s_curr, zero), b)
            )
            new_prev = F.lit(None).cast(self.value_type)

        new_txid = F.when(b.isNull(), s_txid).otherwise(t)
        out = j.select(
            *self.key_names,
            new_curr.cast(self.value_type).alias(CURR),
            new_prev.cast(self.value_type).alias(PREV),
            new_txid.alias(TXID),
        )
        seq = self._next_seq()
        target = self._version_dir(seq)
        out.repartition(self.num_buckets, *self.key_names).write.mode("overwrite").parquet(target)
        self._pending_seq = seq

    # -- point API (parity / tests; batched through the JVM) ---------------
    def multi_get(self, keys: Sequence[tuple]) -> list[Any]:
        df = self.dataframe(self.spark)
        key_rows = self.spark.createDataFrame(
            [tuple(k) for k in keys], StructType(self.key_schema.fields.copy())
        )
        got = {
            tuple(r[k] for k in self.key_names): r[self.value_field]
            for r in key_rows.join(df, on=self.key_names, how="inner").collect()
        }
        return [got.get(tuple(k)) for k in keys]

    def multi_put(self, keys: Sequence[tuple], vals: Sequence[Any]) -> None:
        raise NotImplementedError("use update_from_agg / partition_persist")

    def dataframe(self, spark: SparkSession) -> DataFrame:
        return self._read_state().select(
            *self.key_names, F.col(CURR).alias(self.value_field)
        )

    def as_dict(self) -> dict[tuple, Any]:
        return {
            tuple(r[k] for k in self.key_names): r[self.value_field]
            for r in self.dataframe(self.spark).collect()
        }
