"""Continuous hierarchical rollup — a hypertable-style continuous aggregate.

Beyond-reference (north star): maintain a fine-grained aggregate (e.g.
hourly) AND a coarse rollup (e.g. daily) incrementally, one epoch at a time,
on top of the engine's exactly-once state layer:

1. the fine state absorbs the epoch's rows through the normal
   opaque/transactional combiner merge (replay-safe);
2. the coarse buckets AFFECTED by this epoch are recomputed from the fine
   state (never from raw data) and REPLACED in the coarse state.

Replace-not-combine is what makes step 2 idempotent under replays: a fine
bucket's new value supersedes its old contribution, so recomputing the
parent from fine state is always correct, while combining deltas upward
would double-count on replay. This is the standard continuous-aggregate
invalidation design (TimescaleDB-style), expressed in two keyed state
tables.

Scale: per epoch the work is (epoch rows -> fine merge on touched fine
buckets) + (touched coarse buckets × their fine children -> coarse replace).
Both are key-partitioned shuffles over touched data only; nothing reads the
full table. 100 TB of history costs nothing per epoch — only the touched
slices move.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _Replace:
    """Pseudo-combiner for the coarse state: the new value supersedes the
    stored value (idempotent under replays by construction)."""

    def __init__(self, value_type: str):
        self.value_type = value_type

    def zero_expr(self) -> Column:
        return F.lit(None)

    def combine_expr(self, a: Column, b: Column) -> Column:
        return b

    # python path (MemoryMapState)
    def zero(self):
        return None

    def combine(self, a, b):
        return b


class ContinuousRollup:
    """Two-level continuous aggregate over a timestamped keyed stream.

    ``fine_bucket`` / ``coarse_bucket`` map the timestamp column to bucket
    ids (e.g. ``date_trunc('hour', ts)`` epoch / ``date_trunc('day', ts)``
    epoch). ``agg_expr`` aggregates the value column within a bucket
    (decomposable: sum/count/min/max); ``coarse_from_fine`` re-aggregates
    fine values into a coarse bucket (sum for sum/count, min for min, ...).
    """

    def __init__(
        self,
        spark,
        state_factory: Callable,
        keys: Sequence[str],
        ts_col: str,
        value_expr: Column,
        fine_bucket: Callable[[Column], Column],
        coarse_bucket_of_fine: Callable[[Column], Column],
        value_type: str = "bigint",
        agg=None,
    ):
        from pyspark.sql.types import LongType, StructType

        from storm_spark.operations import Sum

        self.spark = spark
        self.keys = list(keys)
        self.ts_col = ts_col
        self.value_expr = value_expr
        self.fine_bucket = fine_bucket
        self.coarse_bucket_of_fine = coarse_bucket_of_fine
        self.agg = agg or Sum(value_type)
        self.value_type = value_type

        fine_schema = StructType().add("fine_bucket", LongType())
        coarse_schema = StructType().add("coarse_bucket", LongType())
        for k in self.keys:
            fine_schema = fine_schema.add(k, "string")
            coarse_schema = coarse_schema.add(k, "string")
        self.fine_state = state_factory("fine", fine_schema, "value", value_type)
        self.coarse_state = state_factory("coarse", coarse_schema, "value", value_type)
        self._replace = _Replace(value_type)

    def process_epoch(self, batch_df: DataFrame, txid: int) -> None:
        """Merge one epoch: fine combiner merge, then coarse recompute of the
        affected coarse buckets from fine state (replace semantics)."""
        fine_keys = ["fine_bucket", *self.keys]
        coarse_keys = ["coarse_bucket", *self.keys]

        # 1. fine merge (normal opaque/transactional combiner protocol)
        fine_delta = (
            batch_df.withColumn("fine_bucket", self.fine_bucket(F.col(self.ts_col)))
            .groupBy(*fine_keys)
            .agg(self.agg.agg_expr([self.value_expr]).alias("__delta__"))
        ).persist()
        self.fine_state.begin_commit(txid)
        self.fine_state.update_from_agg(fine_delta, self.agg, txid)
        self.fine_state.commit(txid)

        # 2. coarse recompute: affected coarse buckets, from fine state only
        touched_coarse = (
            fine_delta.select(
                self.coarse_bucket_of_fine(F.col("fine_bucket")).alias("coarse_bucket"),
                *self.keys,
            ).distinct()
        )
        fine_now = self.fine_state.dataframe(self.spark).withColumn(
            "coarse_bucket", self.coarse_bucket_of_fine(F.col("fine_bucket"))
        )
        # the aggregator must be self-decomposable (agg of partials == total:
        # sum/min/max; counts roll up via Sum over the fine counts)
        recomputed = (
            fine_now.join(F.broadcast(touched_coarse), on=coarse_keys, how="left_semi")
            .groupBy(*coarse_keys)
            .agg(self.agg.agg_expr([F.col("value")]).alias("__delta__"))
        )
        self.coarse_state.begin_commit(txid)
        self.coarse_state.update_from_agg(recomputed, self._replace, txid)
        self.coarse_state.commit(txid)
        fine_delta.unpersist()

    def fine(self) -> DataFrame:
        return self.fine_state.dataframe(self.spark)

    def coarse(self) -> DataFrame:
        return self.coarse_state.dataframe(self.spark)
