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
Both are key-partitioned shuffles over touched data only; with
``fine_range_of_coarse`` set, the coarse recompute's fine-state scan prunes
to the touched buckets' range as well — 100 TB of history costs nothing per
epoch, only the touched slices move.
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
    FINE VALUES into a coarse bucket — it differs from ``agg`` whenever the
    aggregator is not self-decomposable: counts roll up by SUMMING the fine
    counts (``Count`` defaults to this automatically); composite aggregators
    (``Avg``) must pass it explicitly or construction fails fast.

    ``fine_range_of_coarse`` (optional) maps a coarse bucket id to the
    inclusive (lo, hi) fine-bucket range it covers (e.g. day ``d`` →
    ``(d*24, d*24+23)`` for hourly-under-daily). When provided, the coarse
    recompute filters the fine scan by a PUSHABLE range predicate on the
    stored ``fine_bucket`` column instead of reading the whole fine table —
    the lever that keeps per-epoch cost proportional to touched data as
    history grows.
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
        coarse_from_fine: Callable[[Column], Column] | None = None,
        fine_range_of_coarse: Callable[[int], tuple[int, int]] | None = None,
    ):
        from pyspark.sql.types import LongType, StructType

        from storm_spark.operations import Sum

        self.spark = spark
        self.keys = list(keys)
        self.ts_col = ts_col
        self.value_expr = value_expr
        self.fine_bucket = fine_bucket
        self.coarse_bucket_of_fine = coarse_bucket_of_fine
        from storm_spark.operations import Count

        self.agg = agg or Sum(value_type)
        self.value_type = value_type
        if coarse_from_fine is not None:
            self.coarse_from_fine = coarse_from_fine
        elif isinstance(self.agg, Count):
            # a count of counts is wrong — fine COUNT values SUM upward
            self.coarse_from_fine = F.sum
        elif hasattr(self.agg, "state_value_type"):
            raise ValueError(
                "composite aggregators (Avg) need an explicit coarse_from_fine "
                "to re-aggregate fine values into coarse buckets"
            )
        else:
            self.coarse_from_fine = lambda c: self.agg.agg_expr([c])
        self.fine_range_of_coarse = fine_range_of_coarse

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
        touched_coarse = (
            fine_delta.select(
                self.coarse_bucket_of_fine(F.col("fine_bucket")).alias("coarse_bucket"),
                *self.keys,
            ).distinct()
        )
        # the coarse prune's bounds read only the (persisted) fine delta —
        # independent of the fine-state merge, so compute them WHILE the
        # fine commit runs (guide §2.6: overlap independent jobs) instead
        # of as a blocking round-trip between the two commits
        from concurrent.futures import ThreadPoolExecutor

        f_bounds = None
        with ThreadPoolExecutor(max_workers=1) as pool:
            if self.fine_range_of_coarse is not None:
                f_bounds = pool.submit(
                    touched_coarse.agg(
                        F.min("coarse_bucket").alias("lo"),
                        F.max("coarse_bucket").alias("hi"),
                    ).first
                )
            self.fine_state.begin_commit(txid)
            self.fine_state.update_from_agg(fine_delta, self.agg, txid)
            self.fine_state.commit(txid)
            bounds = f_bounds.result() if f_bounds is not None else None

        # 2. coarse recompute: affected coarse buckets, from fine state only
        fine_now = self.fine_state.dataframe(self.spark)
        if bounds is not None:
            # pushable prune: restrict the fine scan to the touched coarse
            # buckets' fine ranges BEFORE deriving the (unpushable) coarse id
            if bounds["lo"] is not None:
                lo, _ = self.fine_range_of_coarse(bounds["lo"])
                _, hi = self.fine_range_of_coarse(bounds["hi"])
                fine_now = fine_now.filter(F.col("fine_bucket").between(lo, hi))
        fine_now = fine_now.withColumn(
            "coarse_bucket", self.coarse_bucket_of_fine(F.col("fine_bucket"))
        )
        recomputed = (
            fine_now.join(F.broadcast(touched_coarse), on=coarse_keys, how="left_semi")
            .groupBy(*coarse_keys)
            .agg(self.coarse_from_fine(F.col("value")).alias("__delta__"))
        )
        self.coarse_state.begin_commit(txid)
        self.coarse_state.update_from_agg(recomputed, self._replace, txid)
        self.coarse_state.commit(txid)
        fine_delta.unpersist()

    def fine(self) -> DataFrame:
        return self.fine_state.dataframe(self.spark)

    def coarse(self) -> DataFrame:
        return self.coarse_state.dataframe(self.spark)
