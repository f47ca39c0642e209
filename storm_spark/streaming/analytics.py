"""Streaming corpus/usage analytics — the streaming side of the
temporal/retention operators.

Exact distinct counts are unsupported inside streaming aggregations, so the
streaming-native shape for "daily active keys" is a CHAIN of two stateful
operators: watermark-bounded dedup on (day, key) — each key survives once
per day — followed by a tumbling event-time window count. Both operators
keep their state in the checkpointed state store, hash-partitioned by key
across executors; state is dropped as the watermark advances, so it stays
bounded by the lateness horizon, not the stream length.

The trailing-N-day rolling variant stays batch-only
(``functions/temporal.rolling_distinct_count``): a sliding-window count
after dedup would double-count keys active on several days inside one
window, and exact cross-window distinct state is precisely what streaming
aggregation cannot hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_daily_active(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    delay: str = "1 day",
) -> DataFrame:
    """Exact distinct active keys per event-time day, streaming.

    Event time is truncated to the DAY START before watermarking, so every
    row of a given (day, key) carries the identical event time: the dedup
    state's acceptance boundary and eviction boundary coincide, and no
    same-day duplicate can arrive after its state evicted (watermarking the
    raw timestamp leaves exactly that gap — a row at 23:59 is still
    accepted after the 00:01 state of the same day aged out, double
    counting).

    Append-mode output: a day's row emits once the watermark passes its day
    + ``delay``; rows whose DAY is older than the watermark are dropped
    (day-granular late-data contract). Returns ``window(start, end),
    n_active``.
    """
    day_ts = F.date_trunc("day", F.col(ts_col))
    deduped = (
        stream_df.withColumn("__day_ts__", day_ts)
        .withWatermark("__day_ts__", delay)
        .dropDuplicatesWithinWatermark(["__day_ts__", key_col])
    )
    return (
        deduped.groupBy(F.window(F.col("__day_ts__"), "1 day"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    within: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Cross-batch stream-stream equi-join with watermark-bounded buffers —
    BEYOND the reference: Trident joins are strictly per-batch (the engine's
    ``Stream.join`` keeps that per-batch default, matching
    ``JoinerMultiReducer``'s semantics and bounding state trivially). This
    verb opts into Spark's cross-batch join for the cases per-batch can't
    express (a click joining an impression from minutes earlier): each side
    buffers rows in the checkpointed state store until the watermark passes.

    ``within`` bounds the event-time gap (``right_ts`` within [left_ts -
    within, left_ts + within]); REQUIRED for state cleanup — without a time
    bound an inner stream-stream join buffers both sides forever, which is
    exactly the unbounded-state failure mode the per-batch default avoids.

    Scale shape: both sides shuffle on the join key into the state store
    (partitioned across executors); state per key is bounded by rows inside
    the watermark+within horizon, dropped as event time advances.
    """
    if within is None:
        raise ValueError(
            "within is required: an unbounded stream-stream join buffers "
            "both sides forever (use the per-batch Stream.join for "
            "epoch-local semantics)"
        )
    on_l = [on] if isinstance(on, str) else list(on)
    right_keep = [c for c in right.columns if c not in on_l]
    shared = [c for c in right_keep if c in left.columns]
    if shared:
        raise ValueError(
            f"stream_stream_join: right columns {shared} collide with left "
            "columns; rename them before joining"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in on_l:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lo = F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}")
    hi = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
    cond = cond & F.col(f"r.{right_ts}").between(lo, hi)
    # collapse the duplicated join-key columns (keep the left side's)
    return l.join(r, cond, how).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right_keep],
    )
