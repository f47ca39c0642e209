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
