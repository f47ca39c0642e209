"""Streaming deduplication — the dedup family's streaming side.

An ingestion pipeline (the reference's spout→bolt topologies; here
``readStream`` sources) needs duplicates suppressed ON ARRIVAL, before they
reach state or storage:

- :func:`streaming_dedup_exact` — drop re-deliveries of the same key across
  the whole stream (state grows with distinct keys; use for bounded key
  domains: doc ids, event ids).
- :func:`streaming_dedup_within_watermark` — drop duplicates arriving
  within the watermark horizon (state is bounded by the horizon; the
  at-least-once-source case, e.g. replayed spout tuples — the engine
  analogue of the reference's acker-driven replay dedup by message id).
- :func:`streaming_dedup_fingerprint` — content-level exact dedup: md5 of
  the normalized text as the dedup key, composable with either scope.

All three are Spark-native stateful operators (``dropDuplicates`` /
``dropDuplicatesWithinWatermark``): state lives in the checkpointed state
store, hash-partitioned by key across executors — no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storm_spark.functions.text import fingerprint


def streaming_dedup_exact(stream_df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keep the first arrival per key, forever (state = distinct keys)."""
    return stream_df.dropDuplicates(key_cols)


def streaming_dedup_within_watermark(
    stream_df: DataFrame, key_cols: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon — state
    is dropped once the event-time watermark passes, so it stays bounded
    regardless of stream length. Requires ``ts_col`` event time; ``delay``
    is the lateness bound (e.g. ``'10 minutes'``)."""
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def streaming_dedup_fingerprint(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    delay: str | None = None,
) -> DataFrame:
    """Content-exact streaming dedup: fingerprint (md5 of normalized text)
    as the dedup key. With ``ts_col``+``delay``, scope the state to the
    watermark horizon; otherwise dedup across the whole stream."""
    with_fp = stream_df.withColumn("__fp__", fingerprint(text_col))
    if ts_col is not None and delay is not None:
        out = with_fp.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(["__fp__"])
    else:
        out = with_fp.dropDuplicates(["__fp__"])
    return out.drop("__fp__")
