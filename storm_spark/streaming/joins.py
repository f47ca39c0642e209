"""Stream-stream interval join — watermarked two-sided correlation.

The reference joins streams per-batch (``Stream.join`` inside one Trident
batch, ``JoinerMultiReducer``); Spark's Structured Streaming adds the
UNBOUNDED cross-batch variant: two independently-arriving streams joined
on a key within an event-time interval, with both sides' watermarks
bounding the buffered state (storm has no analogue — a Trident join
forgets the other side at the batch boundary).

At scale the state per side is O(rows inside the watermark horizon), keyed
and co-partitioned by Spark's streaming symmetric hash join — the same
shuffle shape as a batch equi-join, plus time-range pruning of buffered
rows as the watermark advances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    lower_seconds: int,
    upper_seconds: int,
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key_col`` where the right row's
    event time falls in ``[left.ts + lower, left.ts + upper]``; ``how`` is
    ``inner`` or ``left_outer``.

    Both inputs MUST carry ``withWatermark(ts_col, ...)`` — the time-range
    conjunct plus the two watermarks is exactly what lets Spark expire
    buffered rows instead of holding both streams forever (the documented
    stream-stream join state-cleanup contract). Right columns keep their
    names unless they collide, in which case they get ``suffix``.

    ``left_outer`` adds the second streaming-only behavior: a MATCHED pair
    emits in the micro-batch where both sides are present, but an
    UNMATCHED left row emits (with NULL right columns) only once the
    watermark passes its join horizon — the engine cannot know "no match
    will ever come" earlier. A driver that needs every outer row flushed
    must advance the watermark past the data (feed a far-future sentinel)
    before stopping the query; same per-side state bound as inner.

    ``full_outer`` symmetrizes that: unmatched rows from EITHER side
    flush on watermark proof (a right-only row emits with NULL left
    columns). Same state bound — both sides were already buffered for the
    inner case; the outer variants only change what happens at eviction.
    ``right_outer`` is the mirror of ``left_outer``.
    """
    lcols = set(left.columns)
    renames = {c: (c + suffix if c in lcols else c) for c in right.columns}
    r = right.select([F.col(c).alias(renames[c]) for c in right.columns])
    rk, rt = renames[key_col], renames[ts_col]
    cond = (
        (F.col(key_col) == F.col(rk))
        & (F.col(rt) >= F.col(ts_col) + F.expr(f"INTERVAL {int(lower_seconds)} SECONDS"))
        & (F.col(rt) <= F.col(ts_col) + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS"))
    )
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream interval join type: {how}")
    return left.join(r, cond, how)


def static_enrich(
    stream: DataFrame,
    static: DataFrame,
    key_cols: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-STATIC join: enrich each streaming row with the matching row
    of a batch-computed dimension (a per-key profile, a lookup table, a
    model score) — the Structured-Streaming analogue of Trident's
    ``stateQuery`` + ``MapGet`` enrich (storm-core/src/jvm/storm/trident/
    Stream.java stateQuery): the reference queries a persistent state per
    tuple; Spark re-plans the static side into every micro-batch and joins
    it instead, so the "state read" is a join with full optimizer support.

    Stateless across batches — each micro-batch joins independently, no
    streaming state store, so any output mode works and there is no
    watermark requirement. At scale the per-batch plan is an ordinary
    batch join: the planner broadcasts the dimension when it fits and
    shuffle-joins otherwise (no forced broadcast hint here — a per-key
    profile is key-cardinality-sized and grows with the corpus; the
    mining.py:163 rationale).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return stream.join(static, keys, how)
