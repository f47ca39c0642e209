"""Custom stateful streaming operators via ``applyInPandasWithState``.

The foreachBatch + state-table path (``streaming/driver.py``) is the
Trident-parity route: state lives in an external queryable table. This module
is the *in-stream* route — per-key state held by Spark's state store,
checkpointed with the query, updated with arbitrary Python per micro-batch.
Use it when the running value is needed inside the stream (enrichment,
anomaly flags) rather than as a queryable table.

Parity: this is the idiomatic Spark home for the reference's general
``Aggregator`` contract applied across batches
(``storm/trident/operation/Aggregator.java:22-25`` +
``MemoryMapState``-backed persistentAggregate): init/update state per key,
emit any number of rows per batch.

Scale: state is hash-partitioned by key across executors by the state store;
each task sees only its keys' groups, Arrow-batched. Nothing collects to the
driver; skewed keys are the same concern as any keyed shuffle (salt upstream
if one key dominates).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_agg(
    stream_df: DataFrame,
    key_cols: list[str],
    init: Callable[[], Any],
    update: Callable[[Any, pd.DataFrame], Any],
    finish: Callable[[Any], dict],
    out_schema: str,
    state_schema: str = "state binary",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running aggregate across micro-batches.

    ``init()`` builds the zero state, ``update(state, pdf)`` folds one
    micro-batch's rows for the key, ``finish(state)`` renders the emitted row
    (minus key columns, which are prepended automatically). State is pickled
    into a single binary state column — opaque to Spark, versioned by the
    query checkpoint.
    """
    import pickle

    n_keys = len(key_cols)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc = pickle.loads(state.get[0]) if state.exists else init()
        for pdf in pdfs:
            acc = update(acc, pdf)
        state.update((pickle.dumps(acc),))
        row = {c: key[i] for i, c in enumerate(key_cols)}
        row.update(finish(acc))
        yield pd.DataFrame([row])

    assert n_keys >= 1
    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def stateful_sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Streaming sessionization with explicit state + event-time timeout:
    rows within ``gap_seconds`` of each other per key extend an open session;
    when the watermark passes the session end + gap, the CLOSED session emits
    (key, session_start, session_end, n_events) and its state clears.

    This is the custom-stateful-operator shape `session_window` can't cover
    when you need side effects or custom merge logic at session close.
    Requires ``withWatermark(ts_col, ...)`` upstream.
    """
    import pickle

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n = pickle.loads(state.get[0])
            state.remove()
            yield pd.DataFrame(
                [{key_col: key[0], "session_start": start, "session_end": end, "n_events": n}]
            )
            return
        start, end, n = (
            pickle.loads(state.get[0]) if state.exists else (None, None, 0)
        )
        # fold in event-time order — arrival order would let a
        # later-then-earlier pair within the watermark prematurely close a
        # session and mis-place its boundaries
        times = sorted(
            ts.timestamp() for pdf in pdfs for ts in pdf[ts_col]
        )
        for t in times:
            if start is None:
                start, end, n = t, t, 1
            elif t - end <= gap_seconds:
                # an event earlier than the open session's start (carried
                # over from a previous batch) extends it backwards
                start, end, n = min(start, t), max(end, t), n + 1
            else:
                # gap exceeded within the data itself: emit the old
                # session immediately, start a new one
                yield pd.DataFrame(
                    [{key_col: key[0], "session_start": start, "session_end": end, "n_events": n}]
                )
                start, end, n = t, t, 1
        state.update((pickle.dumps((start, end, n)),))
        # close when the event-time watermark passes session end + gap;
        # clamp above the CURRENT watermark — a key whose newest event sits
        # behind the stream's max event time can have end+gap already past
        # the watermark, and Spark rejects (kills the query on) a timeout
        # earlier than the watermark. The clamped deadline fires on the next
        # watermark advance, closing the session then.
        deadline = int((end + gap_seconds) * 1000)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline, wm + 1))
        yield pd.DataFrame([], columns=[key_col, "session_start", "session_end", "n_events"])

    # preserve the key column's real type (a bigint user id must not be
    # declared string — Arrow would reject the kernel's output)
    ktype = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} {ktype}, session_start double, "
            "session_end double, n_events long"
        ),
        stateStructType="state binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stateful_merge_intervals(
    stream_df: DataFrame,
    key_col: str,
    start_ts_col: str,
    end_ts_col: str,
) -> DataFrame:
    """Streaming twin of ``functions.temporal.merge_intervals``: per key,
    arriving ``[start, end]`` intervals extend the OPEN merged span while
    they overlap/touch it (``start <= span_end``); a strictly-later
    interval closes the span (immediate emit) and opens a new one; the
    LAST span closes by event-time timeout once the watermark passes its
    end — a future interval's start is at least the watermark, so overlap
    is provably impossible from then on. Emits
    ``(key, span_start, span_end, n_intervals)`` epoch-second doubles.

    State is ONE open span per key (three scalars) regardless of stream
    length. Contract: per-key interval STARTS non-decreasing across
    batches (the sessionize twins' time-ordered-source contract; within a
    batch, any order — rows fold sorted by (start, end)); under it the
    output equals the batch operator exactly. Unlike sessionize's
    gap rule, an early LONG interval holds the span open across many
    short later ones — the running-MAX(end) semantics.

    Requires ``withWatermark(start_ts_col, ...)`` upstream.
    """
    import pickle

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n = pickle.loads(state.get[0])
            state.remove()
            yield pd.DataFrame(
                [{key_col: key[0], "span_start": start, "span_end": end,
                  "n_intervals": n}]
            )
            return
        start, end, n = (
            pickle.loads(state.get[0]) if state.exists else (None, None, 0)
        )
        ivs = sorted(
            (s.timestamp(), e.timestamp())
            for pdf in pdfs
            for s, e in zip(pdf[start_ts_col], pdf[end_ts_col])
            if not (pd.isna(s) or pd.isna(e))
        )
        for s, e in ivs:
            if start is None:
                start, end, n = s, e, 1
            elif s <= end:
                # overlap/touch: extend (running MAX — e may be BEHIND the
                # open end when an early long interval swallows this one)
                start, end, n = min(start, s), max(end, e), n + 1
            else:
                yield pd.DataFrame(
                    [{key_col: key[0], "span_start": start, "span_end": end,
                      "n_intervals": n}]
                )
                start, end, n = s, e, 1
        if start is None:
            # new key whose batch held only null-bounded rows: nothing to
            # open — no state, no timeout (int(None * 1000) would raise;
            # ADVICE r7)
            yield pd.DataFrame(
                [], columns=[key_col, "span_start", "span_end", "n_intervals"]
            )
            return
        state.update((pickle.dumps((start, end, n)),))
        deadline = int(end * 1000)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline, wm + 1))
        yield pd.DataFrame(
            [], columns=[key_col, "span_start", "span_end", "n_intervals"]
        )

    ktype = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} {ktype}, span_start double, "
            "span_end double, n_intervals long"
        ),
        stateStructType="state binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stateful_gap_fill(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """In-stream twin of ``functions.temporal.gap_fill``: per key, emit one
    row per ``step_seconds`` bucket from the bucket after the last emitted
    one through the batch's max bucket, forward-filling the last observed
    per-bucket SUM across empty buckets — a time-series regularizer that
    never re-emits history (each bucket exactly once, state is just
    ``(last_bucket, last_value)`` per key).

    Contract: per-key buckets must be non-decreasing ACROSS batches (pair
    with a watermark and an event-time-ordered source, as the batch twin's
    grid is ordered by construction); a late row landing in an
    already-emitted bucket is dropped — the bucket's row is immutable once
    emitted. Within a batch, rows may arrive in any order.

    Scale: state is two scalars per key in the state store; emissions per
    batch are bounded by the key's bucket span, not its row count.
    """
    import pickle

    def fn(key, pdfs, state: GroupState):
        sums: dict = {}
        seen: set = set()
        for pdf in pdfs:
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                if pd.isna(ts):
                    # match the batch twin: a NULL-ts row contributes to no
                    # bucket (NaT.timestamp() would kill the query)
                    continue
                b = (int(ts.timestamp()) // step_seconds) * step_seconds
                seen.add(b)
                if not pd.isna(v):
                    # the batch twin's F.sum skips NULLs; a NaN here would
                    # poison the bucket sum and every forward-filled bucket
                    # after it. A bucket whose rows are ALL null-valued still
                    # extends the grid (it appears in the batch per-bucket
                    # table with a NULL sum) but emits as a gap below.
                    sums[b] = sums.get(b, 0.0) + float(v)
        last_b, last_v = pickle.loads(state.get[0]) if state.exists else (None, None)
        live_seen = {b for b in seen if last_b is None or b > last_b}
        if not live_seen:
            yield pd.DataFrame([], columns=[key_col, "bucket", "value", "is_gap"])
            return
        start = min(live_seen) if last_b is None else last_b + step_seconds
        maxb = max(live_seen)
        cur, rows = last_v, []
        for b in range(start, maxb + step_seconds, step_seconds):
            if b in sums:  # range starts past last_b, so b is never stale
                cur, gap = sums[b], False
            else:
                gap = True
            rows.append({key_col: key[0], "bucket": b, "value": cur, "is_gap": gap})
        state.update((pickle.dumps((maxb, cur)),))
        yield pd.DataFrame(rows)

    # preserve the key column's real type (a bigint user id must not be
    # declared string — Arrow would reject the kernel's output)
    ktype = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} {ktype}, bucket long, value double, is_gap boolean",
        stateStructType="state binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_transitions(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """In-stream twin of ``functions.temporal.event_transitions``: emit
    per-batch first-order transition counts, carrying each key's LAST event
    across micro-batches so the boundary transition (batch N's last event →
    batch N+1's first) is never lost — the thing a naive per-batch lag()
    can't see. State is one ``(ts, type)`` pair per key.

    Within a batch, rows fold in event-time order (ties keep arrival
    order; NULL timestamps sort first, matching the batch twin's
    ``asc_nulls_first`` lag ordering); emitted rows are per-batch DELTAS —
    sum downstream (or feed ``persistent_aggregate``) for running totals.

    Late data: an event whose ts is older than the key's stored last event
    time is DROPPED (counting it would require retracting an
    already-emitted transition — the same reason watermarked aggs drop
    late rows). Streaming totals therefore equal the batch twin's exactly
    when each key's events arrive in non-decreasing event-time order
    across batches; out-of-order arrivals are skipped, never miscounted.
    """
    import math
    import pickle

    def fn(key, pdfs, state: GroupState):
        last_ts, prev = (
            pickle.loads(state.get[0]) if state.exists else (None, None)
        )
        events = []
        for pdf in pdfs:
            for ts, t in zip(pdf[ts_col], pdf[type_col]):
                # NULL ts == "earliest" (batch twin's nulls-first lag); once
                # any event is in state it is late and drops like any other
                tsec = -math.inf if pd.isna(ts) else ts.timestamp()
                if last_ts is not None and tsec < last_ts:
                    continue  # late arrival — see docstring
                events.append((tsec, t))
        if not events:
            yield pd.DataFrame([], columns=["from_type", "to_type", "n"])
            return
        events.sort(key=lambda e: e[0])
        counts: dict = {}
        for tsec, t in events:
            if prev is not None:
                pair = (prev, t)
                counts[pair] = counts.get(pair, 0) + 1
            prev, last_ts = t, tsec
        state.update((pickle.dumps((last_ts, prev)),))
        yield pd.DataFrame(
            [{"from_type": a, "to_type": b, "n": n} for (a, b), n in counts.items()]
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="from_type string, to_type string, n long",
        stateStructType="state binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_word_counts(stream_df: DataFrame, word_col: str = "word") -> DataFrame:
    """The reference's canonical streaming word count as an in-stream
    stateful op: emits (word, count) with the cumulative count every time a
    word appears in a micro-batch."""
    return stateful_running_agg(
        stream_df,
        [word_col],
        init=lambda: 0,
        update=lambda acc, pdf: acc + len(pdf),
        finish=lambda acc: {"count": acc},
        out_schema=f"{word_col} string, count long",
    )


def stateful_trailing_zscore(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: int = 24,
    min_periods: int = 8,
) -> DataFrame:
    """In-stream twin of ``functions.robust.trailing_zscore``: each
    arriving value z-scores against the key's trailing ``window`` previous
    values, with the buffer carried across micro-batches — the score a
    per-batch window can't produce for a batch's first rows. Emits
    ``(key, ts, value, z)`` per event; z is NULL during warm-up
    (< ``min_periods`` trailing values) or at zero variance.

    Same trailing-window semantics as the batch twin (current row
    excluded; identical s2/n − (s/n)² arithmetic on the same values; a
    NULL value occupies a frame slot but contributes nothing to the sums
    and emits its own z-NULL row, exactly like the batch ROWS frame), and
    the same late-data contract as :func:`stateful_transitions`: an event
    older than the key's newest seen event time is DROPPED (its score
    would need the buffer as of an earlier point — gone). Streaming
    scores therefore equal the batch twin's exactly when each key's
    events arrive in non-decreasing event-time order across batches.

    State per key is ``(last_ts, deque of ≤ window values)`` — O(window)
    bytes, the same bound the batch operator's streaming frame buffer has.
    """
    import math
    import pickle

    def fn(key, pdfs, state: GroupState):
        last_ts, buf = (
            pickle.loads(state.get[0]) if state.exists else (None, [])
        )
        events = []
        for pdf in pdfs:
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                if pd.isna(ts):
                    continue
                tsec = ts.timestamp()
                if last_ts is not None and tsec < last_ts:
                    continue  # late arrival — see docstring
                # truncate like the batch twin's cast("bigint") so a
                # non-integer input scores identically on both paths; a
                # NULL value stays None — the batch ROWS frame keeps it as
                # a frame SLOT (shrinking effective n via COUNT) and still
                # emits its z-NULL row, so we must too
                events.append((tsec, ts, None if pd.isna(v) else float(int(v))))
        if not events:
            yield pd.DataFrame([], columns=[key_col, ts_col, value_col, "z"])
            return
        events.sort(key=lambda e: e[0])
        rows = []
        for tsec, ts, v in events:
            z = None
            vals = [x for x in buf if x is not None]
            n = len(vals)
            if v is not None and n >= min_periods:
                s = sum(vals)
                s2 = sum(x * x for x in vals)
                mean = s / n
                var = max(s2 / n - mean * mean, 0.0)
                if var > 0:
                    z = (v - mean) / math.sqrt(var)
            rows.append(
                {key_col: key[0], ts_col: ts, value_col: v, "z": z}
            )
            buf.append(v)
            if len(buf) > window:
                buf.pop(0)
            last_ts = tsec
        state.update((pickle.dumps((last_ts, buf)),))
        yield pd.DataFrame(rows)

    ktype = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} {ktype}, {ts_col} timestamp, "
            f"{value_col} double, z double"
        ),
        stateStructType="state binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_topk(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    tiebreak_cols: list[str],
    k: int,
    flush_at_ts: float,
) -> DataFrame:
    """Streaming grouped FirstN (the reference's partial/final top-k,
    ``FirstN.java:31-124``, kept ACROSS batches instead of per-batch):
    per key, maintain the running top-``k`` rows by ``order_col``
    descending (ties broken by ``tiebreak_cols`` ascending — the exact
    ordering contract of the batch ranking window), and emit the final
    ranked top-k ONCE, when the event-time watermark passes the key's
    last observed event (sentinel-driven end-of-stream, the sessionize
    twin's close-out pattern).

    Unlike the order-sensitive twins, top-k maintenance is
    ORDER-INSENSITIVE — merging candidates commutes — so this twin needs
    no time-ordered-source contract for value correctness; the watermark
    only gates WHEN the final answer emits. State per key is exactly k
    carried rows, O(k) regardless of stream length — the reference's
    PriorityQueue partial aggregate as checkpointed GroupState.

    ``flush_at_ts`` (epoch seconds) is the leaderboard-close instant:
    every key's timeout pins to it, and the answer emits once the
    watermark passes it (sentinel rows beyond the close). A per-key
    "last event + delta" deadline is WRONG here — a key silent for one
    trigger while the global watermark advances past its deadline would
    emit a partial top-k mid-stream and then a second one at the end
    (caught by the sf0.001 gate, where inter-event gaps are hours).
    """
    import pickle

    carried = [order_col] + list(tiebreak_cols)

    def sort_key(row):
        return (-row[0], *row[1:])

    def fn(key, pdfs, state: GroupState):
        cols = [key_col, *carried, "rank"]
        if state.hasTimedOut:
            items = pickle.loads(state.get[0])
            state.remove()
            items.sort(key=sort_key)
            yield pd.DataFrame(
                [
                    {key_col: key[0], **dict(zip(carried, it)), "rank": i + 1}
                    for i, it in enumerate(items[: int(k)])
                ],
                columns=cols,
            )
            return
        items = pickle.loads(state.get[0]) if state.exists else []
        for pdf in pdfs:
            for vals in zip(pdf[ts_col], *(pdf[c] for c in carried)):
                ts, row = vals[0], tuple(vals[1:])
                if pd.isna(ts) or any(pd.isna(v) for v in row):
                    continue
                items.append(tuple(v.item() if hasattr(v, "item") else v for v in row))
        items.sort(key=sort_key)
        items = items[: int(k)]
        state.update((pickle.dumps(items),))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(flush_at_ts * 1000) + 1000, wm + 1))
        yield pd.DataFrame([], columns=cols)

    ktype = stream_df.schema[key_col].dataType.simpleString()
    carried_schema = ", ".join(
        f"{c} {stream_df.schema[c].dataType.simpleString()}" for c in carried
    )
    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} {ktype}, {carried_schema}, rank int",
        stateStructType="state binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
