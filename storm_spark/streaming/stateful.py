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
