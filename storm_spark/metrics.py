"""Metrics — parity with the reference's metrics API
(``backtype/storm/metric/api/*.java``: CountMetric, MultiCountMetric,
ReducedMetric(MeanReducer), CombinedMetric; consumer on the ``__metrics``
stream, ``Constants.java:32``).

Spark-first: metrics are **observable metrics** (``df.observe``) — computed
inside the job with zero extra passes, delivered to a listener (streaming) or
readable post-action (batch). No custom counters ship tuples anywhere.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class CountMetric:
    """Parity: ``metric/api/CountMetric.java`` — a named row counter."""

    def __init__(self, name: str = "count"):
        self.name = name

    def exprs(self) -> list[Column]:
        return [F.count(F.lit(1)).alias(self.name)]


class MultiCountMetric:
    """Parity: ``MultiCountMetric.java`` — per-key counters (one counter per
    distinct value of ``key_col``, reported as a map).

    Cost bound: the observe buffer gathers every key occurrence and the map
    build scans it once per DISTINCT key — O(n × distinct) inside one
    expression. That matches the reference's usage (keys are stream/
    component names: dozens of distinct values); for high-cardinality keys
    use a real ``groupBy(key).count()`` aggregation instead of a metric."""

    def __init__(self, key_col: str, name: str = "counts"):
        self.key_col = key_col
        self.name = name

    def exprs(self) -> list[Column]:
        # Count per distinct key, then build the map — map_from_entries over
        # raw (key, 1) pairs would produce duplicate map keys and throw under
        # spark.sql.mapKeyDedupPolicy=EXCEPTION on the first repeated key.
        arr = F.collect_list(F.col(self.key_col))
        return [
            F.map_from_entries(
                F.transform(
                    F.array_distinct(arr),
                    lambda k: F.struct(
                        k.alias("key"),
                        F.size(F.filter(arr, lambda x: x == k)).alias("value"),
                    ),
                )
            ).alias(self.name)
        ]


class MeanMetric:
    """Parity: ``ReducedMetric`` + ``MeanReducer``."""

    def __init__(self, value_col: str, name: str = "mean"):
        self.value_col = value_col
        self.name = name

    def exprs(self) -> list[Column]:
        return [F.avg(self.value_col).alias(self.name)]


class CombinedMetric:
    """Parity: ``CombinedMetric.java`` — user combiner expression."""

    def __init__(self, expr: Column, name: str):
        self.name = name
        self._expr = expr

    def exprs(self) -> list[Column]:
        return [self._expr.alias(self.name)]


def observe(df: DataFrame, observation: Observation, *metrics) -> DataFrame:
    """Attach metrics to a plan: ``observe(df, obs, CountMetric(), ...)``.
    After an action, ``observation.get`` holds the values (batch mode)."""
    exprs: list[Column] = []
    for m in metrics:
        exprs.extend(m.exprs())
    return df.observe(observation, *exprs)


class StreamingMetricsConsumer:
    """Collects per-epoch observed metrics from streaming queries.

    Parity: ``IMetricsConsumer`` registered on the ``__metrics`` stream —
    here a ``StreamingQueryListener`` reading ``observedMetrics``.
    """

    def __init__(self, spark: SparkSession):
        from pyspark.sql.streaming import StreamingQueryListener

        self.records: list[dict[str, Any]] = []
        self._lock = threading.Lock()
        consumer = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                om = event.progress.observedMetrics
                if om:
                    with consumer._lock:
                        for name, row in om.items():
                            consumer.records.append(
                                {"observation": name, **row.asDict()}
                            )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _Listener()
        spark.streams.addListener(self._listener)
        self._spark = spark

    def close(self) -> None:
        self._spark.streams.removeListener(self._listener)
