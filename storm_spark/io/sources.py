"""Sources & sinks — the engine's connector surface.

Parity map (SURVEY §2.1/§2.2):

- ``IBatchSpout`` / ``ITridentSpout`` (replayable batch source) — any Spark
  file/table source: the offset log + deterministic listing IS the
  coordinator/emitter contract (``Source.getBatch(start, end)``).
- ``IPartitionedTridentSpout`` (transactional partitioned source, e.g.
  Kafka) — ``readStream`` with recorded offsets; same txid ⇒ same batch.
- ``IOpaquePartitionedTridentSpout`` — any source + the opaque state merge
  (replays may differ; state converges — see state/parquet_state.py).
- ``RichSpoutBatchExecutor`` (cap batch size) — ``maxFilesPerTrigger`` /
  ``maxOffsetsPerTrigger`` / the rate source.
- ``FixedBatchSpout``/``FeederSpout`` test fixtures — ``FixedBatchSource``
  here and ``FeederSource`` in topology.py.
- Sinks: Storm has none built in (§2.2) — state writes are the sink
  (``partition_persist`` / ``persistent_aggregate``); file sinks below are
  engine surface.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from storm_spark.stream import _parse_ddl


class FixedBatchSource:
    """Literal-tuple batches, emitted round-robin — parity:
    ``trident/testing/FixedBatchSpout.java:33-66`` (fields, maxBatchSize,
    rows...). Use with ``LocalCluster``: each ``next_batch()`` feed is one
    txid."""

    def __init__(
        self,
        fields: Sequence[str],
        max_batch_size: int,
        rows: Sequence[Sequence[Any]],
        types: Sequence[str] | None = None,
        cycle: bool = False,
    ):
        self.fields = list(fields)
        self.types = list(types) if types else ["string"] * len(self.fields)
        self.max_batch_size = max_batch_size
        self._rows = [list(r) for r in rows]
        self._pos = 0
        self.cycle = cycle

    def schema(self) -> StructType:
        s = StructType()
        for n, t in zip(self.fields, self.types):
            s = s.add(n, _parse_ddl(t))
        return s

    def next_batch(self) -> list[list[Any]]:
        if self._pos >= len(self._rows):
            if not self.cycle:
                return []
            self._pos = 0
        out = self._rows[self._pos : self._pos + self.max_batch_size]
        self._pos += len(out)
        return out


def parquet_source(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """Columnar scan with pushdown — the default source."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def csv_source(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True, **options
) -> DataFrame:
    """CSV with an explicit schema (inference is a full extra scan — never
    at 100 TB)."""
    if isinstance(schema, str):
        schema = _parse_ddl_struct(schema)
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def json_source(spark: SparkSession, path: str, schema: StructType | str, **options) -> DataFrame:
    if isinstance(schema, str):
        schema = _parse_ddl_struct(schema)
    return spark.read.options(**options).schema(schema).json(path)


def _parse_ddl_struct(ddl: str) -> StructType:
    t = _parse_ddl(ddl)
    if not isinstance(t, StructType):
        raise ValueError(f"expected a struct DDL, got {ddl!r}")
    return t


def stream_file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source; ``max_files_per_trigger`` is the batch-size cap
    (RichSpoutBatchExecutor parity)."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.load(path)


def rate_limited_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """The rate source — synthetic (timestamp, value) stream for smoke tests
    (parity: TestWordSpout-style generators)."""
    return (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    )


# -- sinks ------------------------------------------------------------------


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: Sequence[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def stream_to_parquet(df: DataFrame, path: str, checkpoint: str, trigger_seconds: int | None = None):
    """Append-mode streaming parquet sink (exactly-once via the sink's
    transaction log + source offsets)."""
    w = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    ).outputMode("append")
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()
