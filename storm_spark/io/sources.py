"""Sources & sinks — the engine's connector surface.

Parity map (SURVEY §2.1/§2.2):

- ``IBatchSpout`` / ``ITridentSpout`` (replayable batch source) — any Spark
  file/table source: the offset log + deterministic listing IS the
  coordinator/emitter contract (``Source.getBatch(start, end)``).
- ``IPartitionedTridentSpout`` (transactional partitioned source, e.g.
  Kafka) — :class:`PartitionedOffsetSource`: a non-file partitioned source
  with a persisted per-txid offset log; same txid ⇒ same batch, across
  restarts (a real broker client slots into the same recorded-ranges
  contract).
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
        return self.encode_rows(out)

    def encode_rows(self, rows: Sequence[Sequence[Any]]) -> list[list[Any]]:
        """Encode ``object``-typed columns via the global encoder registry
        (Kryo analogue — serialization.py)."""
        from storm_spark.serialization import encode_rows

        return encode_rows(rows, self.types)


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


class PartitionedOffsetSource:
    """A partitioned, offset-addressable NON-FILE source with a persisted
    per-txid offset log — the engine's ``IPartitionedTridentSpout`` port
    (``IPartitionedTridentSpout.java:33-73``: Coordinator knows the
    partition set; Emitter records partition metadata for a new txid via
    ``emitPartitionBatchNew`` and re-emits the IDENTICAL batch for a
    replayed txid via ``emitPartitionBatch``).

    Kafka-shaped model: a fixed set of numbered partitions, each a
    monotonically growing log addressed by offset; ``produce`` advances a
    partition's high-water mark (the broker side). The emitter contract:

    - ``batch_df(txid)`` — first sighting of a txid snapshots
      ``[committed floor, high-water mark)`` per partition into the offset
      log (``<path>/tx<id>.json``, atomic rename — the reference's
      partition metadata in ZK), then builds the batch as a union of
      ``spark.range(start, end)`` per partition mapped through the record
      expression: rows materialize ON THE EXECUTORS, never the driver.
    - A REPLAYED txid — same id, including from a fresh instance after a
      restart — rebuilds the batch from the recorded ranges: same txid ⇒
      same batch, row-identical. This is what makes TRANSACTIONAL state
      (skip on seen txid) exact on this source.
    - ``commit(txid)`` advances the committed floor to the txid's ends.

    Records derive deterministically from (partition, offset) through
    ``record_expr`` (default: an md5 payload) — swap in any Column
    expression; a real broker client would instead fetch by the same
    recorded ranges (the contract is the offset log, not the payload).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_partitions: int = 4,
        record_expr=None,
    ):
        import os

        self.spark = spark
        self.path = path
        self.n_partitions = n_partitions
        self._record_expr = record_expr
        os.makedirs(path, exist_ok=True)

    # -- broker side --------------------------------------------------------
    def _hwm_path(self) -> str:
        import os

        return os.path.join(self.path, "hwm.json")

    def _hwm(self) -> dict[str, int]:
        import json

        try:
            with open(self._hwm_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            # first run: no marks yet
            return {str(p): 0 for p in range(self.n_partitions)}
        # a CORRUPT existing file must raise, not silently reset every
        # partition to offset 0 (the next produce() would then persist the
        # zeroed marks, permanently discarding the real offsets)

    def produce(self, partition: int, n: int) -> None:
        """Advance a partition's high-water mark by ``n`` records."""
        import json
        import os

        hwm = self._hwm()
        hwm[str(partition)] = hwm.get(str(partition), 0) + n
        tmp = self._hwm_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(hwm, f)
        os.replace(tmp, self._hwm_path())

    # -- coordinator / emitter ----------------------------------------------
    def partitions(self) -> list[int]:
        """Parity: ``Coordinator.getPartitionsForBatch``."""
        return list(range(self.n_partitions))

    def _tx_path(self, txid: int) -> str:
        import os

        return os.path.join(self.path, f"tx{txid}.json")

    def _load_tx(self, txid: int) -> dict[str, list[int]] | None:
        import json

        try:
            with open(self._tx_path(txid)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _committed_floor(self) -> dict[str, int]:
        """Start offsets for the next new batch: the ends of the highest
        RECORDED txid (batches partition the log sequentially)."""
        import os
        import re

        txids = [
            int(m.group(1))
            for d in os.listdir(self.path)
            if (m := re.fullmatch(r"tx(\d+)\.json", d))
        ]
        if not txids:
            return {str(p): 0 for p in range(self.n_partitions)}
        meta = self._load_tx(max(txids)) or {}
        return {p: rng[1] for p, rng in meta.items()}

    def batch_df(self, txid: int) -> DataFrame:
        """The batch for ``txid`` — recorded once, replayed identically."""
        import json
        import os

        from pyspark.sql import functions as F

        meta = self._load_tx(txid)
        if meta is None:
            floor = self._committed_floor()
            hwm = self._hwm()
            meta = {
                str(p): [floor.get(str(p), 0), hwm.get(str(p), 0)]
                for p in range(self.n_partitions)
            }
            tmp = self._tx_path(txid) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, self._tx_path(txid))

        out = None
        for p in range(self.n_partitions):
            start, end = meta.get(str(p), [0, 0])
            part = self.spark.range(start, end).select(
                F.lit(p).alias("partition"), F.col("id").alias("offset")
            )
            out = part if out is None else out.union(part)
        rec = self._record_expr or (
            lambda pc, oc: {"value": F.md5(F.concat(pc.cast("string"), F.lit(":"), oc.cast("string")))}
        )
        cols = rec(F.col("partition"), F.col("offset"))
        return out.select("partition", "offset", *[c.alias(n) for n, c in cols.items()])

    def commit(self, txid: int) -> None:
        """Advance the committed floor (kept implicit in the tx log: the
        floor derives from the highest recorded txid's ends; commit prunes
        logs older than the previous txid so replays of the CURRENT txid
        stay reproducible — MasterBatchCoordinator keeps exactly one
        in-flight txid at a time)."""
        import os
        import re

        for d in os.listdir(self.path):
            m = re.fullmatch(r"tx(\d+)\.json", d)
            if m and int(m.group(1)) < txid - 1:
                os.remove(os.path.join(self.path, d))


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
