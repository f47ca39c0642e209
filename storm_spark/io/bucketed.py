"""Bucketed tables — co-located joins and aggregations without a shuffle.

The scale lever the prompt for every big join: when two tables are written
bucketed by the join key into the SAME number of buckets, Spark's scan
already satisfies the join's required distribution, so the SortMergeJoin
runs with NO Exchange on either side — at 100 TB that deletes the two
largest shuffles in a fact-fact join (e.g. lineitem ⋈ orders). A groupBy on
the bucket key likewise aggregates in place.

This is the storage-side complement of the reference's `partitionBy`
repartitioning verb (`Stream.java:207`): the reference co-locates by
hash-routing tuples at runtime per batch; a lake engine co-locates ONCE at
write time and every later query inherits it. Write cost is one shuffle —
amortized over every downstream join/agg on the key.

Plan contract (asserted in `tests/test_plans.py`): bucketed ⋈ bucketed on
the bucket key → zero Exchange; the same join on unbucketed parquet → two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> DataFrame:
    """Write ``df`` as a bucketed parquet table registered as ``table``
    (data at ``path``), bucketed by ``keys`` into ``n_buckets`` files per
    partition. ``sort=True`` also sorts within buckets — SortMergeJoin then
    skips its sort as well. Returns the re-read table.

    Size ``n_buckets`` so one bucket ≈ 100–200 MB at the target scale; both
    sides of a co-located join must use the same keys and bucket count.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)
    return spark.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table — the bucket spec only survives through the
    catalog (``spark.table``), not a raw ``read.parquet`` of the same path."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> DataFrame:
    """Write ``df`` hive-partitioned by ``partition_cols`` (one directory
    per value combination) and return the re-read frame.

    The partition-pruning lever: a filter on a partition column prunes at
    PLANNING time — unmatched directories are never listed, opened, or
    scanned (``PartitionFilters`` in the plan, asserted in
    ``tests/test_plans.py``). On a 100 TB events lake partitioned by day, a
    one-day query reads 1/365th of the data before a single task launches.
    Choose low-cardinality columns queries actually filter on (date, tenant,
    source); high-cardinality partitioning makes a small-files problem —
    bucket those instead (:func:`write_bucketed`)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return df.sparkSession.read.parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 21,
    n_files: int = 32,
    key_col: str = "z_key",
) -> DataFrame:
    """Write ``df`` clustered on a Z-order (Morton) key over two filter
    columns — the writer-path half of ``functions.layout`` (the
    ``zorder_stats`` gate measures the property; this materializes it):
    rows are range-partitioned into ``n_files`` files by the interleaved
    key and sorted within each, so every parquet file's min/max footer
    stats form a TIGHT bounding box in BOTH dimensions at once. A reader's
    two-sided predicate then skips files/row-groups the way a one-column
    sort only could for its leading column (asserted against real footers
    in ``tests/test_io.py``).

    Inputs must already be quantized to ``[0, 2^bits)`` (the
    :func:`storm_spark.functions.layout.zorder_key` contract). The key is
    kept as ``key_col`` so downstream writers can re-cluster compacted
    files without recomputing it. One range exchange total — the same
    single-shuffle cost as any clustered write, amortized over every
    later pruning read."""
    from storm_spark.functions.layout import zorder_key

    keyed = df.withColumn(key_col, zorder_key(x_col, y_col, bits))
    (
        keyed.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)
