from storm_spark.io.bucketed import read_bucketed, write_bucketed
from storm_spark.io.sources import (
    FixedBatchSource,
    csv_source,
    json_source,
    parquet_source,
    rate_limited_stream,
    stream_file_source,
)

__all__ = [
    "read_bucketed",
    "write_bucketed",
    "FixedBatchSource",
    "csv_source",
    "json_source",
    "parquet_source",
    "rate_limited_stream",
    "stream_file_source",
]
