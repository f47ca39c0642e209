from storm_spark.io.sources import (
    FixedBatchSource,
    csv_source,
    json_source,
    parquet_source,
    rate_limited_stream,
    stream_file_source,
)

__all__ = [
    "FixedBatchSource",
    "csv_source",
    "json_source",
    "parquet_source",
    "rate_limited_stream",
    "stream_file_source",
]
