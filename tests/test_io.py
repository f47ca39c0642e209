"""Connector surface: fixture sources, csv/json schema-first readers,
streaming file source, parquet sinks."""

import os

import pytest
from pyspark.sql import functions as F

from storm_spark.io.sources import (
    FixedBatchSource,
    csv_source,
    json_source,
    parquet_source,
    stream_file_source,
    stream_to_parquet,
    write_parquet,
)


def test_fixed_batch_source_batches_and_cycle():
    src = FixedBatchSource(["w"], 2, [["a"], ["b"], ["c"]])
    assert src.next_batch() == [["a"], ["b"]]
    assert src.next_batch() == [["c"]]
    assert src.next_batch() == []  # exhausted, no cycle

    cyc = FixedBatchSource(["w"], 2, [["a"], ["b"], ["c"]], cycle=True)
    assert cyc.next_batch() == [["a"], ["b"]]
    assert cyc.next_batch() == [["c"]]
    assert cyc.next_batch() == [["a"], ["b"]]  # wrapped


def test_csv_json_schema_first(spark, tmp_path):
    csv = tmp_path / "t.csv"
    csv.write_text("k,v\na,1\nb,2\n")
    df = csv_source(spark, str(csv), "k string, v bigint")
    assert sorted(map(tuple, df.collect())) == [("a", 1), ("b", 2)]
    assert dict(df.dtypes) == {"k": "string", "v": "bigint"}

    js = tmp_path / "t.jsonl"
    js.write_text('{"k": "a", "v": 1}\n{"k": "b", "v": 2}\n')
    jdf = json_source(spark, str(js), "k string, v bigint")
    assert sorted(map(tuple, jdf.collect())) == [("a", 1), ("b", 2)]

    with pytest.raises(ValueError):
        csv_source(spark, str(csv), "bigint")  # non-struct DDL


def test_parquet_sink_partitioning(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "k string, v long")
    out = str(tmp_path / "p")
    write_parquet(df, out, partition_by=["k"])
    # hive-style layout: one dir per key
    assert sorted(d for d in os.listdir(out) if d.startswith("k=")) == ["k=a", "k=b"]
    back = parquet_source(spark, out, columns=["v"])
    assert sorted(r.v for r in back.collect()) == [1, 2, 3]


def test_stream_file_source_to_parquet_sink(spark, tmp_path):
    indir = tmp_path / "in"
    outdir = str(tmp_path / "out")
    os.makedirs(indir)
    spark.createDataFrame([("a", 1)], "k string, v long").coalesce(1).write.parquet(
        str(indir / "b1")
    )
    stream = stream_file_source(
        spark, f"{indir}/*", "k string, v long", max_files_per_trigger=1
    )
    q = stream_to_parquet(stream, outdir, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(map(tuple, spark.read.parquet(outdir).collect())) == [("a", 1)]
