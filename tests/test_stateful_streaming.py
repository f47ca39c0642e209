"""In-stream per-key state via applyInPandasWithState: cumulative counts
across micro-batches, checkpoint-backed."""

import os

import pytest
from pyspark.sql import functions as F

from storm_spark.streaming.stateful import running_word_counts


def test_running_word_counts_across_batches(spark, tmp_path):
    indir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    os.makedirs(indir)

    schema = "word string"
    b1 = spark.createDataFrame([("the",), ("cow",), ("the",)], schema)
    b2 = spark.createDataFrame([("the",), ("man",)], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{indir}/*")
    )
    out = running_word_counts(stream, "word")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_wc")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        after_b1 = {
            r.word: r["count"] for r in spark.sql("select * from running_wc").collect()
        }
        assert after_b1 == {"the": 2, "cow": 1}

        b2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        q.processAllAvailable()
        rows = spark.sql("select * from running_wc").collect()
    finally:
        q.stop()

    # update-mode memory sink appends each epoch's emissions; counts are
    # monotone, so the max per key is the final running value
    latest = {}
    for r in rows:
        latest[r.word] = max(latest.get(r.word, 0), r["count"])
    assert latest == {"the": 3, "cow": 1, "man": 1}
