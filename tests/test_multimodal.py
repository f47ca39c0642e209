"""Multimodal binary-column plumbing: schema, batch shape, 1-to-n frames.

The decode kernels are deterministic stubs (codecs aren't in this image) —
these tests pin the Spark-side contract: typed output schemas, Arrow batch
flow through mapInPandas, per-asset feature dims, frame fan-out counts, and
byte-budget partition sizing.
"""

import pyspark.sql.functions as F
import pytest

from storm_spark.functions import multimodal


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, b"\x89PNG" + bytes(range(256)) * 8, "image/png"),
        (2, b"RIFF" + bytes([7] * 5000), "audio/wav"),
        (3, b"\x00\x00\x01\xba" + bytes([3, 1, 4] * 4000), "video/mpeg"),
        (4, b"", "image/png"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, content binary, mime string")


def test_image_features_schema_and_dim(assets):
    out = multimodal.image_features(assets, "content", "doc_id")
    assert [f.name for f in out.schema.fields] == ["doc_id", "feature", "width", "height"]
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2, 3, 4}
    for r in got.values():
        assert len(r.feature) == multimodal.IMAGE_FEATURE_DIM
        assert r.width >= 1 and r.height >= 1


def test_image_features_deterministic(assets):
    a = sorted(multimodal.image_features(assets).collect())
    b = sorted(multimodal.image_features(assets).collect())
    assert a == b


def test_frame_sample_fanout(assets):
    out = multimodal.frame_sample(assets, "content", "doc_id", every_n=2)
    counts = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # doc 3: 12000 bytes -> 11 frames of 1024 -> every 2nd -> 6 samples
    assert counts[3] == 6
    # empty asset still yields exactly one (empty) frame row
    assert counts[4] == 1
    frame0 = out.filter((F.col("doc_id") == 3) & (F.col("frame_no") == 0)).first()
    assert bytes(frame0.frame) == (b"\x00\x00\x01\xba" + bytes([3, 1, 4] * 4000))[:1024]


def test_byte_budget_partitions(assets):
    sized = assets.withColumn("n_bytes", F.length("content"))
    out = multimodal.with_byte_budget_partitions(sized, "n_bytes", target_mb=128)
    # tiny payload -> single partition; contract is "ceil(total/budget)"
    assert out.rdd.getNumPartitions() == 1
    assert out.count() == 4


def test_audio_features_schema_and_bands(assets):
    out = multimodal.audio_features(assets, "content", "doc_id")
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2, 3, 4}
    for r in got.values():
        assert len(r.energy) == multimodal.AUDIO_FEATURE_DIM
        assert all(e >= 0 for e in r.energy)
        assert r.n_samples >= 1
        assert abs(r.duration_s - r.n_samples / 16000) < 1e-6
    # deterministic
    again = {r.doc_id: r for r in multimodal.audio_features(assets).collect()}
    assert got == again
