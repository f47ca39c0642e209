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


def test_image_resize_nearest_neighbor_exact(assets):
    """The resize is real integer-index math over the stub-decoded pixels —
    recompute it in numpy per asset and compare buffers byte-for-byte."""
    import numpy as np

    from storm_spark.functions.multimodal import _decode_image_stub

    out = {r.doc_id: r for r in multimodal.image_resize(
        assets, "content", "doc_id", out_h=8, out_w=8).collect()}
    raw = {1: b"\x89PNG" + bytes(range(256)) * 8,
           2: b"RIFF" + bytes([7] * 5000),
           3: b"\x00\x00\x01\xba" + bytes([3, 1, 4] * 4000),
           4: b""}
    for doc_id, content in raw.items():
        px = _decode_image_stub(content)
        sh, sw = px.shape
        rows = (np.arange(8) * sh) // 8
        cols = (np.arange(8) * sw) // 8
        expect = px[np.ix_(rows, cols)].astype(np.int64)
        r = out[doc_id]
        assert (r.src_h, r.src_w, r.out_h, r.out_w) == (sh, sw, 8, 8)
        assert r.checksum == int(expect.sum())
        assert bytes(r.resized) == np.clip(expect, 0, 255).astype(np.uint8).tobytes()
    # empty content decodes to a single zero pixel -> all-zero 8x8
    assert out[4].checksum == 0 and bytes(out[4].resized) == bytes(64)


def test_image_resize_upsamples_small_sources(spark):
    """side < out: nearest-neighbor must repeat source pixels, not crash."""
    df = spark.createDataFrame([(1, b"abcd")], "doc_id bigint, content binary")
    r = multimodal.image_resize(df, "content", "doc_id", out_h=4, out_w=4).first()
    # 4 bytes -> side 2: 2x2 source [[97,98],[99,100]] upsampled 2x each way
    assert (r.src_h, r.src_w) == (2, 2)
    assert r.checksum == (97 + 98 + 99 + 100) * 4


def test_image_byte_stats_matches_byte_tile(assets):
    """The exact-oracle projection (integer column sums) is pinned to the
    deterministic _byte_tile view — NEVER the PIL path, so this holds
    whether or not a codec is installed: s_k = column sum of the (side,
    side) cyclic tile, np.resize'd to 16."""
    import numpy as np

    from storm_spark.functions.multimodal import _byte_tile

    stats = {r.doc_id: r for r in
             multimodal.image_byte_stats(assets, "content", "doc_id").collect()}
    raw = {r.doc_id: bytes(r.content) if r.content is not None else b""
           for r in assets.collect()}
    assert set(stats) == {1, 2, 3, 4}
    for doc_id, s in stats.items():
        px = _byte_tile(raw[doc_id])
        assert (s.width, s.height) == (px.shape[1], px.shape[0])
        expect = np.resize(
            px.astype(np.int64).sum(axis=0), multimodal.IMAGE_FEATURE_DIM
        )
        got = [getattr(s, f"s{k}") for k in range(multimodal.IMAGE_FEATURE_DIM)]
        assert got == expect.tolist(), (doc_id, got, expect)
        # cyclic resize: s_k repeats with period side
        for k in range(multimodal.IMAGE_FEATURE_DIM):
            assert got[k] == got[k % s.width]
    # empty content -> single zero pixel -> all-zero sums, 1x1
    assert stats[4].width == 1 and stats[4].s0 == 0 and stats[4].s15 == 0
