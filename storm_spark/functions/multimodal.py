"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side contract is real and tested: typed schemas, Arrow-batched
``mapInPandas`` decode/feature kernels, partition sizing by byte budget.
Decoders use the real codec (PIL / soundfile) when importable and the bytes
decode; otherwise they fall back to a clearly-marked deterministic fake so
the pipeline plumbing stays testable in codec-less images (this container
has neither codec; ffmpeg frame extraction remains stubbed as fixed byte
windows).

Schema convention for a multimodal table::

    content   binary        -- the encoded asset
    mime      string        -- 'image/png', 'audio/wav', ...
    meta      struct<width int, height int, sample_rate int, n_frames int>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_DIM = 16


def _byte_tile(content: bytes) -> np.ndarray:
    """The deterministic byte-tile view of arbitrary bytes: frombuffer over
    the first 4096 bytes, cyclic ``np.resize`` to a (side, side) tile with
    ``side = floor(sqrt(n))`` — pure byte arithmetic, SQL-expressible
    bit-for-bit (the `multimodal_features` oracle unrolls it)."""
    content = content or b""  # NULL content cells decode as empty, not crash
    arr = np.frombuffer(content[:4096], dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return np.resize(arr, (side, side)).astype(np.float32)


def _decode_image_stub(content: bytes) -> np.ndarray:
    """Image decode: real ``PIL.Image.open`` when the codec is importable
    AND the bytes are a decodable image; otherwise the deterministic
    :func:`_byte_tile` fake so the pipeline plumbing stays testable in
    codec-less images."""
    content = content or b""  # NULL content cells decode as empty, not crash
    try:
        import io

        import PIL.Image

        with PIL.Image.open(io.BytesIO(content)) as img:
            return np.asarray(img.convert("L"), dtype=np.float32)
    except Exception:
        # PIL absent, or bytes aren't a decodable image → deterministic fake
        pass
    return _byte_tile(content)


def image_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Decode images and emit a fixed-dim feature vector per asset.

    Arrow-batched ``mapInPandas``; at scale, repartition the input so each
    task holds ~128 MB of encoded bytes (binary columns defeat row-count
    heuristics — size by bytes, not rows).
    """
    out_schema = f"{id_col} bigint, feature array<float>, width int, height int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for content in pdf[content_col]:
                px = _decode_image_stub(content)
                feats.append(np.resize(px.mean(axis=0), IMAGE_FEATURE_DIM).astype(np.float32).tolist())
                widths.append(px.shape[1])
                heights.append(px.shape[0])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "feature": feats,
                    "width": widths,
                    "height": heights,
                }
            )

    return df.mapInPandas(kernel, out_schema)


AUDIO_FEATURE_DIM = 8


def _decode_audio_stub(content: bytes, sample_rate: int = 16000) -> tuple:
    """Audio decode → (pcm, actual_rate): real ``soundfile.read`` when the
    codec is importable AND the bytes are a decodable container — the file's
    OWN sample rate is returned (durations computed from a caller-assumed
    rate were wrong for any non-16 kHz file); otherwise a deterministic
    pseudo-PCM fake at the caller's rate (same contract as the image stub)."""
    content = content or b""  # NULL content cells decode as empty, not crash
    try:
        import io

        import soundfile

        data, sr = soundfile.read(io.BytesIO(content), dtype="float32")
        return (data if data.ndim == 1 else data.mean(axis=1)), sr
    except Exception:
        pass
    arr = np.frombuffer(content[:8192], dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.float32)
    return (arr - 127.5) / 127.5, sample_rate  # pseudo-PCM in [-1, 1]


def audio_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id", sample_rate: int = 16000
) -> DataFrame:
    """Decode audio and emit banded energy features per asset (the
    mel-spectrogram shape without the codec): RMS energy over
    ``AUDIO_FEATURE_DIM`` equal time bands, plus duration. Arrow-batched
    ``mapInPandas`` — identical plumbing to :func:`image_features`."""
    out_schema = f"{id_col} bigint, energy array<float>, n_samples int, duration_s float"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            energies, n_samples, durations = [], [], []
            for content in pdf[content_col]:
                pcm, sr = _decode_audio_stub(content, sample_rate)
                bands = np.array_split(pcm, AUDIO_FEATURE_DIM)
                energies.append(
                    [float(np.sqrt(np.mean(b * b))) if b.size else 0.0 for b in bands]
                )
                n_samples.append(pcm.size)
                durations.append(pcm.size / sr)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "energy": energies,
                    "n_samples": n_samples,
                    "duration_s": durations,
                }
            )

    return df.mapInPandas(kernel, out_schema)


def frame_sample(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    every_n: int = 10,
) -> DataFrame:
    """Sample every ``every_n``-th 'frame' from a video binary (stubbed as
    fixed-size byte windows until ffmpeg is available); emits one row per
    sampled frame — the 1-to-n mapInPandas shape video pipelines need."""
    out_schema = f"{id_col} bigint, frame_no int, frame binary"
    frame_bytes = 1024

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                content = content or b""
                n_frames = max(len(content) // frame_bytes, 1)
                for fno in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    frame_nos.append(fno)
                    frames.append(content[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_no": frame_nos, "frame": frames})

    return df.mapInPandas(kernel, out_schema)


def image_resize(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    out_h: int = 16,
    out_w: int = 16,
    decoder: str = "auto",
) -> DataFrame:
    """Decode + nearest-neighbor resize to ``out_h × out_w`` — the
    normalize-before-embedding step of an image training pipeline. The
    decode goes through :func:`_decode_image_stub` (real PIL when
    importable) with ``decoder="auto"``; pass ``decoder="byte-tile"`` to
    pin the deterministic :func:`_byte_tile` view regardless of codec
    availability — what the exact-checksum gate does, so its SQL oracle
    can never diverge on bytes that happen to be a decodable image
    (ASCII netpbm headers make that reachable from plain text). The
    resize itself is REAL integer-index numpy
    (``src = (dst * src_dim) // dst_dim`` per axis, the classic
    nearest-neighbor map), so only the codec is stubbed.

    Emits ``(id, src_h, src_w, out_h, out_w, checksum, resized)`` —
    ``resized`` is the row-major uint8 pixel buffer, ``checksum`` the exact
    integer sum of resized pixels (with the deterministic fake decode the
    whole pipeline is pure integer arithmetic on the input bytes, so the
    checksum has an exact SQL twin — the correctness gate for the
    plumbing).

    Arrow-batched ``mapInPandas``; size input partitions by payload bytes
    (:func:`with_byte_budget_partitions`), not row count.
    """
    out_schema = (
        f"{id_col} bigint, src_h int, src_w int, out_h int, out_w int, "
        "checksum bigint, resized binary"
    )

    if decoder not in ("auto", "byte-tile"):
        raise ValueError(f"decoder must be auto|byte-tile, got {decoder}")
    decode = _decode_image_stub if decoder == "auto" else _byte_tile

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shs, sws, csums, bufs = [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                px = decode(content)
                sh, sw = px.shape[0], px.shape[1]
                rows = (np.arange(out_h) * sh) // out_h
                cols = (np.arange(out_w) * sw) // out_w
                resized = px[np.ix_(rows, cols)].astype(np.int64)
                ids.append(doc_id)
                shs.append(sh)
                sws.append(sw)
                csums.append(int(resized.sum()))
                bufs.append(np.clip(resized, 0, 255).astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "src_h": shs,
                    "src_w": sws,
                    "out_h": [out_h] * len(ids),
                    "out_w": [out_w] * len(ids),
                    "checksum": csums,
                    "resized": bufs,
                }
            )

    return df.mapInPandas(kernel, out_schema)


def with_byte_budget_partitions(df: DataFrame, size_col_bytes: str, target_mb: int = 128) -> DataFrame:
    """Repartition a binary-asset table so each partition carries roughly
    ``target_mb`` of payload (sum of ``size_col_bytes``). Uses a running
    global estimate — cheap and good enough for task sizing."""
    total = df.agg(F.sum(size_col_bytes)).first()[0] or 0
    n = max(int(total / (target_mb * 1024 * 1024)) + 1, 1)
    return df.repartition(n)


def image_byte_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-oracle projection over the deterministic :func:`_byte_tile`
    view — ALWAYS the byte tile, never PIL, even when the codec is
    importable: the SQL oracle computes the byte arithmetic, and sharing
    the PIL-first decode would diverge on bytes that happen to be a
    decodable image (ASCII netpbm headers make that reachable from plain
    text). Reports integer column SUMS of the (side, side) tile instead
    of float32 column means — sum of ≤64 byte-valued pixels is an exact
    BIGINT on any engine, where mean = sum/side loses SQL exactness at
    the division. The float-array feature API (:func:`image_features`,
    PIL-first) is unchanged; this is the gate/audit projection. Emits
    ``s0..s{DIM-1}`` (column sums cyclically resized to
    ``IMAGE_FEATURE_DIM``) plus the tile width/height."""
    sum_cols = [f"s{k}" for k in range(IMAGE_FEATURE_DIM)]
    out_schema = (
        f"{id_col} bigint, "
        + ", ".join(f"{c} bigint" for c in sum_cols)
        + ", width int, height int"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                px = _byte_tile(content)  # NEVER PIL — see docstring
                # pixel values are whole numbers (uint8-derived), so the
                # int64 cast is lossless
                sums = np.resize(
                    px.astype(np.int64).sum(axis=0), IMAGE_FEATURE_DIM
                )
                rows.append(
                    (int(doc_id), *[int(x) for x in sums], int(px.shape[1]), int(px.shape[0]))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, *sum_cols, "width", "height"]
            )

    return df.mapInPandas(kernel, out_schema)
