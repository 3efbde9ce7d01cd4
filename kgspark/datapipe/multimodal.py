"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched `mapInPandas` stages.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind `KGSPARK_FAKE_DECODE`: a deterministic fake decoder
(seeded from the content hash) keeps every piece of Spark plumbing —
schema, batching, partition shape, UDF signatures — real and testable.
Set a real decoder by replacing `_decode_image_bytes` /
`_decode_audio_bytes`; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_DECODE = True  # no codec libs in this container

IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = "id long, width int, height int, mean_lum double, phash long"
AUDIO_FEATURES_SCHEMA = "id long, n_samples int, rms double, zero_crossings int"
FRAME_SAMPLE_SCHEMA = "id long, frame_idx int, frame png binary"


def _fake_pixels(content: bytes, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic fake decode: pixels seeded from the content digest."""
    seed = int.from_bytes(hashlib.blake2b(content, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _decode_image_bytes(content: bytes) -> np.ndarray:
    if FAKE_DECODE:
        return _fake_pixels(content)
    raise NotImplementedError("plug a real image codec here (PIL/cv2)")


def image_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Decode → (dims, mean luminance, 64-bit perceptual hash) via
    mapInPandas — Arrow batches of binary in, small typed rows out.
    Partition-parallel; binary column never hits the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                px = _decode_image_bytes(bytes(b))
                h, w = px.shape
                mean = float(px.mean())
                # aHash: 8x8 downsample (block mean) vs global mean → 64 bits
                blk = px[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
                bits = (blk > blk.mean()).flatten()
                phash = 0
                for bit in bits:
                    phash = (phash << 1) | int(bit)
                phash -= 1 << 64 if phash >= 1 << 63 else 0
                out.append((int(i), w, h, round(mean, 3), phash))
            yield pd.DataFrame(out, columns=["id", "width", "height", "mean_lum", "phash"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA)


def audio_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Fake-decode audio (int16 PCM from content hash) → rms / zero-crossings."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                if FAKE_DECODE:
                    seed = int.from_bytes(hashlib.blake2b(bytes(b), digest_size=8).digest(), "big")
                    samples = np.random.default_rng(seed).integers(
                        -(2 ** 15), 2 ** 15, size=1024, dtype=np.int32)
                else:
                    raise NotImplementedError("plug a real audio codec here")
                rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
                zc = int(((samples[:-1] * samples[1:]) < 0).sum())
                out.append((int(i), len(samples), round(rms, 3), zc))
            yield pd.DataFrame(out, columns=["id", "n_samples", "rms", "zero_crossings"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        fn, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, id_col: str, bin_col: str, every_n: int = 10,
                  max_frames: int = 3) -> DataFrame:
    """Frame-sampling plumbing: 1→N expansion inside mapInPandas (video
    bytes → sampled frame bytes). Fake decoder emits deterministic
    pseudo-frames; schema/batch shape match a real codec drop-in."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                for k in range(max_frames):
                    frame = hashlib.blake2b(
                        bytes(b) + (k * every_n).to_bytes(4, "big"), digest_size=32
                    ).digest()
                    out.append((int(i), k * every_n, frame))
            yield pd.DataFrame(out, columns=["id", "frame_idx", "frame"])

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        fn, schema="id long, frame_idx int, frame binary")


def attach_image_meta(df: DataFrame, bin_col: str) -> DataFrame:
    """Typed metadata column for an opaque binary payload (native exprs)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(bin_col)).alias("n_bytes"),
            F.xxhash64(F.col(bin_col)).alias("content_hash"),
            F.lit("image/unknown").alias("mime"),
        ),
    )
