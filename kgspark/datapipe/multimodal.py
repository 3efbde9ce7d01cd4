"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched `mapInPandas` stages.

Decode support is format-sniffed from magic bytes:
- REAL decoders (no external codec libs needed): WAV (stdlib ``wave``),
  PPM/PGM P6/P5 and uncompressed 24-bit BMP (pure numpy) — these run
  end-to-end on real bytes in tests.
- Codec formats (JPEG/PNG/MP3/...) have no decoder in this container
  (no PIL/cv2/ffmpeg): with ``FAKE_DECODE`` a deterministic fake
  (seeded from the content hash) keeps the Spark plumbing testable;
  without it they raise ``NotImplementedError`` at the documented plug
  point (`_decode_image_bytes` / `_decode_audio_bytes`).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_DECODE = True  # applies ONLY to codec formats (JPEG/MP3/...)

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


def _decode_pnm_bytes(content: bytes) -> np.ndarray:
    """P5 (binary PGM, grayscale) / P6 (binary PPM, RGB) → uint8
    grayscale 2-D array. Pure numpy; maxval ≤ 255 only."""
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2  # past magic
    magic = content[:2]
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(content[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    if magic == b"P5":
        px = np.frombuffer(content, dtype=np.uint8, count=w * h, offset=i)
        return px.reshape(h, w).copy()
    rgb = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    rgb = rgb.reshape(h, w, 3).astype(np.uint32)
    # ITU-R 601 integer luma
    return ((rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114)
            // 1000).astype(np.uint8)


def _decode_bmp_bytes(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP → uint8 grayscale 2-D
    array. Rows are 4-byte padded, stored bottom-up (positive height)."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(content, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3).astype(np.uint32)
    if bottom_up:
        bgr = bgr[::-1]
    return ((bgr[..., 2] * 299 + bgr[..., 1] * 587 + bgr[..., 0] * 114)
            // 1000).astype(np.uint8)


def _decode_image_bytes(content: bytes) -> np.ndarray:
    """Format-sniffing image decode → uint8 grayscale 2-D array.
    PPM/PGM/BMP decode for real; codec formats (JPEG/PNG/...) hit the
    plug point below — replace with PIL/cv2 on a real cluster."""
    if content[:2] in (b"P5", b"P6"):
        return _decode_pnm_bytes(content)
    if content[:2] == b"BM":
        return _decode_bmp_bytes(content)
    if FAKE_DECODE:
        return _fake_pixels(content)
    raise NotImplementedError("plug a real image codec here (PIL/cv2)")


def _decode_audio_bytes(content: bytes) -> np.ndarray:
    """Format-sniffing audio decode → int32 mono sample array. WAV
    decodes for real via stdlib ``wave``; compressed formats (MP3/...)
    hit the plug point — replace with ffmpeg/librosa on a real cluster."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        with wave.open(io.BytesIO(content)) as wv:
            n, sw, ch = wv.getnframes(), wv.getsampwidth(), wv.getnchannels()
            raw = wv.readframes(n)
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[sw]
        samples = np.frombuffer(raw, dtype=dtype).astype(np.int32)
        if sw == 1:  # 8-bit WAV is unsigned, centre it
            samples -= 128
        if ch > 1:  # downmix to mono
            samples = samples.reshape(-1, ch).mean(axis=1).astype(np.int32)
        return samples
    if FAKE_DECODE:
        seed = int.from_bytes(
            hashlib.blake2b(content, digest_size=8).digest(), "big")
        return np.random.default_rng(seed).integers(
            -(2 ** 15), 2 ** 15, size=1024, dtype=np.int32)
    raise NotImplementedError("plug a real audio codec here (ffmpeg/librosa)")


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
    """Decode audio (WAV for real; see _decode_audio_bytes) →
    rms / zero-crossings via mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                samples = _decode_audio_bytes(bytes(b))
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


# ---------------------------------------------------------------- encoders
# Deterministic encoders for the real-decode formats — used by tests and
# synthetic data generation (write real bytes, decode them back through
# the mapInPandas path).

def encode_wav(samples: np.ndarray, framerate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(framerate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def encode_ppm(gray: np.ndarray) -> bytes:
    """uint8 grayscale 2-D array → binary PGM (P5) bytes."""
    h, w = gray.shape
    return b"P5\n%d %d\n255\n" % (w, h) + gray.astype(np.uint8).tobytes()


def encode_ppm_rgb(rgb: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB array → binary PPM (P6) bytes."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def encode_bmp(gray: np.ndarray) -> bytes:
    """uint8 grayscale 2-D array → uncompressed 24-bit BMP bytes
    (bottom-up, 4-byte-padded rows — the layout _decode_bmp_bytes reads)."""
    h, w = gray.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.repeat(gray[:, :, None], 3, axis=2)  # B=G=R=gray
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows[::-1].tobytes()  # bottom-up
    data_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", data_off + len(pixel_data), 0, 0, data_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pixel_data), 2835, 2835, 0, 0))
    return header + pixel_data


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
