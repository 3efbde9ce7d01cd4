"""Baseline JPEG codec tests (kgspark/datapipe/jpegcodec.py).

Same strategy as the PNG/GIF tests: (a) a hand-built known-answer
byte vector fully independent of the encoder, so a symmetric
encode/decode bug cannot hide; (b) encode->decode round trips across
the feature matrix (gray / 4:4:4 / 4:2:0, odd dims, restart markers,
extreme-contrast AC clamp); (c) the real bytes flowing through the
Spark `image_features` mapInPandas path.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kgspark.datapipe.jpegcodec import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    fdct2,
    idct2,
)


def test_idct_inverts_fdct():
    rng = np.random.default_rng(7)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(idct2(fdct2(b)), b, atol=1e-10)
    # constant block concentrates in DC only
    f = fdct2(np.full((8, 8), 50.0))
    assert abs(f[0, 0] - 400.0) < 1e-9
    assert np.abs(f).sum() - abs(f[0, 0]) < 1e-9


def test_zigzag_canonical_prefix():
    # T.81 Figure 5's first two diagonals, hand-checked
    assert list(ZIGZAG[:16]) == [0, 1, 8, 16, 9, 2, 3, 10,
                                 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload


def test_jpeg_known_answer_vector():
    """Hand-assembled single-block grayscale JPEG: quant table all 1s,
    flat canonical Huffman tables (12 DC syms @ len 4, 162 AC syms @
    len 8), one 8x8 block of constant 100.

    Entropy bits, derived by hand from T.81's canonical code rule:
    DC category 8 -> code 8 -> '1000'; diff -224 -> 31 -> '00011111';
    EOB (AC index 0) -> '00000000'; pad '1111' => bytes 81 F0 0F.
    (DC = (100-128)*8 = -224 with an all-ones quant table.)
    """
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_bits = [0] * 16
    ac_bits[7] = 162
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    raw = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
        + _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x81, 0xF0, 0x0F])
        + b"\xff\xd9"
    )
    out = decode_jpeg(raw)
    assert out.shape == (8, 8)
    assert np.all(out == 100)


def _pattern(h: int, w: int) -> np.ndarray:
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return ((x * 3 + y * 5) % 256).astype(np.uint8)


def test_jpeg_roundtrip_gray():
    img = _pattern(48, 64)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    # all-ones quant table: only DCT float rounding remains
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2
    lossy = decode_jpeg(encode_jpeg(img, quality=80))
    assert int(np.abs(lossy.astype(int) - img.astype(int)).mean()) <= 12


def test_jpeg_roundtrip_odd_dimensions():
    img = _pattern(29, 33)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (29, 33)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_color_444_and_420_luma():
    g = _pattern(40, 56)
    rgb = np.stack([g, g[::-1], g // 2], axis=-1).astype(np.uint8)
    luma = np.clip(np.round(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                            + 0.114 * rgb[..., 2]), 0, 255).astype(int)
    d444 = decode_jpeg(encode_jpeg(rgb, quality=100, subsampling="444"))
    d420 = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="420"))
    assert d444.shape == d420.shape == (40, 56)
    assert int(np.abs(d444.astype(int) - luma).max()) <= 2
    # 4:2:0 only degrades chroma; returned luma stays near-exact
    assert int(np.abs(d420.astype(int) - luma).max()) <= 6


def test_jpeg_restart_markers_equal_plain():
    img = _pattern(32, 80)  # 40 MCUs -> a dozen restarts at Ri=3
    plain = decode_jpeg(encode_jpeg(img, quality=100))
    rst = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=3))
    assert np.array_equal(plain, rst)


def test_jpeg_ac_clamp_extreme_contrast():
    chk = (np.indices((16, 16)).sum(0) % 2 * 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(chk, quality=100))
    assert np.array_equal(out, chk)


def test_jpeg_rejects_lossless_and_arithmetic():
    raw = bytearray(encode_jpeg(_pattern(16, 16)))
    i = raw.index(b"\xff\xc0")
    for sof in (0xC3, 0xC9, 0xCA):  # lossless / arith-seq / arith-prog
        raw[i + 1] = sof
        with pytest.raises(ValueError, match="not"):
            decode_jpeg(bytes(raw))


@pytest.mark.parametrize("shape,quality,sub", [
    ((48, 64), 100, "gray"),      # multi-MCU grayscale
    ((29, 33), 90, "gray"),       # odd dims (right/bottom partial MCUs)
    ((40, 56), 95, "444"),        # color, no subsampling
    ((40, 56), 85, "420"),        # color, 2x2 chroma MCG geometry
])
def test_jpeg_progressive_equals_baseline(shape, quality, sub):
    """Progressive re-encode carries exactly the baseline file's
    quantized coefficients, so decode(progressive) must equal
    decode(baseline) bit-for-bit — any error in ANY of the six scan
    kinds (DC first/refine, AC first/refine per band) breaks this."""
    g = _pattern(*shape)
    img = g if sub == "gray" else np.stack(
        [g, g[::-1], g // 2], axis=-1).astype(np.uint8)
    s = "444" if sub == "gray" else sub
    base = encode_jpeg(img, quality=quality, subsampling=s)
    prog = encode_jpeg_progressive(img, quality=quality, subsampling=s)
    assert b"\xff\xc2" in prog          # really SOF2 ...
    assert prog.count(b"\xff\xda") >= 6  # ... with a multi-scan script
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_jpeg_progressive_simple_script():
    """Spectral-selection-only script (no successive approximation) —
    the decoder must handle Al=0 first scans with no refinement passes,
    a shape minimal real-world progressive encoders emit."""
    g = _pattern(40, 56)
    rgb = np.stack([g, g[::-1], g // 2], axis=-1).astype(np.uint8)
    for img, sub in ((g, "444"), (rgb, "420")):
        base = encode_jpeg(img, quality=90, subsampling=sub)
        prog = encode_jpeg_progressive(img, quality=90, subsampling=sub,
                                       script="simple")
        assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))
    with pytest.raises(ValueError, match="scan script"):
        encode_jpeg_progressive(g, script="bogus")


def test_jpeg_progressive_restart_markers():
    """DRI/RSTn inside progressive scans: predictors, EOB runs and the
    bit reader must all resync at every interval, in every scan kind
    (DC first/refine, AC first/refine). Both scripts, gray + 4:2:0."""
    g = _pattern(48, 64)
    rgb = np.stack([g, g[::-1], g // 2], axis=-1).astype(np.uint8)
    for img, sub in ((g, "444"), (rgb, "420")):
        base = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        for script in ("standard", "simple"):
            prog = encode_jpeg_progressive(
                img, quality=90, subsampling=sub, script=script,
                restart_interval=3)
            assert prog.count(b"\xff\xdd") == 1  # DRI present
            assert np.array_equal(decode_jpeg(prog), base)


def test_jpeg_progressive_eobrun_spans_blocks():
    """A mostly-flat image maximizes cross-block EOB runs (the G.1.2.2
    EOBn path with r > 0) plus buffered correction bits in refinement."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[5, 7] = 250  # one busy block among 63 empty ones
    prog = encode_jpeg_progressive(img, quality=80)
    base = encode_jpeg(img, quality=80)
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_jpeg_truncated_scan_raises():
    raw = encode_jpeg(_pattern(32, 32), quality=100)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(raw[: len(raw) - 40])


def test_jpeg_through_spark_image_features(spark):
    from kgspark.datapipe.multimodal import image_features

    imgs = [_pattern(24, 24), _pattern(16, 40),
            np.stack([_pattern(24, 32)] * 3, axis=-1).astype(np.uint8),
            _pattern(32, 24)]
    quality = [100, 90, 95, 90]
    sub = ["444", "444", "420", "444"]
    enc = [encode_jpeg, encode_jpeg, encode_jpeg, encode_jpeg_progressive]
    rows = [(i, bytearray(e(im, quality=q, subsampling=s)))
            for i, (im, q, s, e) in enumerate(zip(imgs, quality, sub, enc))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in
           image_features(df, "id", "payload").collect()}
    assert len(out) == 4
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        gray = im if im.ndim == 2 else np.clip(np.round(
            0.299 * im[..., 0] + 0.587 * im[..., 1]
            + 0.114 * im[..., 2]), 0, 255)
        assert abs(out[i]["mean_lum"] - float(gray.mean())) < 3.0
