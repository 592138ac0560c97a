"""Baseline JPEG codec (ops/jpeg.py): round-trip fidelity, subsampling,
restart markers, marker-level format conformance, and the explicit
NotImplementedError seams. No image library exists in the container, so the
encoder is the only source of test payloads — every decode property is
therefore checked against closed-form expectations (flat DC-only blocks,
PSNR bounds, geometry), not a reference decoder."""

from __future__ import annotations

import numpy as np
import pytest

from apollo_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse > 0 else float("inf")


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1), (xx + yy) * 255 // max(w + h - 2, 1)],
        axis=2,
    ).astype(np.uint8)


def test_roundtrip_psnr_by_quality_and_subsampling():
    img = _gradient(40, 56)
    # fidelity floors per (subsampling, quality) — comfortably below the
    # measured values (50/47/41 dB for 4:4:4) so codec regressions trip
    for sub, floors in (
        ("444", {95: 45, 85: 40, 50: 35}),
        ("422", {95: 38, 85: 36, 50: 33}),
        ("420", {95: 38, 85: 36, 50: 33}),
    ):
        for q, floor in floors.items():
            out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            assert out.shape == img.shape
            assert _psnr(img, out) > floor, (sub, q)
    # higher quality must not be (meaningfully) worse
    p95 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=95)))
    p30 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=30)))
    assert p95 > p30


def test_noise_roundtrip_q95():
    """Worst-case content (uniform noise) still reconstructs within the
    quantization error bound at q95 — this is the case that exposed the
    natural-vs-zigzag DQT ordering bug."""
    rng = np.random.default_rng(0)
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    gray = np.stack([g, g, g], axis=2)
    assert _psnr(gray, decode_jpeg(encode_jpeg(gray, quality=95))) > 38


def test_flat_block_is_exact():
    """A flat image is DC-only: quantize/dequantize of the DC coefficient
    reconstructs the exact level for any quality — bit-exact, not PSNR."""
    for level in (0, 37, 128, 255):
        flat = np.full((16, 24, 3), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90))
        assert int(np.abs(out.astype(int) - level).max()) <= 1, level


def test_odd_sizes_and_padding():
    rng = np.random.default_rng(1)
    for shape in ((1, 1), (7, 5), (17, 9), (8, 8), (9, 16)):
        im = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in ("444", "422", "420"):
            out = decode_jpeg(encode_jpeg(im, quality=90, subsample=sub))
            assert out.shape == im.shape, (shape, sub)


def test_restart_markers():
    img = _gradient(48, 48)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=2))
    # restart resets DC predictors but must not change the pixels
    assert np.array_equal(plain, rst)
    payload = encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in payload  # DRI segment
    assert b"\xff\xd0" in payload  # first RST marker


def test_decode_is_deterministic():
    img = _gradient(24, 40)
    p = encode_jpeg(img, quality=80, subsample="420")
    assert np.array_equal(decode_jpeg(p), decode_jpeg(p))


def test_format_conformance_markers():
    p = encode_jpeg(_gradient(16, 16), quality=85)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert p[2:4] == b"\xff\xe0" and p[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in p and b"\xff\xc4" in p and b"\xff\xdb" in p and b"\xff\xda" in p


def test_honest_seams_and_errors():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00garbage")
    # progressive SOF2 raises the documented seam
    p = bytearray(encode_jpeg(_gradient(16, 16)))
    i = p.index(b"\xff\xc0")
    p[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(p))
    # truncated entropy data
    full = encode_jpeg(_gradient(32, 32), quality=85)
    with pytest.raises(Exception):
        decode_jpeg(full[: len(full) // 2])
    with pytest.raises(NotImplementedError, match="subsample"):
        encode_jpeg(_gradient(8, 8), subsample="411")


def test_dispatch_through_decode_features():
    """multimodal.decode_features routes ffd8 payloads to the JPEG decoder
    and returns the standard block-mean feature vector."""
    from apollo_spark.ops.multimodal import decode_features, image_features

    img = _gradient(32, 32)
    payload = encode_jpeg(img, quality=95)
    feats = decode_features(payload, dim=16)
    direct = image_features(decode_jpeg(payload), 16, maxval=255)
    assert feats.shape == (16,)
    assert np.array_equal(feats, direct)
    # decoded pixels approximate the source, so features approximate too
    assert np.allclose(feats, image_features(img, 16, maxval=255), atol=0.02)
