"""Pure stdlib/numpy GIF codec — closes the gif branch of the multimodal
dispatch seam (ops/multimodal.py::decode_features) without any image
library in the container.

Scope (what a web-scraped corpus actually contains):
* decode: GIF87a/GIF89a, global or local color table, interlaced or
  sequential, LZW with deferred width change and mid-stream clear codes,
  extension blocks skipped (a Graphic Control transparent index renders as
  its palette color — features, not compositing). First frame only: frame
  N of an animation is delta-composited against a canvas, which is player
  semantics, not feature extraction. Output (h, w, 3) uint8 RGB.
* encode: GIF89a, exact palette (<= 256 distinct colors, the synthetic
  fixture case; a real pipeline wires a median-cut quantizer at the
  NotImplementedError seam), optional interlace so the decoder's
  de-interlace path is round-trip covered.

Everything here is published-format knowledge (GIF89a specification,
CompuServe 1990); LZW's GIF variant has no "early change", widths bump
when the table reaches 2^size. North-star multimodal tier; no reference
analog (/root/reference is an EVM ETL tool).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODES = 4096  # 12-bit LZW ceiling fixed by the GIF spec

# interlace pass layout: (first row, stride) in spec order
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_size: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/EOI codes, width grows
    AFTER the table fills the current width (no early change), adds freeze
    at 4096 until the next CLEAR."""
    clear = 1 << min_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    size = min_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < size:
            if pos >= len(data):
                return bytes(out)  # tolerate a missing EOI (common in the wild)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        if code == clear:
            table = list(base)
            size = min_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODES:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < _MAX_CODES:
                table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << size) and size < 12:
            size += 1


def _lzw_encode(indices: bytes, min_size: int) -> bytes:
    """Inverse of _lzw_decode, kept in width-lockstep with it: the decoder
    bumps after its table reaches 2^size, so the encoder bumps once
    next_code EXCEEDS 2^size (the decoder learns each entry one code later).
    Emits CLEAR when the table fills, resetting both sides."""
    clear = 1 << min_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    size = min_size + 1
    emit(clear, size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], size)
        if next_code < _MAX_CODES:
            table[wk] = next_code
            next_code += 1
            if next_code > (1 << size) and size < 12:
                size += 1
        else:
            emit(clear, size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            size = min_size + 1
        w = bytes([k])
    if w:
        emit(table[w], size)
    emit(eoi, size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ decode


def _need(payload: bytes, pos: int, n: int, what: str) -> None:
    """Truncation guard: every read in the block walk goes through here so a
    cut-off payload surfaces as ValueError('truncated GIF ...'), matching the
    PPM/PNG codecs' error contract — never a raw IndexError/struct.error."""
    if pos + n > len(payload):
        raise ValueError(f"truncated GIF: need {n} byte(s) for {what} at {pos}")


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/GIF89a payload as (h, w, 3) uint8 RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    _need(payload, 6, 7, "logical screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        _need(payload, pos, 3 * n, "global color table")
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label byte then length-prefixed sub-blocks
            pos += 1
            _need(payload, pos, 1, "extension sub-block length")
            while payload[pos]:
                pos += 1 + payload[pos]
                _need(payload, pos, 1, "extension sub-block length")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        _need(payload, pos, 9, "image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            _need(payload, pos, 3 * n, "local color table")
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with neither global nor local color table")
        _need(payload, pos, 1, "LZW minimum code size")
        min_size = payload[pos]
        pos += 1
        chunks = []
        _need(payload, pos, 1, "image sub-block length")
        while payload[pos]:
            ln = payload[pos]
            _need(payload, pos + 1, ln, "image sub-block data")
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
            _need(payload, pos, 1, "image sub-block length")
        idx = np.frombuffer(_lzw_decode(b"".join(chunks), min_size), dtype=np.uint8)
        if idx.size < w * h:
            raise ValueError(f"GIF pixel data short: {idx.size} < {w * h}")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # de-interlace: rows arrive pass-major
            rows = np.empty(h, dtype=np.int64)
            r = 0
            for first, stride in _INTERLACE:
                n = len(range(first, h, stride))
                rows[first:h:stride] = np.arange(r, r + n)
                r += n
            idx = idx[rows]
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF index beyond color table")
        img = ct[idx]
        # frame smaller than the logical screen: paint onto a black canvas so
        # the output shape is the declared screen, like any real renderer
        if (left, top, w, h) != (0, 0, sw, sh):
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            canvas[top : top + h, left : left + w] = img
            return canvas
        return np.ascontiguousarray(img)
    raise ValueError("GIF payload contains no image block")


# ------------------------------------------------------------------ encode


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Exact-palette GIF89a encoder (tests and fixture synthesis; stdlib
    cannot write GIF). Palette = the image's distinct colors in first-seen
    raster order, so encode->decode is the identity on the pixels."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, first_pos, inv = np.unique(
        flat, axis=0, return_index=True, return_inverse=True
    )
    if len(colors) > 256:
        raise NotImplementedError(
            f"{len(colors)} distinct colors: wire a median-cut quantizer here "
            "(exact-palette encode covers <= 256)"
        )
    order = np.argsort(first_pos, kind="stable")
    palette = colors[order]
    remap = np.empty(len(colors), dtype=np.uint8)
    remap[order] = np.arange(len(colors), dtype=np.uint8)
    indices = remap[inv].astype(np.uint8)

    ct_bits = max(1, int(len(palette) - 1).bit_length())  # table size 2^ct_bits
    ct_n = 1 << ct_bits
    min_size = max(2, ct_bits)  # spec floor: LZW min code size >= 2

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 0x07), 0, 0)
    out += palette.tobytes() + b"\x00\x00\x00" * (ct_n - len(palette))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    pix = indices.reshape(h, w)
    if interlace:
        pix = np.concatenate([pix[first::stride] for first, stride in _INTERLACE])
    out.append(min_size)
    data = _lzw_encode(pix.tobytes(), min_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
