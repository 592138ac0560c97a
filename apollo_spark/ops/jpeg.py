"""Pure numpy/stdlib baseline JPEG codec — closes the jpeg branch of the
multimodal dispatch seam (ops/multimodal.py::decode_features) without any
image library in the container.

Scope (the cases a data pipeline actually meets in a web-scraped corpus):
* decode: baseline sequential DCT (SOF0; SOF1 extended-sequential decodes
  identically), 8-bit samples, Huffman entropy coding, grayscale or YCbCr,
  any integer sampling factors (4:4:4, 4:2:0, 4:2:2, 4:4:0 ...), restart
  markers (DRI/RSTn), multi-segment DQT/DHT. Output (h, w, 3) uint8 RGB.
* encode: baseline, quality-scaled Annex-K quantization tables, standard
  Annex-K Huffman tables, 4:4:4 / 4:2:2 / 4:2:0, optional restart interval —
  exists so tests and fixtures can synthesize real compressed payloads
  in-container (stdlib cannot write JPEG).
* explicit NotImplementedError seams: progressive (SOF2), arithmetic
  coding (SOF9+), 12-bit precision, hierarchical — wire PIL/libjpeg there.

Everything here is published-format knowledge (ITU-T T.81 / JFIF); the DCT
uses an orthonormal float64 matrix product, deterministic on one platform.
North-star multimodal tier; no reference analog (/root/reference is an EVM
ETL tool).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 example quantization tables (row-major 8x8)
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: forward F = A @ x @ A.T, inverse A.T @ F @ A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.sqrt((1 if _k == 0 else 2) / 8.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16.0
        )


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex-K tables (public recipe)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUM, QT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------- huffman


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for bit-serial decoding."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing. Stops at any
    real marker (left for the caller to interpret — RSTn or EOI/next)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker inside entropy data
                    raise _MarkerInData(nxt)
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0


class _MarkerInData(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(r: _BitReader, dc_tab, ac_tab, pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block of zigzag-order coefficients + updated DC predictor."""
    zz = np.zeros(64, dtype=np.int64)
    s = _read_symbol(r, dc_tab)
    diff = _extend(r.receive(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _read_symbol(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    return zz, pred


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


# ---------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        length = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables: wire libjpeg here")
                qt[tq] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext-sequential
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG: wire libjpeg here")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2): wire libjpeg here")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (lossless/arithmetic/hierarchical): wire libjpeg here"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0x0F})
            return _decode_scan(
                payload, pos + length, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += length
    raise ValueError("JPEG contained no scan (SOS)")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.uint8)
        for c in scan
    }
    preds = {c["id"]: 0 for c in scan}
    r = _BitReader(data, pos)
    mcu_count = 0
    expected_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align()
                if r.pos + 1 >= len(r.data) or r.data[r.pos] != 0xFF:
                    raise ValueError("expected RST marker, found entropy data")
                m = r.data[r.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, found 0xFF{m:02x}")
                if m - 0xD0 != expected_rst:
                    raise ValueError("JPEG restart marker out of sequence")
                r.pos += 2
                expected_rst = (expected_rst + 1) % 8
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            zz, preds[c["id"]] = _decode_block(
                                r, huff_dc[c["td"]], huff_ac[c["ta"]], preds[c["id"]]
                            )
                        except _MarkerInData as e:
                            raise ValueError(
                                f"unexpected marker 0xFF{e.marker:02x} inside JPEG scan"
                            ) from None
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (zz * q).astype(np.float64)
                        pix = _A.T @ block.reshape(8, 8) @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                            np.round(pix), 0, 255
                        ).astype(np.uint8)
            mcu_count += 1
    # upsample each component to full resolution and crop
    full = []
    for c in scan:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = full[0]
        return np.stack([g, g, g], axis=2)
    y, cb, cr = (x.astype(np.float64) for x in full[:3])
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r_, g_, b_], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(wtr, zz, pred, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc_codes[s]
    wtr.write(code, length)
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wtr.write(code, length)
    return int(zz[0])


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (H//8, W//8, 64) quantized zigzag coefficients."""
    hh, ww = plane.shape
    out = np.zeros((hh // 8, ww // 8, 64), dtype=np.int64)
    qm = q.reshape(8, 8).astype(np.float64)
    for by in range(hh // 8):
        for bx in range(ww // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            f = _A @ blk @ _A.T
            qz = np.round(f / qm).astype(np.int64).reshape(64)
            out[by, bx] = qz[ZIGZAG]  # natural order -> zigzag order
    return out


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF JPEG bytes. ``subsample`` is
    '444', '422' or '420'; ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 image, got {img.shape}")
    if subsample not in ("444", "422", "420"):
        raise NotImplementedError(f"subsample {subsample!r} (444/422/420 in-tree)")
    h, w = img.shape[:2]
    qlum, qchrom = _quality_tables(quality)
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0
    if subsample == "420":
        hs = vs = 2
        yp = _pad_edge(y, 16)
        cbp = _pad_edge(cb, 16).reshape(-1, 2, yp.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = _pad_edge(cr, 16).reshape(-1, 2, yp.shape[1] // 2, 2).mean(axis=(1, 3))
    elif subsample == "422":  # horizontal-only chroma halving (h=2, v=1)
        hs, vs = 2, 1
        yp = np.pad(y, ((0, (-h) % 8), (0, (-w) % 16)), mode="edge")
        cbp = np.pad(cb, ((0, (-h) % 8), (0, (-w) % 16)), mode="edge")
        crp = np.pad(cr, ((0, (-h) % 8), (0, (-w) % 16)), mode="edge")
        cbp = cbp.reshape(cbp.shape[0], -1, 2).mean(axis=2)
        crp = crp.reshape(crp.shape[0], -1, 2).mean(axis=2)
    else:
        hs = vs = 1
        yp, cbp, crp = _pad_edge(y, 8), _pad_edge(cb, 8), _pad_edge(cr, 8)
    cy = _fdct_quant(yp, qlum)
    ccb = _fdct_quant(cbp, qchrom)
    ccr = _fdct_quant(crp, qchrom)

    dc_l, ac_l = _build_codes(*DC_LUM), _build_codes(*AC_LUM)
    dc_c, ac_c = _build_codes(*DC_CHROM), _build_codes(*AC_CHROM)
    wtr = _BitWriter()
    mcux, mcuy = cbp.shape[1] // 8, cbp.shape[0] // 8
    preds = [0, 0, 0]
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    preds[0] = _encode_block(
                        wtr, cy[my * vs + by, mx * hs + bx], preds[0], dc_l, ac_l
                    )
            preds[1] = _encode_block(wtr, ccb[my, mx], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(wtr, ccr[my, mx], preds[2], dc_c, ac_c)
            mcu_count += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dht(tc: int, th: int, table) -> bytes:
        bits, vals = table
        return bytes([(tc << 4) | th] + bits + vals)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT stores the table in ZIGZAG order (T.81 B.2.4.1) — the decoder's
    # dequant multiplies zigzag coefficients element-wise against it
    out += seg(0xDB, bytes([0]) + bytes(qlum[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qchrom[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += seg(0xC0, sof)
    out += seg(0xC4, dht(0, 0, DC_LUM))
    out += seg(0xC4, dht(1, 0, AC_LUM))
    out += seg(0xC4, dht(0, 1, DC_CHROM))
    out += seg(0xC4, dht(1, 1, AC_CHROM))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
