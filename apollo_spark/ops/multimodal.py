"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract for image/audio/video at 100 TB (north-star mandate):
media travels as a ``binary`` column plus a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so each task streams record batches without materializing the
partition.

Codec tiers:
* REAL, in-tree (pure numpy/stdlib, no external libs): PPM images
  (``decode_ppm``/``encode_ppm``, P6 binary + P3 ascii) and PCM WAV audio
  (``decode_wav`` via stdlib ``wave``). ``extract_features(..., fake=False)``
  dispatches on payload magic bytes and runs these end-to-end.
* STUBBED (container has no codec libraries): mp3/mp4 raise
  NotImplementedError with the dispatch point marked — a real deployment
  swaps ffmpeg in at that exact seam. PNG (stdlib zlib + unfilter, this
  module) and baseline JPEG (ops/jpeg.py, pure numpy Huffman+DCT) are
  REAL in-tree decoders.
* FAKE (``fake=True``): deterministic content-hash-seeded vectors for
  plumbing tests that only care about schemas/batching, not pixels.
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: content-hash-seeded
    gaussian vector. Stable across runs/machines."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


# ---------------------------------------------------------------- real codecs


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a PPM image (P6 binary or P3 ascii, maxval <= 65535) to an
    (h, w, 3) uint8/uint16 array. Pure numpy — no image library needed."""
    return _parse_ppm(payload)[0]


def _parse_ppm(payload: bytes) -> tuple[np.ndarray, int]:
    """decode_ppm plus the header maxval — normalization must use the
    DECLARED maxval, not the storage dtype (a 10-bit image lands in uint16
    but its white point is 1023, not 65535)."""
    tokens: list[bytes] = []
    pos = 0
    # header = 4 whitespace-separated tokens (magic, w, h, maxval) with
    # '#'-to-EOL comments allowed anywhere between them
    while len(tokens) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic == b"P6":
        pos += 1  # exactly one whitespace byte separates header from raster
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        raster = np.frombuffer(payload, dtype=dtype, count=w * h * 3, offset=pos)
        out_dtype = np.uint16 if maxval > 255 else np.uint8
        return raster.reshape(h, w, 3).astype(out_dtype), maxval
    if magic == b"P3":
        vals = np.array(payload[pos:].split(), dtype=np.uint32)[: w * h * 3]
        return vals.reshape(h, w, 3).astype(np.uint16 if maxval > 255 else np.uint8), maxval
    raise NotImplementedError(f"unsupported image magic {magic!r} (PPM P3/P6 only in-container)")


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> binary P6 PPM bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + per-scanline unfilter) to an
    (h, w, 3) uint8 array — no PIL in the container, and the format is
    simple enough that ~100 lines cover the cases a data pipeline meets:
    8-bit depth, color types 0 (gray) / 2 (RGB) / 3 (palette) / 4
    (gray+alpha) / 6 (RGBA), non-interlaced, CRC-verified. 16-bit and Adam7
    stay NotImplementedError seams (wire PIL for those).

    Alpha is dropped (not composited): features/dedup want the raw color
    planes. North-star multimodal tier; no reference analog
    (/root/reference is an EVM ETL tool)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = int.from_bytes(payload[pos : pos + 4], "big"),
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + length : pos + 12 + length], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG: wire PIL here")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth}: wire PIL here (8 only in-container)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        out[y] = _png_unfilter(ft, line, prev, channels)
        prev = out[y]
    px = out.reshape(h, w, channels)
    if color == 2:
        return px.copy()
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[px[:, :, 0]]
    if color == 4:  # gray+alpha: drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA: drop alpha


def _png_unfilter(ft: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """One scanline of PNG filter reconstruction (spec 9.2): None/Sub/Up/
    Average/Paeth. Sub/Average/Paeth recur on the previous pixel, so those
    run a per-pixel loop over int arithmetic; Up is vectorized."""
    x = line.astype(np.int32)
    p = prev.astype(np.int32)
    if ft == 0:
        return line.copy()
    if ft == 2:  # Up
        return ((x + p) & 0xFF).astype(np.uint8)
    r = np.zeros(len(x), dtype=np.int32)
    for i in range(len(x)):
        a = r[i - bpp] if i >= bpp else 0  # left
        b = p[i]  # up
        if ft == 1:  # Sub
            r[i] = (x[i] + a) & 0xFF
        elif ft == 3:  # Average
            r[i] = (x[i] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            c = p[i - bpp] if i >= bpp else 0  # up-left
            q = a + b - c
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            r[i] = (x[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return r.astype(np.uint8)


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """(h, w, 3) uint8 -> 8-bit truecolor PNG. ``filters`` picks the filter
    type per scanline (default all 0) — used by tests and the hash-gated
    media query to exercise every unfilter branch on a round-trip."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    filters = filters or [0] * h
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    raster = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        enc = np.zeros(len(line), dtype=np.int32)
        for i in range(len(line)):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raster += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raster)))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes -> (mono float32 samples in [-1, 1], sample_rate).
    stdlib ``wave`` handles the RIFF container; 8/16/32-bit PCM supported."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n_ch, width, rate = f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono float samples in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def image_features(img: np.ndarray, dim: int, maxval: int | None = None) -> np.ndarray:
    """Grayscale block-mean thumbnail feature (a dim-length vector): the
    classic pHash-style descriptor, resize-by-block-average so any input
    size maps to the same feature length without an image library.
    Pass the format's declared ``maxval`` (white point) when known — a
    10-bit image stores in uint16 but its white point is 1023; dtype is
    only the fallback inference — so every bit depth of one scene maps to
    the same [0,1] features."""
    side = max(int(np.sqrt(dim)), 1)
    if maxval is None:
        maxval = 65535 if np.asarray(img).dtype == np.uint16 else 255
    maxval = float(maxval)
    gray = np.asarray(img, dtype=np.float64).mean(axis=2)
    blocks = [np.array_split(row_blk, side, axis=1) for row_blk in np.array_split(gray, side, axis=0)]
    thumb = np.array([[b.mean() if b.size else 0.0 for b in row] for row in blocks])
    feat = np.zeros(dim, dtype=np.float32)
    feat[: side * side] = (thumb / maxval).ravel().astype(np.float32)
    return feat


def audio_features(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Log-magnitude spectrum binned to ``dim`` bands (0..rate/2) — a
    deterministic numpy-only spectral fingerprint."""
    if len(samples) == 0:
        return np.zeros(dim, dtype=np.float32)
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    bands = np.array([b.mean() if b.size else 0.0 for b in np.array_split(mag, dim)])
    return np.log1p(bands).astype(np.float32)


def decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Magic-byte dispatch to the in-tree codecs; the NotImplementedError
    branch is the seam where PIL/ffmpeg plug in on a real cluster."""
    if payload[:2] in (b"P6", b"P3"):
        img, maxval = _parse_ppm(payload)
        return image_features(img, dim, maxval=maxval)
    if payload[:8] == _PNG_SIG:
        return image_features(decode_png(payload), dim, maxval=255)
    if payload[:4] == b"RIFF":
        return audio_features(*decode_wav(payload), dim)
    if payload[:2] == b"\xff\xd8":
        from apollo_spark.ops.jpeg import decode_jpeg

        return image_features(decode_jpeg(payload), dim, maxval=255)
    if payload[:4] == b"GIF8":
        from apollo_spark.ops.gif import decode_gif

        return image_features(decode_gif(payload), dim, maxval=255)
    if payload[:4] == _PNG_SIG[:4]:
        # looks like PNG but the full 8-byte signature is wrong — corrupt
        # transfer (e.g. CRLF mangling, which the signature exists to catch),
        # not a missing codec
        raise ValueError(f"corrupt PNG signature {payload[:8]!r}")
    raise NotImplementedError(
        f"no in-container codec for payload magic {payload[:8]!r}; "
        "wire ffmpeg here for mp3/mp4 (PPM/PNG/baseline-JPEG/WAV/GIF are in-tree)"
    )


def extract_features(
    df: DataFrame,
    dim: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
    on_error: str = "skip",
) -> DataFrame:
    """media rows -> (media_id, feature array<float>).

    ``on_error='skip'`` (default) drops rows whose payload fails to decode
    (null, truncated, unsupported format) — one poison blob must never kill
    a 100 TB extract, the same malformed-row posture as the ABI log decoder
    and the Kafka adapter. ``on_error='raise'`` propagates the first decode
    error for debugging."""
    if on_error not in ("skip", "raise"):
        raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                # id conversion stays inside the guard: a NULL id arrives as
                # NaN (nullable long -> float64) and int(NaN) throwing outside
                # the try would be exactly the poison-kills-job failure this
                # parameter exists to prevent
                try:
                    mid_i = int(mid)
                    payload = bytes(p) if p is not None else b""
                    f = _fake_features(payload, dim) if fake else decode_features(payload, dim)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                ids.append(mid_i)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index mapping — pure numpy
    indexing, deterministic, no interpolation kernel to reconcile across
    libraries."""
    if img.ndim != 3 or img.shape[0] == 0 or img.shape[1] == 0:
        raise ValueError(f"expected HxWxC image, got shape {img.shape}")
    ys = (np.arange(height) * img.shape[0]) // height
    xs = (np.arange(width) * img.shape[1]) // width
    return img[ys][:, xs]


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "skip",
) -> DataFrame:
    """image rows -> (media_id, payload) with each PPM payload resized to
    ``height x width`` (nearest neighbor) and re-encoded as P6 PPM — the
    standard normalize-resolution stage before feature extraction, real
    codec in and out (no fake path needed). Arrow-batched ``mapInPandas``;
    undecodable payloads follow the extract_features poison posture
    (``on_error='skip'`` drops the row, 'raise' propagates)."""
    if on_error not in ("skip", "raise"):
        raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField(payload_col, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    mid_i = int(mid)
                    img = decode_ppm(bytes(p) if p is not None else b"")
                    out = encode_ppm(resize_nearest(img, height, width))
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                ids.append(mid_i)
                payloads.append(out)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    payload_col: pd.Series(payloads, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx, ts_ms,
    frame binary). Stub decoder; real frame extraction plugs into the loop."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # keyed by id_col, not a literal, so output columns always match
            # out_schema for any caller-supplied id column name
            rows = {id_col: [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, payload, meta in zip(pdf[id_col], pdf["payload"], pdf["meta"]):
                if not fake:
                    raise NotImplementedError("real video decode requires a codec library")
                duration = int(meta["duration_ms"] or 0) if meta is not None else 0
                payload = bytes(payload) if payload is not None else b""
                for i, ts in enumerate(range(0, duration, every_ms)):
                    rows[id_col].append(int(mid))
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(hashlib.md5(payload + ts.to_bytes(8, "big")).digest())
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").select(id_col, "payload", "meta").mapInPandas(run, schema=out_schema)


def real_media_table(spark, n: int = 16, seed: int = 42) -> DataFrame:
    """Media fixture with REAL decodable payloads: gradient P6 PPM images and
    sine-wave 16-bit PCM WAV clips (both synthesized in numpy, both round-trip
    through the in-tree codecs)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 24 + (i % 3) * 8, 16 + (i % 5) * 4
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 255 // max(w - 1, 1)), (yy * 255 // max(h - 1, 1)), np.full((h, w), i * 7 % 256)],
                axis=2,
            ).astype(np.uint8)
            rows.append(
                (i, "image", bytearray(encode_ppm(img)),
                 {"mime": "image/x-portable-pixmap", "width": w, "height": h, "duration_ms": None})
            )
        else:
            rate, dur_ms = 8000, 250
            freq = 200.0 + 120.0 * i + float(rng.integers(0, 40))
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            rows.append(
                (i, "audio", bytearray(encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)),
                 {"mime": "audio/wav", "width": None, "height": None, "duration_ms": dur_ms})
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def fake_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture rows for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "duration_ms": 5000 if kind != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_luma(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "skip",
) -> DataFrame:
    """media rows -> ``(media_id, luma array<int>)``: per-pixel channel-sum
    integers (R+G+B, 0..3*maxval) from the REAL in-tree PPM decode.

    Integer output is the point: perceptual hashing downstream (aHash bit =
    ``n*luma_p > sum(luma)``) stays in exact integer arithmetic, so the hash
    — and every pair it implies — is engine-portable bit-for-bit with no
    float32 reconciliation. Same Arrow-batched mapInPandas shape and
    poison-row posture as extract_features."""
    if on_error not in ("skip", "raise"):
        raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("luma", T.ArrayType(T.IntegerType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lumas = [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    mid_i = int(mid)
                    img, _ = _parse_ppm(bytes(p) if p is not None else b"")
                    lu = np.asarray(img, dtype=np.int64).sum(axis=2).ravel()
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                ids.append(mid_i)
                lumas.append([int(v) for v in lu])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "luma": pd.Series(lumas, dtype="object")}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def ahash64(luma_df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Average-hash per image: bit p set iff ``n * luma_p > sum(luma)``
    (integer cross-multiplication — no division, no floats, ties -> 0).
    Returns ``(media_id, ahash bigint, n_px int)``. Pure codegen'd SQL
    expressions over the luma array — no Python in this stage."""
    return luma_df.select(
        F.col(id_col),
        F.expr(
            "aggregate(zip_with(luma, sequence(0, size(luma) - 1),"
            " (v, i) -> IF(size(luma) * v > aggregate(luma, 0, (a, x) -> a + x),"
            " shiftleft(cast(1 as bigint), cast(i as int)), cast(0 as bigint))),"
            " cast(0 as bigint), (a, x) -> a + x)"
        ).alias("ahash"),
        F.size("luma").alias("n_px"),
    )


def ahash_pairs(
    hashes: DataFrame, max_hamming: int = 2, bits: int = 16, id_col: str = "media_id"
) -> DataFrame:
    """All image pairs with hamming(aHash) <= ``max_hamming`` — LOSSLESSLY,
    without the O(N^2) self-join: split the hash into ``max_hamming + 1``
    bit-bands; by pigeonhole any pair within distance d agrees exactly on at
    least one band, so a per-band equi-join on the band value generates a
    candidate superset, then the exact popcount filter keeps true pairs.

    100 TB shape: the only shuffles are the band equi-joins, keyed on
    (band_id, band_value) — candidate fan-out is sum over bands of
    C(bucket_size, 2), the same banded discipline as MinHash-LSH. No
    crossJoin anywhere."""
    nb = max_hamming + 1
    cuts = [round(i * bits / nb) for i in range(nb + 1)]  # band p covers bits [cuts[p], cuts[p+1])
    bands = []
    for p in range(nb):
        lo, width = cuts[p], cuts[p + 1] - cuts[p]
        bands.append(
            hashes.select(
                F.col(id_col),
                F.col("ahash"),
                F.lit(p).alias("band_id"),
                F.expr(f"(ahash >> {lo}) & {(1 << width) - 1}").alias("band_val"),
            )
        )
    allb = bands[0]
    for b in bands[1:]:
        allb = allb.unionByName(b)
    left = allb.select(
        F.col("band_id"), F.col("band_val"), F.col(id_col).alias("id_a"), F.col("ahash").alias("ha")
    )
    right = allb.select(
        F.col("band_id"), F.col("band_val"), F.col(id_col).alias("id_b"), F.col("ahash").alias("hb")
    )
    cand = (
        left.join(right, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", F.expr("cast(bit_count(ha ^ hb) as int)").alias("hamming")
    ).filter(F.col("hamming") <= F.lit(max_hamming))
