"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract for image/audio/video at 100 TB (north-star mandate):
media travels as a ``binary`` column plus a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so each task streams record batches without materializing the
partition. The actual codec calls are STUBBED here (no image/audio libraries
in this container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic fake
(seeded by content hash) produces stable feature vectors — the Spark plumbing
(schemas, batch iteration, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
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


def extract_features(
    df: DataFrame,
    dim: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """media rows -> (media_id, feature array<float>). Real decoder goes where
    the NotImplementedError is; the mapInPandas shape is production-real."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires an image/audio library; wire it here"
                )
            feats = [
                _fake_features(bytes(p) if p is not None else b"", dim).tolist() for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "features": feats})

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
