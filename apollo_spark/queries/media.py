"""Multimodal tier: image feature extraction (PPM/PNG/GIF/JPEG codecs), aHash near-dup.

Mechanically split from the single-file registry (round 8); content unchanged.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import carry_caches, scoped_persist
from apollo_spark.ops.dedup import exact_dedup, minhash_lsh_pairs
from apollo_spark.ops.relational import asof_join
from apollo_spark.ops.similarity import cosine
from apollo_spark.ops.text import STOPWORDS, fingerprint, language_id, quality_score, token_count
from apollo_spark.queries._shared import _t


def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end on driver data: documents' text bytes
    as opaque binary payloads -> Arrow-batched mapInPandas feature extraction
    (deterministic fake encoder; real codec slots into the same stage).
    Hash-seeded gaussians aren't SQL-expressible -> rows-only check."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")
    )
    feats = extract_features(d, dim=16)
    return feats.select(
        "media_id",
        F.round(F.aggregate(F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v), 4).alias(
            "feat_sq_norm"
        ),
        F.size("features").alias("dim"),
    ).orderBy("media_id")


def media_real_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-gated end-to-end: a 4x4 P6 PPM is synthesized
    JVM-side per document (md5-derived raster bytes), decoded by the in-tree
    pure-numpy PPM codec inside Arrow-batched mapInPandas, reduced to the
    16-dim block-mean feature, and the float32 feature math is mirrored
    bit-for-bit in DuckDB (hex-pair bytes + CAST AS FLOAT truncation). This is
    the multimodal tier with no fake anywhere in the path."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    payload = F.concat(F.encode(F.lit("P6\n4 4\n255\n"), "utf-8"), F.unhex(hx))
    media = d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    feats = extract_features(media, dim=16, fake=False)
    sq = F.aggregate(
        F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v
    )
    return feats.select("media_id", F.round(sq, 6).alias("feat_sq_norm")).orderBy("media_id")


def _media_real_oracle() -> str:
    """Mirror of media_real_image_features: pixel p's gray block-mean is
    ((b(3p)+b(3p+1)+b(3p+2))/3)/255 truncated to float32; squares sum in the
    same left-assoc order as the Spark-side sequential fold."""
    terms = []
    for p in range(16):
        bs = [f"CAST('0x' || substr(hx, {2 * k + 1}, 2) AS INT)" for k in range(3 * p, 3 * p + 3)]
        gray = f"(({' + '.join(bs)}) / 3.0) / 255.0"
        terms.append(f"CAST(CAST({gray} AS FLOAT) AS DOUBLE)")
    acc = "0.0"
    for t in terms:
        acc = f"({acc} + __T__)".replace("__T__", f"{t} * {t}")
    return f"""
WITH h AS (
  SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id AS media_id, ROUND({acc}, 6) AS feat_sq_norm
FROM h ORDER BY media_id
"""


ORACLE_MEDIA_REAL = _media_real_oracle()


def media_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, oracle-gated end-to-end: the same md5-derived 4x4
    raster as media_real_image_features is ENCODED to an 8-bit truecolor PNG
    inside an Arrow-batched pandas stage (zlib deflate; scanline filters
    Sub/Up/Average/Paeth so every unfilter branch is in the gated path),
    then decoded by the pure-stdlib in-tree PNG codec
    (ops.multimodal.decode_png: chunk walk + CRC verify + inflate +
    per-scanline reconstruction) via the normal decode_features dispatch.
    Encode→decode is the identity on the raster, so the DuckDB oracle is the
    same bit-for-bit float32 feature mirror as the PPM query — any codec bug
    breaks the hash."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    raster = d.select(F.col("doc_id").alias("media_id"), F.unhex(hx).alias("raw"))

    def _encode(batches):
        import numpy as np
        import pandas as pd

        from apollo_spark.ops.multimodal import encode_png

        for pdf in batches:
            payloads = [
                encode_png(
                    np.frombuffer(raw, dtype=np.uint8).reshape(4, 4, 3),
                    filters=[1, 2, 3, 4],
                )
                for raw in pdf["raw"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    media = raster.mapInPandas(_encode, "media_id long, payload binary")
    feats = extract_features(media, dim=16, fake=False)
    sq = F.aggregate(
        F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v
    )
    return feats.select("media_id", F.round(sq, 6).alias("feat_sq_norm")).orderBy("media_id")


def media_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, oracle-gated end-to-end: the same md5-derived 4x4
    raster as media_real_image_features is ENCODED to an exact-palette
    GIF89a inside an Arrow-batched pandas stage (interlaced for odd doc_ids
    so both row orders are in the gated path), then decoded by the
    pure-stdlib in-tree GIF codec (ops.gif.decode_gif: block walk + LZW
    with deferred width change + de-interlace) via the normal
    decode_features dispatch. Encode->decode is the identity on the raster
    (<= 16 colors always fit the exact palette), so the DuckDB oracle is
    the same bit-for-bit float32 feature mirror as the PPM/PNG queries —
    any codec bug breaks the hash."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    raster = d.select(F.col("doc_id").alias("media_id"), F.unhex(hx).alias("raw"))

    def _encode(batches):
        import numpy as np
        import pandas as pd

        from apollo_spark.ops.gif import encode_gif

        for pdf in batches:
            payloads = [
                encode_gif(
                    np.frombuffer(raw, dtype=np.uint8).reshape(4, 4, 3),
                    interlace=bool(mid % 2),
                )
                for mid, raw in zip(pdf["media_id"], pdf["raw"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    media = raster.mapInPandas(_encode, "media_id long, payload binary")
    feats = extract_features(media, dim=16, fake=False)
    sq = F.aggregate(
        F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v
    )
    return feats.select("media_id", F.round(sq, 6).alias("feat_sq_norm")).orderBy("media_id")


def image_ahash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup, end-to-end REAL and oracle-gated: 4x4 P6
    PPMs synthesized JVM-side per document -> in-tree pure-numpy PPM decode
    (ops.multimodal.image_luma, integer R+G+B luma — no float32 to
    reconcile) -> 16-bit average-hash in codegen'd SQL expressions
    (ahash64: bit p = n*luma_p > sum, integer cross-multiplication) ->
    LOSSLESS banded hamming join (ahash_pairs: pigeonhole over
    max_hamming+1 bit-bands, per-band equi-join — the image analog of
    MinHash-LSH banding, no crossJoin). The oracle replays decode, hash,
    and pairing byte-for-byte from the same md5-derived raster."""
    from apollo_spark.ops.multimodal import ahash64, ahash_pairs, image_luma

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    payload = F.concat(F.encode(F.lit("P6\n4 4\n255\n"), "utf-8"), F.unhex(hx))
    media = d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    pairs = ahash_pairs(ahash64(image_luma(media)), max_hamming=2, bits=16)
    return pairs.orderBy("id_a", "id_b")


def _ahash_oracle() -> str:
    """Mirror of image_ahash_near_dups: per-pixel luma from the hex raster,
    integer-threshold aHash, exact popcount pairing (the Spark side's
    banding is lossless, so the plain self-join here yields the same set)."""
    lus = []
    for p in range(16):
        bs = [f"CAST('0x' || substr(hx, {2 * k + 1}, 2) AS INT)" for k in range(3 * p, 3 * p + 3)]
        lus.append(f"({' + '.join(bs)})")
    total = " + ".join(lus)
    bits = [f"CASE WHEN 16 * {lus[p]} > total THEN {1 << p} ELSE 0 END" for p in range(16)]
    return f"""
WITH hx0 AS (
  SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
  FROM documents WHERE text IS NOT NULL
),
t AS (SELECT doc_id, hx, {total} AS total FROM hx0),
ah AS (SELECT doc_id, CAST({" + ".join(bits)} AS BIGINT) AS ahash FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM ah a JOIN ah b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
ORDER BY id_a, id_b
"""


ORACLE_AHASH_PAIRS = _ahash_oracle()


