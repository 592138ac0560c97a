"""Headline query suite over the driver's testdata tables.

Every entry here has BOTH a Spark implementation (`QUERIES[name]`, callable
(spark, sf_dir) -> DataFrame) and, where SQL can express the op, a DuckDB
oracle (`ORACLES[name]`) — the per-round correctness gate runs them
side-by-side and hash-compares values (BASELINE.md t2).

Hash-stability policy (floats are hashed bit-for-bit after rounding):
* sums/avgs go through DECIMAL(38,6) so addition is exact and
  order-independent, then cast to double — identical in both engines;
* per-row doubles are rounded to a fixed number of decimals in BOTH
  implementations;
* every output column is explicitly aliased identically on both sides;
* orderings that feed LIMIT/top-k carry a full deterministic tie-break.
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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_ts_nanos(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to epoch-nanosecond BIGINT no matter how
    the parquet writer encoded it (the driver has shipped both):

    * ``timestamp[us]`` read as TIMESTAMP_NTZ — measured against an NTZ epoch
      literal via ``timestampdiff``, so the result is independent of
      ``spark.sql.session.timeZone`` and matches DuckDB ``epoch_ns()`` on the
      same naive values bit-for-bit;
    * TIMESTAMP (tz-adjusted) — ``unix_micros`` (already tz-independent);
    * BIGINT — parquet TIMESTAMP(NANOS) read under
      ``spark.sql.legacy.parquet.nanosAsLong``; already epoch nanos.

    Downstream arithmetic stays integer (``div``): a double round-trip would
    lose precision above 2^53 ns.
    """
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df
    if isinstance(t, TimestampNTZType):
        micros = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    elif isinstance(t, TimestampType):
        micros = F.unix_micros(F.col(col))
    else:
        raise TypeError(f"events.{col}: expected timestamp or long, got {t}")
    return df.withColumn(col, micros * F.lit(1000))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with ``ts`` normalized to epoch-nanos BIGINT (see
    normalize_ts_nanos). The legacy conf is set defensively so a
    TIMESTAMP(NANOS)-annotated file reads as long instead of erroring; it is
    a no-op for the current timestamp[us] encoding. Session tz is pinned UTC
    so tz-sensitive formatting (date_trunc/date_format) matches the DuckDB
    oracle's naive-timestamp semantics even when the driver built the session
    without our factory."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_ts_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _ts_seconds() -> F.Column:
    return F.expr("ts div 1000000000")


def _ts_micros() -> F.Column:
    return F.expr("ts div 1000")


def dsum(col) -> F.Column:
    """Order-independent exact sum: decimal(38,6) accumulate, double out."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def davg(col, cnt) -> F.Column:
    return dsum(col) / cnt


