"""Regression guard for the round-2 breaker: the driver regenerated
events.parquet with ts as parquet timestamp[us] (Spark TIMESTAMP_NTZ) while
the suite assumed INT64 nanos. normalize_ts_nanos must accept every encoding
the driver has shipped and produce identical epoch-nanos longs."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from apollo_spark.queries import _events, normalize_ts_nanos

ROWS = [
    (1, 101, 1706400000_000000, "click"),  # 2024-01-28 00:00:00 UTC in micros
    (2, 101, 1706400123_456789, "purchase"),
    (3, 202, 1706403600_999999, "click"),
]


def _micros_df(spark, ts_type: str):
    df = spark.createDataFrame(
        [(e, u, m, t) for e, u, m, t in ROWS], "event_id long, user_id long, us long, event_type string"
    )
    if ts_type == "timestamp_ntz":
        # build NTZ without a tz-dependent cast (TIMESTAMP->NTZ reads session tz)
        ts = F.expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')")
    else:
        ts = F.timestamp_micros(F.col("us"))
    return df.select("event_id", "user_id", ts.alias("ts"), "event_type")


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_normalize_timestamp_types(spark, ts_type):
    out = normalize_ts_nanos(_micros_df(spark, ts_type))
    assert dict(out.select("event_id", "ts").collect()) == {e: m * 1000 for e, u, m, _ in ROWS}
    assert out.schema["ts"].dataType.simpleString() == "bigint"


def test_normalize_long_nanos_passthrough(spark):
    df = spark.createDataFrame(
        [(e, m * 1000) for e, _, m, _ in ROWS], "event_id long, ts long"
    )
    out = normalize_ts_nanos(df)
    assert dict(out.select("event_id", "ts").collect()) == {e: m * 1000 for e, _, m, _ in ROWS}


def test_normalize_ntz_is_timezone_independent(spark):
    """The NTZ branch must not read spark.sql.session.timeZone: DuckDB's
    epoch_ns() on a naive timestamp ignores zones and so must we."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = normalize_ts_nanos(_micros_df(spark, "timestamp_ntz"))
        assert dict(out.select("event_id", "ts").collect()) == {e: m * 1000 for e, u, m, _ in ROWS}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_normalize_rejects_strings(spark):
    df = spark.createDataFrame([(1, "2024-01-28")], "event_id long, ts string")
    with pytest.raises(TypeError):
        normalize_ts_nanos(df)


def test_events_reads_driver_parquet_as_nanos(spark, sf_dir):
    """Whatever encoding the driver's current testdata uses, _events must
    yield BIGINT epoch-nanos within a sane range (2020..2040)."""
    e = _events(spark, sf_dir)
    assert e.schema["ts"].dataType.simpleString() == "bigint"
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    sec_2020 = int(datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
    sec_2040 = int(datetime.datetime(2040, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
    assert sec_2020 * 10**9 < lo <= hi < sec_2040 * 10**9
