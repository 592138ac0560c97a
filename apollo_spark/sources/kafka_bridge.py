"""Kafka message contract for the realtime log bridge (S3/S4 production path).

The JSONL record the WS bridge writes (ws_bridge._log_to_row serialized as
compact JSON) IS the Kafka message contract — the same bytes a production
bridge publishes to a broker instead of (or in addition to) rotating files:

* **topic**: one per chain — ``apollo.logs.<chain>``;
* **key** (binary, utf-8): ``"<block_hash>:<tx_hash>:<log_index>"`` — the
  event identity ``dedup_event_stream`` keys on, so a re-emitted log after a
  reconnect/reorg lands on the same partition and per-key ordering holds;
* **value** (binary, utf-8): the compact-JSON record with exactly the
  RAW_LOG_STREAM_SCHEMA fields (chain, block_number, block_hash, tx_hash,
  tx_index, log_index, address, topics, data_hex).

No Kafka client ships in this container, so the adapter below takes ANY
DataFrame bearing Kafka's wire schema — precisely what
``spark.readStream.format("kafka")`` yields (key/value binary, topic,
partition, offset, timestamp) — and produces the same raw-log frame
``raw_log_stream`` builds from bridge files. Swapping files for a broker is
a one-line source change; the decode/transform/save tail is untouched.

Reference: apollo's one-websocket-per-query fanout
(/root/reference/chainservice/events.go:221-320); this contract is the
horizontally-scalable replacement.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apollo_spark.sources.streaming import RAW_LOG_STREAM_SCHEMA

# what spark.readStream.format("kafka") yields — the adapter's input contract
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def topic_for(chain: str) -> str:
    return f"apollo.logs.{chain}"


def record_key(row: dict) -> bytes:
    """Partitioning key = event identity (the dedup key of
    dedup_event_stream): stable across reconnect re-deliveries."""
    return f"{row['block_hash']}:{row['tx_hash']}:{row['log_index']}".encode()


def record_value(row: dict) -> bytes:
    """Message payload: byte-identical to one line of the bridge's JSONL
    (BridgeWriter serializes with the same compact separators)."""
    return json.dumps(row, separators=(",", ":")).encode()


def kafka_log_stream(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire frame -> raw logs frame, same shape as raw_log_stream.

    Works on both a streaming frame (``readStream.format("kafka")``) and a
    batch frame (``read.format("kafka")`` backfills) — ``from_json`` and the
    hex decode are engine-agnostic. Malformed values produce all-null
    records; drop them (a poison message must not kill the stream) keyed on
    the non-null fields the bridge always sets.
    """
    parsed = kafka_df.select(
        F.from_json(F.col("value").cast("string"), RAW_LOG_STREAM_SCHEMA).alias("r")
    ).select("r.*")
    return (
        parsed.filter(F.col("tx_hash").isNotNull() & F.col("block_hash").isNotNull())
        .withColumn("data", F.unhex(F.regexp_replace(F.col("data_hex"), "^0x", "")))
        .drop("data_hex")
    )
