"""Freeze the bridge JSONL record as the Kafka message contract
(VERDICT r2 item 8): the bytes BridgeWriter lands in files must be the
bytes a Kafka producer would publish, and the Kafka wire adapter must
reconstruct the exact raw-log frame the file stream produces."""

from __future__ import annotations

import json

import pytest

SAMPLE_ETH_LOGS = [
    {
        "blockNumber": "0x12d687",
        "blockHash": "0x" + "ab" * 32,
        "transactionHash": "0x" + "cd" * 32,
        "transactionIndex": "0x3",
        "logIndex": "0x1a",
        "address": "0xDAC17F958D2ee523a2206206994597C13D831ec7",
        "topics": ["0x" + "11" * 32, "0x" + "22" * 32],
        "data": "0x00000000000000000000000000000000000000000000000000000000000003e8",
    },
    {
        "blockNumber": "0x12d688",
        "blockHash": "0x" + "ef" * 32,
        "transactionHash": "0x" + "01" * 32,
        "transactionIndex": None,
        "logIndex": "0x0",
        "address": "0xa0b86991c6218b36c1d19d4a2e9eb0ce3606eb48",
        "topics": [],
        "data": "0x",
    },
]


def _rows():
    from apollo_spark.sources.ws_bridge import _log_to_row

    return [_log_to_row("ethereum", lg) for lg in SAMPLE_ETH_LOGS]


def test_kafka_value_is_bridge_jsonl_line(tmp_path):
    """Contract freeze: record_value == the exact line BridgeWriter writes."""
    from apollo_spark.sources.kafka_bridge import record_value
    from apollo_spark.sources.ws_bridge import BridgeWriter

    rows = _rows()
    w = BridgeWriter(tmp_path, rotate_rows=10_000, rotate_s=10_000)
    for r in rows:
        w.add(r)
    w.flush()
    files = sorted(tmp_path.glob("*.jsonl"))
    assert len(files) == 1
    lines = files[0].read_text().strip().split("\n")
    assert [ln.encode() for ln in lines] == [record_value(r) for r in rows]
    # and every line round-trips through json with the frozen field set
    for ln in lines:
        assert set(json.loads(ln)) == {
            "chain", "block_number", "block_hash", "tx_hash",
            "tx_index", "log_index", "address", "topics", "data_hex",
        }


def test_kafka_key_is_dedup_identity():
    from apollo_spark.sources.kafka_bridge import record_key, topic_for

    rows = _rows()
    keys = [record_key(r) for r in rows]
    assert keys[0] == f"{rows[0]['block_hash']}:{rows[0]['tx_hash']}:26".encode()
    assert len(set(keys)) == len(keys)
    assert topic_for("ethereum") == "apollo.logs.ethereum"


def test_kafka_adapter_matches_file_stream(spark, tmp_path):
    """Round-trip: the same records through (a) BridgeWriter files +
    raw_log_stream and (b) a Kafka-wire-shaped frame + kafka_log_stream must
    produce identical raw-log rows."""
    from apollo_spark.sources.kafka_bridge import (
        KAFKA_WIRE_SCHEMA,
        kafka_log_stream,
        record_key,
        record_value,
        topic_for,
    )
    from apollo_spark.sources.streaming import raw_log_stream
    from apollo_spark.sources.ws_bridge import BridgeWriter

    rows = _rows()

    bridge_dir = tmp_path / "bridge"
    w = BridgeWriter(bridge_dir, rotate_rows=10_000, rotate_s=10_000)
    for r in rows:
        w.add(r)
    w.flush()
    q = (
        raw_log_stream(spark, str(bridge_dir))
        .writeStream.format("memory")
        .queryName("kafka_contract_files")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)  # False = timeout -> partial data
    finally:
        q.stop()
    from_files = spark.sql("SELECT * FROM kafka_contract_files").toPandas()

    import datetime

    wire = spark.createDataFrame(
        [
            (
                record_key(r),
                record_value(r),
                topic_for(r["chain"]),
                0,
                i,
                datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
                0,
            )
            for i, r in enumerate(rows)
        ],
        KAFKA_WIRE_SCHEMA,
    )
    from_kafka = kafka_log_stream(wire).toPandas()

    assert sorted(from_files.columns) == sorted(from_kafka.columns)
    key = ["block_hash", "tx_hash", "log_index"]
    a = from_files.sort_values(key).reset_index(drop=True)[sorted(from_files.columns)]
    b = from_kafka.sort_values(key).reset_index(drop=True)[sorted(from_kafka.columns)]
    for c in a.columns:
        av, bv = list(a[c]), list(b[c])
        if c == "topics":
            av, bv = [list(x) for x in av], [list(x) for x in bv]
        elif c == "data":
            av, bv = [bytes(x) if x is not None else None for x in av], [
                bytes(x) if x is not None else None for x in bv
            ]
        assert av == bv, c


def test_kafka_adapter_drops_poison_messages(spark):
    """A malformed value must become zero rows, not a stream-killing error."""
    import datetime

    from apollo_spark.sources.kafka_bridge import KAFKA_WIRE_SCHEMA, kafka_log_stream

    ts = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    wire = spark.createDataFrame(
        [(b"k", b"{not json", "apollo.logs.ethereum", 0, 0, ts, 0),
         (b"k2", b'{"chain":"ethereum"}', "apollo.logs.ethereum", 0, 1, ts, 0)],
        KAFKA_WIRE_SCHEMA,
    )
    assert kafka_log_stream(wire).count() == 0


def test_kafka_adapter_streaming_end_to_end(spark, tmp_path):
    """kafka_log_stream over a real readStream (Kafka-wire-shaped parquet
    files standing in for the broker): the adapter output must flow through
    a streaming sink with the same rows as the batch path."""
    import datetime

    from apollo_spark.sources.kafka_bridge import (
        KAFKA_WIRE_SCHEMA,
        kafka_log_stream,
        record_key,
        record_value,
        topic_for,
    )

    rows = _rows()
    ts = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    wire = spark.createDataFrame(
        [(record_key(r), record_value(r), topic_for(r["chain"]), 0, i, ts, 0)
         for i, r in enumerate(rows)],
        KAFKA_WIRE_SCHEMA,
    )
    src = tmp_path / "wire"
    wire.write.parquet(str(src))
    stream = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(str(src))
    assert stream.isStreaming
    q = (
        kafka_log_stream(stream)
        .writeStream.format("memory")
        .queryName("kafka_stream_e2e")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.sql("SELECT block_hash, tx_hash, log_index FROM kafka_stream_e2e").collect()
    assert {(r.block_hash, r.tx_hash, r.log_index) for r in got} == {
        (r["block_hash"], r["tx_hash"], r["log_index"]) for r in rows
    }
