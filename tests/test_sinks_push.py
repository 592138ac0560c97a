"""Push-transport sinks (SSE + WebSocket): the latency-path output row of
apollo's roadmap (/root/reference/ROADMAP.md:71), e2e against real sockets —
the WebSocket test client is the repo's own RFC 6455 client (ws_bridge),
so both sides of the frame grammar are exercised against each other."""

from __future__ import annotations

import json
import socket
import time

import pytest

from apollo_spark.sinks_push import (
    PushOverflowError,
    SseServer,
    TopicHub,
    WsPushServer,
    publish_dataframe,
    push_foreach_batch,
)


def _wait(pred, timeout=10.0, tick=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(tick)
    return False


def test_hub_fanout_topic_isolation_and_overflow_drop():
    hub = TopicHub()
    a1, a2, b = hub.subscribe("qa"), hub.subscribe("qa"), hub.subscribe("qb")
    assert hub.publish("qa", "x") == 2
    assert a1.q.get_nowait() == "x" and a2.q.get_nowait() == "x"
    assert b.q.empty()
    # overflow marks the slow subscriber dead, never blocks the publisher
    for i in range(2000):
        hub.publish("qb", str(i))
    assert b.dead
    assert hub.publish("qb", "after") == 0
    hub.unsubscribe(a1)
    assert hub.publish("qa", "y") == 1


def test_sse_endpoint_streams_batch_rows(spark):
    hub = TopicHub()
    srv = SseServer(hub)
    try:
        conn = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        conn.sendall(b"GET /orders_feed HTTP/1.1\r\nHost: x\r\nAccept: text/event-stream\r\n\r\n")
        assert _wait(lambda: hub.n_subscribers("orders_feed") == 1)
        df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
        assert publish_dataframe(hub, df, "orders_feed") == 3
        buf = b""
        conn.settimeout(30)
        # wait for 3 complete data events — heartbeat comments may interleave
        while buf.count(b"data: ") < 3 or not buf.endswith(b"\n\n"):
            buf += conn.recv(65536)
        head, _, body = buf.partition(b"\r\n\r\n")
        assert b"200 OK" in head and b"text/event-stream" in head
        events = [
            blk[len(b"data: ") :]
            for blk in body.split(b"\n\n")
            if blk.startswith(b"data: ")
        ]
        rows = sorted(json.loads(e)["id"] for e in events[:3])
        assert rows == [1, 2, 3]
        conn.close()
    finally:
        srv.close()


def test_ws_endpoint_handshake_and_frames(spark):
    from apollo_spark.sources.ws_bridge import WsConnection

    hub = TopicHub()
    srv = WsPushServer(hub)
    try:
        ws = WsConnection(f"ws://127.0.0.1:{srv.port}/alerts", timeout_s=10)
        assert _wait(lambda: hub.n_subscribers("alerts") == 1)
        df = spark.createDataFrame([(7, "high")], "id long, sev string")
        publish_dataframe(hub, df, "alerts")
        msg = json.loads(ws.recv_text())
        assert msg == {"id": 7, "sev": "high"}
        # a wide frame (>125 bytes -> 16-bit length header) round-trips too
        hub.publish("alerts", "x" * 4000)
        assert ws.recv_text() == "x" * 4000
        ws.close()
        assert _wait(lambda: hub.n_subscribers("alerts") == 0)
    finally:
        srv.close()


def test_streaming_foreach_batch_pushes_microbatches(spark, tmp_path):
    """Real Structured Streaming e2e: rate source -> foreachBatch push hook
    -> live WebSocket subscriber sees JSON rows within the latency budget."""
    from pyspark.sql import functions as F

    from apollo_spark.sources.ws_bridge import WsConnection

    hub = TopicHub()
    srv = WsPushServer(hub)
    q = None
    try:
        ws = WsConnection(f"ws://127.0.0.1:{srv.port}/ticks", timeout_s=15)
        assert _wait(lambda: hub.n_subscribers("ticks") == 1)
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "50")
            .load()
            .select(F.col("value").alias("tick"))
        )
        q = (
            stream.writeStream.foreachBatch(push_foreach_batch(hub, "ticks"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        got = []
        deadline = time.time() + 60
        while len(got) < 5 and time.time() < deadline:
            try:
                got.append(json.loads(ws.recv_text())["tick"])
            except Exception:
                time.sleep(0.2)
        assert len(got) >= 5, f"only received {got}"
        assert got == sorted(got)  # per-batch order preserved end-to-end
        ws.close()
    finally:
        if q is not None:
            q.stop()
        srv.close()


def test_sink_fanout_includes_push_hub(spark, tmp_path):
    """SinkConfig(push_hub=...) publishes alongside the file sinks in both
    the batch write() and the streaming foreach_batch() paths."""
    from apollo_spark.sinks import SinkConfig, SinkWriter

    hub = TopicHub()
    sub = hub.subscribe("q")
    writer = SinkWriter(SinkConfig(csv_dir=str(tmp_path / "csv"), push_hub=hub))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    writer.write(df, "q")
    assert json.loads(sub.q.get(timeout=5)) == {"id": 1, "v": "a"}
    writer.foreach_batch("q")(spark.createDataFrame([(2, "b")], "id long, v string"), 0)
    assert json.loads(sub.q.get(timeout=5)) == {"id": 2, "v": "b"}
    assert (tmp_path / "csv" / "q").exists()  # file sink still ran


def test_push_overflow_guard_names_bulk_sinks(spark):
    hub = TopicHub()
    df = spark.range(50).select("id")
    with pytest.raises(PushOverflowError, match="distributed sinks"):
        publish_dataframe(hub, df, "big", max_rows=10)
    hook = push_foreach_batch(hub, "big", max_rows_per_batch=10)
    with pytest.raises(PushOverflowError, match="latency path"):
        hook(df, 0)
