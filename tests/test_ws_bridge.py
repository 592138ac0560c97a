"""WS bridge daemon tests against a stdlib fake websocket node: RFC6455
handshake/frames, subscription flow, atomic rotation, reconnect, and
end-to-end composition bridge -> readStream -> decode -> dedup."""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading
import time
from pathlib import Path

import pytest

from apollo_spark.abi import Abi, abi_encode

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class FakeWsNode:
    """Accepts websocket upgrades and plays an eth_subscribe log feed.
    ``script`` is a list of sessions; each session is a list of log dicts to
    push before closing the connection (simulating a drop). A ping frame is
    injected mid-stream to exercise pong handling."""

    def __init__(self, script: list[list[dict]]):
        self.script = script
        self.sessions = 0
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.srv.settimeout(30)
        self.port = self.srv.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while self.sessions < len(self.script):
            try:
                conn, _ = self.srv.accept()
            except (OSError, TimeoutError):
                return
            logs = self.script[self.sessions]
            self.sessions += 1
            try:
                self._handle(conn, logs)
            finally:
                conn.close()

    def _handle(self, conn, logs):
        conn.settimeout(10)
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(65536)
        key = ""
        for line in req.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        accept = base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
                f"Connection: Upgrade\r\nSec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )
        self._recv_frame(conn)  # the eth_subscribe request (masked)
        self._send_text(conn, json.dumps({"jsonrpc": "2.0", "id": 1, "result": "0xsub1"}))
        for i, lg in enumerate(logs):
            if i == 1:
                conn.sendall(struct.pack("!BB", 0x89, 4) + b"ping")  # ping mid-stream
            self._send_text(
                conn,
                json.dumps(
                    {
                        "jsonrpc": "2.0",
                        "method": "eth_subscription",
                        "params": {"subscription": "0xsub1", "result": lg},
                    }
                ),
            )
        time.sleep(0.5)  # let the client drain before the drop

    @staticmethod
    def _send_text(conn, text: str):
        data = text.encode()
        n = len(data)
        if n < 126:
            conn.sendall(struct.pack("!BB", 0x81, n) + data)
        else:
            conn.sendall(struct.pack("!BBH", 0x81, 126, n) + data)

    @staticmethod
    def _recv_frame(conn):
        head = b""
        while len(head) < 2:
            head += conn.recv(2 - len(head))
        n = head[1] & 0x7F
        need = (2 if n == 126 else 8 if n == 127 else 0) + (4 if head[1] & 0x80 else 0) + n
        got = b""
        while len(got) < need:
            got += conn.recv(need - len(got))

    def close(self):
        self.srv.close()


def _fake_log(block: int, log_index: int = 0, address: str = "0x" + "AB" * 20, topics=None, data="0x00"):
    return {
        "blockNumber": hex(block),
        "blockHash": "0x" + f"{block:064x}",
        "transactionHash": "0x" + f"{block * 10 + log_index:064x}",
        "transactionIndex": "0x1",
        "logIndex": hex(log_index),
        "address": address,
        "topics": topics or ["0x" + "11" * 32],
        "data": data,
    }


def _run_bridge_until(node, bridge_dir, n_rows, chain="ethereum", timeout=20, **kw):
    from apollo_spark.sources.ws_bridge import run_bridge

    stop = threading.Event()
    t = threading.Thread(
        target=run_bridge,
        args=(f"ws://127.0.0.1:{node.port}", bridge_dir, chain),
        kwargs=dict(stop=stop, rotate_rows=4, rotate_s=0.3, backoff_s=0.1, **kw),
        daemon=True,
    )
    t.start()
    deadline = time.time() + timeout
    while time.time() < deadline:
        rows = _read_rows(bridge_dir)
        if len(rows) >= n_rows:
            break
        time.sleep(0.2)
    stop.set()
    t.join(timeout=10)
    return _read_rows(bridge_dir)


def _read_rows(bridge_dir):
    rows = []
    for f in sorted(Path(bridge_dir).glob("*.jsonl")):
        rows += [json.loads(line) for line in f.read_text().splitlines() if line]
    return rows


def test_bridge_lands_raw_log_stream_rows(tmp_path):
    node = FakeWsNode([[_fake_log(100 + i, i % 3) for i in range(10)]])
    rows = _run_bridge_until(node, tmp_path / "bridge", 10)
    node.close()
    assert len(rows) == 10
    r = rows[0]
    # exact RAW_LOG_STREAM_SCHEMA shape (streaming.py:38-50)
    assert set(r) == {
        "chain", "block_number", "block_hash", "tx_hash", "tx_index",
        "log_index", "address", "topics", "data_hex",
    }
    assert r["chain"] == "ethereum" and r["block_number"] == 100
    assert r["address"] == "0x" + "ab" * 20  # lowercased
    assert isinstance(r["topics"], list) and r["data_hex"].startswith("0x")
    # no partial/tmp files left visible
    assert not list((tmp_path / "bridge").glob(".*tmp"))


def test_bridge_reconnects_after_drop(tmp_path):
    """Connection drop mid-feed: the daemon redials, resubscribes, and the
    post-reconnect logs land too (events.go:257-262 semantics)."""
    node = FakeWsNode(
        [
            [_fake_log(b) for b in range(200, 205)],  # session 1, then drop
            [_fake_log(b) for b in range(205, 212)],  # session 2 after redial
        ]
    )
    rows = _run_bridge_until(node, tmp_path / "bridge", 12)
    node.close()
    assert node.sessions == 2
    assert sorted(r["block_number"] for r in rows) == list(range(200, 212))


def test_bridge_gives_up_after_max_reconnects(tmp_path):
    from apollo_spark.sources.ws_bridge import WsError, run_bridge

    # nothing is listening on this port
    with pytest.raises((OSError, WsError)):
        run_bridge(
            "ws://127.0.0.1:9",
            tmp_path / "bridge",
            "ethereum",
            backoff_s=0.01,
            max_reconnects=2,
        )


def test_bridge_to_stream_end_to_end(spark, tmp_path):
    """Full realtime path: WS node -> bridge daemon -> readStream ->
    ABI decode -> watermarked dedup -> memory sink. The reconnect replays
    block 305's log; dedup must deliver it exactly once."""
    unipair = Abi.from_file("/root/reference/test/unipair.abi.json")
    ev = unipair.events["Swap"]
    pair = "0x905dfcd5649217c42684f23958568e533c711aa3"

    def swap_log(block, log_index):
        return _fake_log(
            block,
            log_index,
            address=pair,
            topics=[ev.topic0, "0x" + "11" * 32, "0x" + "22" * 32],
            data="0x" + abi_encode(["uint256"] * 4, [block, 0, block * 2, 0]).hex(),
        )

    node = FakeWsNode(
        [
            [swap_log(b, 0) for b in range(300, 306)],
            [swap_log(305, 0)] + [swap_log(b, 0) for b in range(306, 310)],  # 305 replayed
        ]
    )
    bridge = tmp_path / "bridge"
    rows = _run_bridge_until(node, bridge, 11, chain="arbitrum")
    node.close()
    assert len(rows) == 11  # 10 unique + 1 replay on the wire

    from apollo_spark.sources.streaming import dedup_event_stream, event_stream

    stream = event_stream(spark, str(bridge), ev, chain="arbitrum", address=pair)
    deduped = dedup_event_stream(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("ws_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT block_number, amount0In FROM ws_rt").collect()
    assert sorted(r.block_number for r in out) == list(range(300, 310))  # replay deduped
    assert {int(r.amount0In) for r in out} == set(range(300, 310))


def test_ws_frame_survives_timeout_mid_frame(tmp_path):
    """A recv timeout mid-frame must not desync the stream: the buffered
    partial frame resumes on the next call and the message arrives whole."""
    import struct as _struct

    from apollo_spark.sources.ws_bridge import WsConnection

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    msg = json.dumps({"k": "v" * 200})  # long enough for a 126-length frame

    def serve():
        conn, _ = srv.accept()
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(65536)
        key = [l.split(b":", 1)[1].strip().decode() for l in req.split(b"\r\n") if l.lower().startswith(b"sec-websocket-key")][0]
        accept = base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()
        conn.sendall((
            "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode())
        data = msg.encode()
        frame = _struct.pack("!BBH", 0x81, 126, len(data)) + data
        # trickle: header+3 bytes, pause past the client timeout, then the rest
        conn.sendall(frame[:7])
        time.sleep(0.8)
        conn.sendall(frame[7:])
        time.sleep(0.5)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    ws = WsConnection(f"ws://127.0.0.1:{port}")
    ws.sock.settimeout(0.2)  # shorter than the server's mid-frame pause
    timeouts = 0
    while True:
        try:
            got = ws.recv_text()
            break
        except TimeoutError:
            timeouts += 1
            assert timeouts < 50
    assert got == msg
    assert timeouts >= 1  # the pause really did interrupt mid-frame
    srv.close()
