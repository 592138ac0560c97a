"""WS -> JSONL bridge daemon: the realtime ingress for S3/S4 streams.

Apollo holds one ``eth_subscribe`` websocket per realtime query and fans
each log into per-query goroutines
(/root/reference/chainservice/events.go:221-320). Spark tasks cannot hold a
websocket, so the production topology is this tiny daemon: subscribe to
logs over WS, append them as JSONL files into a bridge directory, and let
``raw_log_stream`` (streaming.py) readStream that directory. The
transform/decode tail is identical to batch.

Design points:

* **stdlib-only RFC 6455 client** (this container has no websocket lib):
  handshake with Sec-WebSocket-Accept validation, masked client frames,
  ping/pong, 16/64-bit payload lengths, TLS for ``wss://``.
* **Atomic file rotation**: rows buffer in memory and land as
  ``write tmp + rename`` every ``rotate_rows`` rows or ``rotate_s`` seconds
  — Structured Streaming's file source lists whole files, so a partially
  written file must never be visible.
* **Reconnect with capped backoff** (events.go:257-262's resubscribe): on
  any socket error the daemon redials and resubscribes. Overlapping logs
  after a reconnect are expected; the downstream ``dedup_event_stream``
  (keys tx_hash+log_index+block_hash) makes delivery exactly-once.
* **Reorg policy**: ``removed: true`` notifications are dropped (an
  append-only bridge can't retract the row it already wrote); the
  re-included log carries a new block_hash, so dedup keeps it.
* Rows are shaped exactly like RAW_LOG_STREAM_SCHEMA (streaming.py:38-50):
  chain, block_number, block_hash, tx_hash, tx_index, log_index, address,
  topics, data_hex.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import secrets
import socket
import ssl
import struct
import threading
import time
from pathlib import Path
from urllib.parse import urlparse

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class WsError(Exception):
    pass


class WsConnection:
    """Minimal RFC 6455 client: text frames in/out, transparent ping/pong,
    server-initiated close surfaces as WsError."""

    def __init__(self, url: str, timeout_s: float = 30.0):
        p = urlparse(url)
        if p.scheme not in ("ws", "wss"):
            raise WsError(f"not a websocket URL: {url}")
        port = p.port or (443 if p.scheme == "wss" else 80)
        raw = socket.create_connection((p.hostname, port), timeout=timeout_s)
        if p.scheme == "wss":
            raw = ssl.create_default_context().wrap_socket(raw, server_hostname=p.hostname)
        self.sock = raw
        self._buf = b""
        self._parts: list[bytes] = []  # fragment reassembly, timeout-survivable
        key = base64.b64encode(secrets.token_bytes(16)).decode()
        path = p.path or "/"
        if p.query:
            path += "?" + p.query
        host = p.hostname + (f":{p.port}" if p.port else "")
        self.sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\n"
                f"Host: {host}\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        resp = self._read_until(b"\r\n\r\n")
        status = resp.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise WsError(f"handshake rejected: {status.decode(errors='replace')}")
        expect = base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()
        accept = ""
        for line in resp.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-accept:"):
                accept = line.split(b":", 1)[1].strip().decode()
        if accept != expect:
            raise WsError("handshake Sec-WebSocket-Accept mismatch")

    # -- byte plumbing -----------------------------------------------------

    def _read_until(self, marker: bytes) -> bytes:
        while marker not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise WsError("connection closed during handshake")
            self._buf += chunk
        head, self._buf = self._buf.split(marker, 1)
        return head + marker

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise WsError("connection closed mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    # -- frames ------------------------------------------------------------

    def _send_frame(self, opcode: int, payload: bytes) -> None:
        mask = secrets.token_bytes(4)
        n = len(payload)
        if n < 126:
            header = struct.pack("!BB", 0x80 | opcode, 0x80 | n)
        elif n < 1 << 16:
            header = struct.pack("!BBH", 0x80 | opcode, 0x80 | 126, n)
        else:
            header = struct.pack("!BBQ", 0x80 | opcode, 0x80 | 127, n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self.sock.sendall(header + mask + masked)

    def send_text(self, text: str) -> None:
        self._send_frame(0x1, text.encode())

    def _try_parse_frame(self) -> tuple[int, int, bytes] | None:
        """Parse one complete frame from the buffer WITHOUT consuming any
        bytes until the whole frame is present. This makes recv timeouts
        restartable: a timeout mid-frame leaves the buffer intact, so the
        next call resumes the SAME frame instead of desyncing by treating
        payload bytes as a header."""
        buf = self._buf
        if len(buf) < 2:
            return None
        b0, b1 = buf[0], buf[1]
        n = b1 & 0x7F
        pos = 2
        if n == 126:
            if len(buf) < 4:
                return None
            (n,) = struct.unpack("!H", buf[2:4])
            pos = 4
        elif n == 127:
            if len(buf) < 10:
                return None
            (n,) = struct.unpack("!Q", buf[2:10])
            pos = 10
        masked = bool(b1 & 0x80)
        total = pos + (4 if masked else 0) + n
        if len(buf) < total:
            return None
        if masked:  # masked server frame: legal to unmask, unusual
            mask = buf[pos : pos + 4]
            raw = buf[pos + 4 : total]
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(raw))
        else:
            payload = buf[pos:total]
        self._buf = buf[total:]
        return b0 & 0x0F, b0 & 0x80, payload

    def recv_text(self) -> str:
        """Next complete text message (fragments reassembled); answers pings
        inline; raises WsError on close. Safe to retry after a socket
        timeout — partial frames stay buffered and collected fragments live
        on the connection (``_parts``), so nothing is lost."""
        while True:
            frame = self._try_parse_frame()
            if frame is None:
                chunk = self.sock.recv(65536)  # may raise timeout: harmless
                if not chunk:
                    raise WsError("connection closed mid-frame")
                self._buf += chunk
                continue
            opcode, fin, payload = frame
            if opcode == 0x9:  # ping -> pong, keep reading
                self._send_frame(0xA, payload)
                continue
            if opcode == 0xA:  # unsolicited pong
                continue
            if opcode == 0x8:
                raise WsError("server closed the websocket")
            self._parts.append(payload)
            if fin:
                msg = b"".join(self._parts).decode()
                self._parts = []
                return msg

    def close(self) -> None:
        try:
            self._send_frame(0x8, b"")
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


class BridgeWriter:
    """Buffered JSONL writer with atomic rotation (tmp + rename)."""

    def __init__(self, bridge_dir: str | Path, rotate_rows: int = 256, rotate_s: float = 2.0):
        self.dir = Path(bridge_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.rotate_rows = rotate_rows
        self.rotate_s = rotate_s
        self._rows: list[str] = []
        self._opened = time.monotonic()
        self._seq = 0
        # random token: pid alone is NOT unique — the CLI runs one bridge
        # thread per chain in one process, and two writers flushing within
        # the same millisecond would collide on (pid, seq, ms) and rename()
        # would silently replace the earlier batch
        self._uid = secrets.token_hex(4)

    def add(self, row: dict) -> None:
        self._rows.append(json.dumps(row, separators=(",", ":")))
        if len(self._rows) >= self.rotate_rows or (time.monotonic() - self._opened) >= self.rotate_s:
            self.flush()

    def flush(self) -> None:
        if not self._rows:
            self._opened = time.monotonic()
            return
        # name carries (pid, writer-uid, seq, ms) so concurrent bridges —
        # including threads within ONE process — never collide
        name = f"bridge-{os.getpid()}-{self._uid}-{self._seq:08d}-{int(time.time() * 1000)}.jsonl"
        tmp = self.dir / ("." + name + ".tmp")
        tmp.write_text("\n".join(self._rows) + "\n")
        tmp.rename(self.dir / name)  # atomic: the stream never sees partials
        self._rows = []
        self._seq += 1
        self._opened = time.monotonic()


def _log_to_row(chain: str, lg: dict) -> dict:
    def hx(v, default=0):
        if v is None:
            return default
        return v if isinstance(v, int) else int(v, 16)

    return {
        "chain": chain,
        "block_number": hx(lg.get("blockNumber")),
        "block_hash": lg.get("blockHash"),
        "tx_hash": lg.get("transactionHash"),
        "tx_index": hx(lg.get("transactionIndex")),
        "log_index": hx(lg.get("logIndex")),
        "address": (lg.get("address") or "").lower(),
        "topics": list(lg.get("topics") or []),
        "data_hex": lg.get("data") or "0x",
    }


def run_bridge(
    ws_url: str,
    bridge_dir: str | Path,
    chain: str,
    *,
    address: str | None = None,
    topics: list[str] | None = None,
    stop: threading.Event | None = None,
    rotate_rows: int = 256,
    rotate_s: float = 2.0,
    backoff_s: float = 1.0,
    max_backoff_s: float = 30.0,
    max_reconnects: int | None = None,
) -> None:
    """Blocking daemon loop: subscribe, append, reconnect forever (until
    ``stop`` is set or ``max_reconnects`` consecutive failures)."""
    stop = stop or threading.Event()
    writer = BridgeWriter(bridge_dir, rotate_rows=rotate_rows, rotate_s=rotate_s)
    failures = 0
    while not stop.is_set():
        conn = None
        try:
            conn = WsConnection(ws_url)
            params: dict = {}
            if address:
                params["address"] = address
            if topics:
                params["topics"] = topics
            sub = ["logs", params] if params else ["logs"]
            conn.send_text(json.dumps({"jsonrpc": "2.0", "id": 1, "method": "eth_subscribe", "params": sub}))
            ack = json.loads(conn.recv_text())
            if "error" in ack and ack["error"]:
                raise WsError(f"eth_subscribe rejected: {ack['error']}")
            failures = 0
            # short socket timeout so stop/rotate checks run even when idle
            conn.sock.settimeout(max(rotate_s / 2, 0.2))
            while not stop.is_set():
                try:
                    msg = json.loads(conn.recv_text())
                except (TimeoutError, socket.timeout):
                    writer.flush()  # time-based rotation while quiet
                    continue
                if msg.get("method") == "eth_subscription":
                    lg = msg["params"]["result"]
                    # Reorg: the node re-sends orphaned logs with
                    # removed=true. An append-only bridge cannot retract the
                    # already-written row, but it must NOT write the phantom
                    # again as a fresh event — and when the log is
                    # re-included in the new block it arrives with
                    # removed=false and a NEW block_hash, which the
                    # downstream dedup (keys tx_hash, log_index, block_hash)
                    # correctly treats as a distinct delivery.
                    if lg.get("removed"):
                        continue
                    writer.add(_log_to_row(chain, lg))
        except (OSError, WsError, json.JSONDecodeError, KeyError):
            failures += 1
            if max_reconnects is not None and failures > max_reconnects:
                raise
            stop.wait(min(backoff_s * (2 ** (failures - 1)), max_backoff_s))
        finally:
            if conn is not None:
                conn.close()
            writer.flush()


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        "apollo_spark.sources.ws_bridge",
        description="WS eth_subscribe -> JSONL bridge directory for realtime streams",
    )
    p.add_argument("--url", required=True, help="ws:// or wss:// endpoint")
    p.add_argument("--chain", required=True)
    p.add_argument("--bridge-dir", required=True)
    p.add_argument("--address", default=None, help="contract filter (S3); omit for global (S4)")
    p.add_argument("--topic0", default=None, help="event signature filter")
    p.add_argument("--rotate-rows", type=int, default=256)
    p.add_argument("--rotate-seconds", type=float, default=2.0)
    args = p.parse_args(argv)
    run_bridge(
        args.url,
        args.bridge_dir,
        args.chain,
        address=args.address,
        topics=[args.topic0] if args.topic0 else None,
        rotate_rows=args.rotate_rows,
        rotate_s=args.rotate_seconds,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
