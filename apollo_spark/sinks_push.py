"""Push-transport streaming sinks: SSE and WebSocket (SURVEY §2.6 roadmap).

Apollo's roadmap leaves this unshipped (/root/reference/ROADMAP.md:71
"Different stream output option for latency-sensitive operations (like
mempool monitoring): i.e. Websocket, SSE"); the shipped output layer is
stdout/CSV/Postgres only (/root/reference/output/output.go:82-173). This
module is the Spark-side design for that row: a Structured Streaming
``foreachBatch`` hook fans each micro-batch out to connected SSE and
WebSocket subscribers, topic = query name.

Scale posture — this is deliberately a DRIVER-SIDE latency path, not a bulk
export: the consumers it exists for (alert feeds, monitoring dashboards,
apollo's mempool use case) want milliseconds-fresh SMALL results. The
foreachBatch hook therefore hard-caps rows collected per micro-batch
(``max_rows_per_batch``, default 10_000) and raises past it, pointing bulk
consumers at the distributed sinks (parquet/JDBC/TxTable in sinks.py). Every
executor-side stage stays untouched: the only driver work is one bounded
``collect()`` per micro-batch and non-blocking socket writes. A slow client
never back-pressures the stream — each subscriber has a bounded queue and is
DROPPED on overflow (latency transport semantics: a consumer that can't keep
up reconnects and resumes from current; replayable history is what the
TxTable/parquet sinks are for).

Both servers are Python-stdlib only (http.server / socket + RFC 6455
server-side handshake) so the latency path works in-container; the test
client is the existing ws_bridge.WsConnection, which exercises the same
frame grammar from the other side.
"""

from __future__ import annotations

import base64
import hashlib
import queue
import socket
import ssl
import struct
import threading
from dataclasses import dataclass, field

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
# non-blocking reads signal "nothing yet" differently on plain vs TLS sockets
_WOULD_BLOCK = (BlockingIOError, ssl.SSLWantReadError, ssl.SSLWantWriteError)


class PushOverflowError(RuntimeError):
    """A micro-batch exceeded max_rows_per_batch on the latency path."""


@dataclass
class _Subscriber:
    topic: str
    q: queue.Queue = field(default_factory=lambda: queue.Queue(maxsize=1024))
    dead: bool = False


class TopicHub:
    """In-process pub/sub: publish(topic, line) fans out to every live
    subscriber of that topic. Bounded per-subscriber queues; overflow marks
    the subscriber dead instead of blocking the publisher (the streaming
    query's foreachBatch must never stall on a slow socket)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._subs: list[_Subscriber] = []

    def subscribe(self, topic: str) -> _Subscriber:
        sub = _Subscriber(topic)
        with self._lock:
            self._subs.append(sub)
        return sub

    def unsubscribe(self, sub: _Subscriber) -> None:
        with self._lock:
            if sub in self._subs:
                self._subs.remove(sub)

    def publish(self, topic: str, line: str) -> int:
        """Returns the number of live subscribers the line reached."""
        with self._lock:
            subs = [s for s in self._subs if s.topic == topic and not s.dead]
        n = 0
        for s in subs:
            try:
                s.q.put_nowait(line)
                n += 1
            except queue.Full:
                s.dead = True  # reader will notice and close the socket
        return n

    def n_subscribers(self, topic: str | None = None) -> int:
        with self._lock:
            return sum(
                1 for s in self._subs if not s.dead and (topic is None or s.topic == topic)
            )


def _recv_until(sock: socket.socket, marker: bytes, limit: int = 65536) -> bytes:
    buf = b""
    while marker not in buf:
        if len(buf) > limit:
            raise ValueError("oversized request head")
        chunk = sock.recv(4096)
        if not chunk:
            raise ValueError("connection closed during request")
        buf += chunk
    return buf


class _PushServer:
    """Shared accept-loop plumbing for the SSE and WebSocket servers: bind,
    one daemon thread per connection, clean close() that unblocks accept."""

    def __init__(self, hub: TopicHub, host: str = "127.0.0.1", port: int = 0):
        self.hub = hub
        self._srv = socket.create_server((host, port))
        self._srv.settimeout(0.25)
        self.port = self._srv.getsockname()[1]
        self._closing = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._serve_guarded, args=(conn,), daemon=True).start()

    def _serve_guarded(self, conn: socket.socket) -> None:
        try:
            self._serve(conn)
        except Exception:
            pass  # a broken client must never take the server thread down
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _serve(self, conn: socket.socket) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def close(self) -> None:
        self._closing = True
        try:
            self._srv.close()
        except OSError:
            pass
        self._thread.join(timeout=2.0)


def _topic_from_path(head: bytes) -> str:
    line = head.split(b"\r\n", 1)[0].decode(errors="replace")
    parts = line.split(" ")
    if len(parts) < 2 or parts[0] != "GET":
        raise ValueError(f"unsupported request: {line!r}")
    return parts[1].lstrip("/").split("?", 1)[0]


class SseServer(_PushServer):
    """Server-Sent Events endpoint: ``GET /<query_name>`` holds the response
    open and streams ``data: <json-row>\\n\\n`` per published row (SSE wire
    format, WHATWG HTML §9.2). Heartbeat comments keep idle connections
    alive through proxies."""

    def _serve(self, conn: socket.socket) -> None:
        conn.settimeout(30.0)
        topic = _topic_from_path(_recv_until(conn, b"\r\n\r\n"))
        sub = self.hub.subscribe(topic)
        try:
            conn.sendall(
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/event-stream\r\n"
                b"Cache-Control: no-cache\r\n"
                b"Connection: keep-alive\r\n\r\n"
            )
            while not self._closing and not sub.dead:
                try:
                    line = sub.q.get(timeout=5.0)
                except queue.Empty:
                    conn.sendall(b": heartbeat\n\n")  # SSE comment, ignored by clients
                    continue
                conn.sendall(b"data: " + line.encode() + b"\n\n")
        finally:
            self.hub.unsubscribe(sub)


class WsPushServer(_PushServer):
    """WebSocket endpoint: RFC 6455 server-side handshake on
    ``GET /<query_name>``, then one unmasked server->client text frame per
    published row. Client frames are consumed (and must be masked per the
    RFC) but only close (0x8) is acted on — this is a one-way push feed."""

    def _serve(self, conn: socket.socket) -> None:
        conn.settimeout(30.0)
        head = _recv_until(conn, b"\r\n\r\n")
        topic = _topic_from_path(head)
        key = ""
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        if not key:
            conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            raise ValueError("missing Sec-WebSocket-Key")
        accept = base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )
        sub = self.hub.subscribe(topic)
        conn.setblocking(False)
        try:
            while not self._closing and not sub.dead:
                if self._client_closed(conn):
                    return
                try:
                    line = sub.q.get(timeout=0.25)
                except queue.Empty:
                    continue
                self._send_text(conn, line)
        finally:
            self.hub.unsubscribe(sub)

    @staticmethod
    def _send_text(conn: socket.socket, text: str) -> None:
        payload = text.encode()
        n = len(payload)
        if n < 126:
            header = struct.pack("!BB", 0x81, n)
        elif n < 1 << 16:
            header = struct.pack("!BBH", 0x81, 126, n)
        else:
            header = struct.pack("!BBQ", 0x81, 127, n)
        conn.setblocking(True)
        try:
            conn.sendall(header + payload)
        finally:
            conn.setblocking(False)

    @staticmethod
    def _client_closed(conn: socket.socket) -> bool:
        """Drain any client frames without blocking; True on close (0x8) or
        EOF. Payloads are ignored — push feed, not RPC."""
        try:
            data = conn.recv(4096)
        except _WOULD_BLOCK:
            return False
        except OSError:
            return True
        if not data:
            return True
        return len(data) >= 1 and (data[0] & 0x0F) == 0x8


def push_foreach_batch(hub: TopicHub, query_name: str, max_rows_per_batch: int = 10_000):
    """foreachBatch hook: serialize each micro-batch's rows to JSON lines on
    the driver and publish to ``hub`` under the query's topic.

    The ONLY driver-side materialization on this path, and it is guarded:
    a micro-batch wider than ``max_rows_per_batch`` raises PushOverflowError
    naming the distributed sinks — a latency feed that big is a bulk export
    wearing the wrong transport. Delivery is at-most-once per connected
    subscriber by design (see module docstring); pair with a TxTable/parquet
    sink in the same foreachBatch fan-out when replayable history matters.
    """

    def _write(batch_df, batch_id: int) -> None:
        # limit+1 bounds the collect itself: the guard must not OOM the
        # driver while checking for oversize.
        rows = batch_df.limit(max_rows_per_batch + 1).toJSON().collect()
        if len(rows) > max_rows_per_batch:
            raise PushOverflowError(
                f"{query_name} batch {batch_id} exceeds max_rows_per_batch="
                f"{max_rows_per_batch}; push sinks are the latency path — "
                "use the parquet/JDBC/TxTable sinks (sinks.SinkWriter) for "
                "bulk output, or raise the cap knowingly"
            )
        for line in rows:
            hub.publish(query_name, line)

    return _write


def publish_dataframe(hub: TopicHub, df, query_name: str, max_rows: int = 10_000) -> int:
    """Batch-mode convenience: push a (small) result frame once — apollo's
    stdout-style 'show me the rows now' over SSE/WS instead of a terminal.
    Same row guard as the streaming path. Returns rows published."""
    rows = df.limit(max_rows + 1).toJSON().collect()
    if len(rows) > max_rows:
        raise PushOverflowError(
            f"{query_name}: result exceeds max_rows={max_rows}; use the "
            "distributed sinks for bulk output"
        )
    for line in rows:
        hub.publish(query_name, line)
    return len(rows)
