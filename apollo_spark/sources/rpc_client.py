"""Real JSON-RPC HTTP client for EVM nodes (stdlib-only, executor-safe).

Implements BOTH injection protocols the sources define —
``EvmCallClient.call`` (sources/calls.py:38-43) and ``EvmLogClient.get_logs``
(sources/rpc_logs.py:66-70) — plus ``header`` for the BlockDater
(blockdater.py), so one client object powers every RPC-backed source.

Spark-first port of apollo's CachedClient
(/root/reference/chainservice/cached_client.go:36-185):

* the global golang-lru becomes a per-client (= per-executor-partition,
  via the factory pattern) bounded LRU — same 8192 default;
* genCallKey's immutable-selector rule (cached_client.go:57-69): calls to
  ``decimals()``/``symbol()``/``name()`` are keyed WITHOUT the block number
  so one fetch serves every block in a grid scan; everything else is keyed
  (chain, to, calldata, block) — deterministic for finalized blocks;
* headerCache (cached_client.go:92-112) becomes a second LRU keyed
  (chain, block);
* apollo's single ethclient per chain becomes one pooled, keep-alive
  ``http.client`` connection per (client, chain) — created lazily inside the
  executor task, NEVER pickled (the factory closes over plain config only);
* node "response too large" errors are mapped to ``RangeTooLargeError`` so
  ``rpc_log_source``'s bisection (rpc_logs.py) keeps working against real
  nodes exactly as against fakes.

Per-request metrics mirror the reference's counters and are dumped by
``stats()`` (chainservice.go:293-307's exit report).
"""

from __future__ import annotations

import json
import threading
import time
from collections import OrderedDict
from http.client import HTTPConnection, HTTPException, HTTPSConnection
from urllib.parse import urlparse

# selectors cached without block number (immutable ERC20 metadata;
# cached_client.go:57-69 — we add name() 06fdde03, same immutability)
_IMMUTABLE_SELECTORS = {"313ce567", "95d89b41", "06fdde03"}

# node error shapes meaning "narrow the getLogs range" (family differs per
# provider: Infura -32005, Alchemy "Log response size exceeded", geth
# "query returned more than 10000 results")
_RANGE_ERR_CODES = {-32005, -32602, -32000}
_RANGE_ERR_MARKERS = (
    "more than",
    "response size",
    "too large",
    "block range",
    "exceed",
)


class RpcError(Exception):
    """JSON-RPC level error (the node answered with an error object)."""

    def __init__(self, code: int, message: str):
        super().__init__(f"rpc error {code}: {message}")
        self.code = code
        self.message = message


class _Lru:
    """Tiny bounded LRU (OrderedDict-backed). One lock per cache: a client
    is usually partition-local, but the factory MAY hand one shared client
    to several local threads."""

    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0

    def get(self, key):
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                self.hits += 1
                return self._d[key]
            return None

    def put(self, key, value) -> None:
        with self._lock:
            self._d[key] = value
            self._d.move_to_end(key)
            if len(self._d) > self.maxsize:
                self._d.popitem(last=False)


def _hex_int(v, default=0) -> int:
    if v is None:
        return default
    if isinstance(v, int):
        return v
    return int(v, 16)


class JsonRpcHttpClient:
    """HTTP JSON-RPC client over per-chain endpoints.

    Parameters
    ----------
    endpoints: chain name -> http(s) URL. A plain string means a single
        unnamed chain (used for whatever ``chain`` is passed).
    timeout_s / retries / backoff_s: transport policy; retries apply to
        transport failures and 429/5xx, never to JSON-RPC errors (those are
        semantic: a reverted eth_call must fail the row, not loop).
    rate_limit: max requests/second for THIS client instance. The factory
        pattern makes that per-partition, matching apollo's global limit /
        log_parts split (chainservice.go:129-142).
    """

    def __init__(
        self,
        endpoints: dict[str, str] | str,
        *,
        timeout_s: float = 30.0,
        retries: int = 3,
        backoff_s: float = 0.5,
        rate_limit: float | None = None,
        cache_size: int = 8192,
        metrics=None,  # apollo_spark.metrics.RunMetrics: run-wide accumulators
    ):
        self.metrics = metrics
        self.endpoints = {"": endpoints} if isinstance(endpoints, str) else dict(endpoints)
        self.timeout_s = timeout_s
        self.retries = retries
        self.backoff_s = backoff_s
        self._min_interval = (1.0 / rate_limit) if rate_limit else 0.0
        self._last_request = 0.0
        self._call_cache = _Lru(cache_size)
        self._header_cache = _Lru(cache_size)
        self._conns: dict[str, HTTPConnection] = {}
        self._id = 0
        self._lock = threading.Lock()
        # counters mirroring cached_client.go's internal stats
        self.contract_call_requests = 0
        self.header_requests = 0
        self.filter_requests = 0

    # -- transport ---------------------------------------------------------

    def _endpoint(self, chain: str) -> str:
        if chain in self.endpoints:
            return self.endpoints[chain]
        if "" in self.endpoints:
            return self.endpoints[""]
        raise KeyError(f"no RPC endpoint configured for chain {chain!r} (have {sorted(self.endpoints)})")

    def _conn_for(self, url: str) -> HTTPConnection:
        conn = self._conns.get(url)
        if conn is None:
            p = urlparse(url)
            cls = HTTPSConnection if p.scheme == "https" else HTTPConnection
            conn = cls(p.hostname, p.port, timeout=self.timeout_s)
            self._conns[url] = conn
        return conn

    def _request(self, chain: str, method: str, params: list) -> object:
        url = self._endpoint(chain)
        p = urlparse(url)
        with self._lock:
            self._id += 1
            rid = self._id
        body = json.dumps({"jsonrpc": "2.0", "id": rid, "method": method, "params": params})
        last_err: Exception | None = None
        for attempt in range(self.retries + 1):
            if self._min_interval:
                wait = self._last_request + self._min_interval - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                self._last_request = time.monotonic()
            try:
                conn = self._conn_for(url)
                conn.request(
                    "POST",
                    p.path or "/",
                    body=body,
                    headers={"Content-Type": "application/json"},
                )
                resp = conn.getresponse()
                payload = resp.read()
                if resp.status in (429,) or resp.status >= 500:
                    last_err = RpcError(resp.status, f"http {resp.status}")
                    raise last_err
                msg = json.loads(payload)
            except RpcError:
                time.sleep(self.backoff_s * (2**attempt))
                continue
            # HTTPException covers IncompleteRead (connection dropped
            # mid-body) and CannotSendRequest (keep-alive desync) — neither
            # is an OSError, and un-caught either would fail the whole Spark
            # task on one transient hiccup instead of retrying.
            except (OSError, ValueError, HTTPException) as e:  # transport / malformed body
                self._conns.pop(url, None)  # drop the broken keep-alive conn
                last_err = e
                time.sleep(self.backoff_s * (2**attempt))
                continue
            if "error" in msg and msg["error"]:
                err = msg["error"]
                raise RpcError(int(err.get("code", 0)), str(err.get("message", "")))
            return msg.get("result")
        raise RpcError(-1, f"transport failed after {self.retries + 1} attempts: {last_err}")

    # -- EvmCallClient -----------------------------------------------------

    def call(self, chain: str, to: str, data: bytes, block: int | None) -> bytes:
        """eth_call at a block ('latest' when None). Results are LRU-cached:
        immutable ERC20 metadata selectors by (chain, to, selector) — one
        fetch serves a whole block grid — everything else by the full
        (chain, to, calldata, block) key; block=None (latest) is never
        cached (it is not deterministic)."""
        hexdata = data.hex()
        key = None
        if hexdata in _IMMUTABLE_SELECTORS:
            key = (chain, to.lower(), hexdata)
        elif block is not None:
            key = (chain, to.lower(), hexdata, block)
        if key is not None:
            hit = self._call_cache.get(key)
            if hit is not None:
                if self.metrics is not None:
                    self.metrics.add("cache_hits")
                return hit
        self.contract_call_requests += 1
        if self.metrics is not None:
            self.metrics.add("contract_call_requests")
        tag = "latest" if block is None else hex(block)
        result = self._request(chain, "eth_call", [{"to": to, "data": "0x" + hexdata}, tag])
        out = bytes.fromhex(str(result).removeprefix("0x")) if result else b""
        if key is not None:
            self._call_cache.put(key, out)
        return out

    # -- EvmLogClient ------------------------------------------------------

    def get_logs(
        self, chain: str, address: str | None, topic0: str | None, from_block: int, to_block: int
    ) -> list[dict]:
        """eth_getLogs over an inclusive block range, rows shaped like the
        raw logs table (RAW_LOG_SCHEMA). Node range-cap rejections surface
        as RangeTooLargeError so rpc_log_source bisects."""
        from apollo_spark.sources.rpc_logs import RangeTooLargeError

        self.filter_requests += 1
        if self.metrics is not None:
            self.metrics.add("filter_requests")
        flt: dict = {"fromBlock": hex(from_block), "toBlock": hex(to_block)}
        if address:
            flt["address"] = address
        if topic0:
            flt["topics"] = [topic0]
        try:
            raw = self._request(chain, "eth_getLogs", [flt])
        except RpcError as e:
            low = e.message.lower()
            if e.code in _RANGE_ERR_CODES and any(m in low for m in _RANGE_ERR_MARKERS):
                raise RangeTooLargeError(e.message) from e
            raise
        rows = []
        for lg in raw or []:
            rows.append(
                {
                    "chain": chain,
                    "block_number": _hex_int(lg.get("blockNumber")),
                    "block_hash": lg.get("blockHash"),
                    "tx_hash": lg.get("transactionHash"),
                    "tx_index": _hex_int(lg.get("transactionIndex")),
                    "log_index": _hex_int(lg.get("logIndex")),
                    "address": (lg.get("address") or "").lower(),
                    "topics": list(lg.get("topics") or []),
                    "data": bytes.fromhex(str(lg.get("data") or "0x").removeprefix("0x")),
                }
            )
        return rows

    # -- BlockDater / header source ---------------------------------------

    def header(self, chain: str, block: int | None) -> tuple[int, int]:
        """(block_number, unix_timestamp) via eth_getBlockByNumber; cached
        per (chain, number) like headerCache (cached_client.go:92-112)."""
        if block is not None:
            hit = self._header_cache.get((chain, block))
            if hit is not None:
                if self.metrics is not None:
                    self.metrics.add("cache_hits")
                return hit
        self.header_requests += 1
        if self.metrics is not None:
            self.metrics.add("header_requests")
        tag = "latest" if block is None else hex(block)
        result = self._request(chain, "eth_getBlockByNumber", [tag, False])
        if result is None:
            raise RpcError(-2, f"block {block!r} not found on {chain}")
        number = _hex_int(result.get("number"))
        ts = _hex_int(result.get("timestamp"))
        self._header_cache.put((chain, number), (number, ts))
        return number, ts

    # -- metrics -----------------------------------------------------------

    def stats(self) -> dict[str, int]:
        """Counter dump, mirroring apollo's DumpMetrics exit report
        (chainservice.go:293-307)."""
        return {
            "contract_call_requests": self.contract_call_requests,
            "header_requests": self.header_requests,
            "filter_requests": self.filter_requests,
            "cache_hits": self._call_cache.hits + self._header_cache.hits,
        }

    def close(self) -> None:
        for conn in self._conns.values():
            try:
                conn.close()
            except OSError:
                pass
        self._conns.clear()


def http_client_factory(
    endpoints: dict[str, str] | str, **kw
):
    """Picklable factory for the sources' ClientFactory slots: closes over
    plain config (no sockets), builds the client inside the executor task."""

    def make() -> JsonRpcHttpClient:
        return JsonRpcHttpClient(endpoints, **kw)

    return make
