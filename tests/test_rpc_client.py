"""JsonRpcHttpClient tests against a local fake JSON-RPC node (stdlib HTTP
server) — transport, caching, error mapping, and end-to-end composition with
rpc_log_source through Spark. An opt-in live-chain test runs only when
APOLLO_SPARK_RPC_URL is set."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from apollo_spark.sources.rpc_client import JsonRpcHttpClient, RpcError, http_client_factory


class FakeNode(BaseHTTPRequestHandler):
    """Tiny JSON-RPC node: 1000-block chain, one Transfer-ish log per block,
    eth_call returns calldata-dependent deterministic bytes. Class-level
    knobs let tests inject failures."""

    fail_next = 0  # respond 500 this many times
    range_cap = 1000  # getLogs ranges wider than this are rejected
    requests: list = []

    def do_POST(self):
        cls = type(self)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls.requests.append(body["method"])
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        result, error = self._dispatch(body["method"], body["params"])
        payload = {"jsonrpc": "2.0", "id": body["id"]}
        if error:
            payload["error"] = error
        else:
            payload["result"] = result
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _dispatch(self, method, params):
        if method == "eth_call":
            msg, tag = params
            data = msg["data"].removeprefix("0x")
            if data == "313ce567":  # decimals() -> 18
                return "0x" + (18).to_bytes(32, "big").hex(), None
            blk = 999 if tag == "latest" else int(tag, 16)
            return "0x" + blk.to_bytes(32, "big").hex(), None
        if method == "eth_getLogs":
            flt = params[0]
            lo, hi = int(flt["fromBlock"], 16), int(flt["toBlock"], 16)
            if hi - lo + 1 > type(self).range_cap:
                return None, {"code": -32005, "message": "query returned more than 10000 results"}
            logs = []
            for b in range(lo, hi + 1):
                logs.append(
                    {
                        "blockNumber": hex(b),
                        "blockHash": "0x" + f"{b:064x}",
                        "transactionHash": "0x" + f"{b * 2 + 1:064x}",
                        "transactionIndex": "0x1",
                        "logIndex": "0x0",
                        "address": "0x" + "AB" * 20,
                        "topics": ["0x" + "11" * 32],
                        "data": "0x" + f"{b:064x}",
                    }
                )
            return logs, None
        if method == "eth_getBlockByNumber":
            tag = params[0]
            n = 999 if tag == "latest" else int(tag, 16)
            return {"number": hex(n), "timestamp": hex(1_650_000_000 + n * 12)}, None
        return None, {"code": -32601, "message": f"unknown method {method}"}

    def log_message(self, *a):  # silence stderr
        pass


@pytest.fixture(scope="module")
def node_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), FakeNode)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


@pytest.fixture(autouse=True)
def reset_node():
    FakeNode.fail_next = 0
    FakeNode.range_cap = 1000
    FakeNode.requests = []


def test_eth_call_roundtrip_and_block_cache(node_url):
    c = JsonRpcHttpClient(node_url)
    out = c.call("ethereum", "0x" + "ab" * 20, bytes.fromhex("aabbccdd"), 7)
    assert int.from_bytes(out, "big") == 7
    # same (to, data, block): served from cache — no second request
    before = c.contract_call_requests
    assert c.call("ethereum", "0x" + "ab" * 20, bytes.fromhex("aabbccdd"), 7) == out
    assert c.contract_call_requests == before
    # different block: refetched
    c.call("ethereum", "0x" + "ab" * 20, bytes.fromhex("aabbccdd"), 8)
    assert c.contract_call_requests == before + 1
    # latest (block=None): NEVER cached
    c.call("ethereum", "0x" + "ab" * 20, bytes.fromhex("aabbccdd"), None)
    c.call("ethereum", "0x" + "ab" * 20, bytes.fromhex("aabbccdd"), None)
    assert c.contract_call_requests == before + 3


def test_immutable_selector_cached_across_blocks(node_url):
    """decimals() is keyed without block (cached_client.go:57-69): a whole
    grid scan costs ONE request."""
    c = JsonRpcHttpClient(node_url)
    decimals = bytes.fromhex("313ce567")
    for blk in range(100, 120):
        out = c.call("ethereum", "0x" + "cd" * 20, decimals, blk)
        assert int.from_bytes(out, "big") == 18
    assert c.contract_call_requests == 1
    assert c.stats()["cache_hits"] == 19


def test_get_logs_maps_raw_log_schema(node_url):
    c = JsonRpcHttpClient({"ethereum": node_url})
    rows = c.get_logs("ethereum", None, None, 5, 7)
    assert [r["block_number"] for r in rows] == [5, 6, 7]
    r = rows[0]
    assert r["chain"] == "ethereum" and r["tx_index"] == 1 and r["log_index"] == 0
    assert r["address"] == "0x" + "ab" * 20  # lowercased
    assert isinstance(r["data"], bytes) and int.from_bytes(r["data"], "big") == 5


def test_get_logs_range_cap_maps_to_bisection_error(node_url):
    from apollo_spark.sources.rpc_logs import RangeTooLargeError

    FakeNode.range_cap = 8
    c = JsonRpcHttpClient(node_url)
    with pytest.raises(RangeTooLargeError):
        c.get_logs("ethereum", None, None, 0, 63)
    assert len(c.get_logs("ethereum", None, None, 0, 7)) == 8


def test_rpc_error_not_retried(node_url):
    c = JsonRpcHttpClient(node_url, retries=3)
    with pytest.raises(RpcError):
        c._request("ethereum", "eth_unknown", [])
    # semantic errors must not burn retries
    assert FakeNode.requests.count("eth_unknown") == 1


def test_transport_retry_on_500(node_url):
    FakeNode.fail_next = 2
    c = JsonRpcHttpClient(node_url, retries=3, backoff_s=0.01)
    out = c.call("ethereum", "0x" + "ab" * 20, bytes.fromhex("11223344"), 3)
    assert int.from_bytes(out, "big") == 3


def test_header_cache(node_url):
    c = JsonRpcHttpClient(node_url)
    assert c.header("ethereum", 100) == (100, 1_650_000_000 + 1200)
    assert c.header("ethereum", 100) == (100, 1_650_000_000 + 1200)
    assert c.header_requests == 1
    n, ts = c.header("ethereum", None)  # latest: always fetched
    assert n == 999


def test_missing_chain_endpoint_is_loud():
    c = JsonRpcHttpClient({"ethereum": "http://127.0.0.1:1"})
    with pytest.raises(KeyError, match="polygon"):
        c.call("polygon", "0x" + "ab" * 20, b"\x00", 1)


def test_rpc_log_source_end_to_end_over_http(spark, node_url):
    """The real client composes with the distributed log scan: executors
    (local threads) fetch from the fake node over actual HTTP, bisection
    driven by the node's range cap."""
    from apollo_spark.sources.rpc_logs import rpc_log_source

    from apollo_spark.metrics import RunMetrics

    FakeNode.range_cap = 8
    metrics = RunMetrics(spark)
    df = rpc_log_source(
        spark,
        http_client_factory({"ethereum": node_url}, metrics=metrics),
        chain="ethereum",
        from_block=100,
        to_block=163,
        parts=2,
    )
    out = df.toPandas().sort_values("block_number")
    assert list(out["block_number"]) == list(range(100, 164))
    assert set(out["log_index"]) == {0}
    # exit-report counters aggregated from executor tasks: 2 partitions x
    # (1 @32-fail + 2 @16-fail + 4 @8-ok) = 14 getLogs requests
    rep = metrics.report()
    assert rep["filter_requests"] == 14
    assert rep["contract_call_requests"] == 0 and rep["processing_time_s"] > 0


@pytest.mark.skipif(
    not os.environ.get("APOLLO_SPARK_RPC_URL"),
    reason="live-chain integration: set APOLLO_SPARK_RPC_URL to run",
)
def test_live_chain_smoke():
    url = os.environ["APOLLO_SPARK_RPC_URL"]
    c = JsonRpcHttpClient(url, rate_limit=2.0)
    n, ts = c.header("", None)
    assert n > 0 and ts > 1_400_000_000
