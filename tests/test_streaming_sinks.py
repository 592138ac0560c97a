"""Streaming source + sink fan-out + BlockDater tests."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from apollo_spark.abi import Abi, abi_encode


@pytest.fixture(scope="module")
def unipair():
    return Abi.from_file("/root/reference/test/unipair.abi.json")


def _write_bridge_files(dir_: Path, abi: Abi, n: int = 20, start: int = 0, fname: str = "batch0.jsonl"):
    """Emulate the WS->JSONL bridge output. ``start``/``fname`` let a test
    append a SECOND file of distinct events (new blocks -> new dedup keys)
    to drive a later micro-batch."""
    ev = abi.events["Swap"]
    rows = []
    for j in range(n):
        i = start + j
        data = abi_encode(["uint256"] * 4, [i, 0, i * 2, 0])
        rows.append(
            {
                "chain": "arbitrum",
                "block_number": 10_000_000 + i,
                "block_hash": "0x" + f"{i:064x}",
                "tx_hash": "0x" + f"{i + 7:064x}",
                "tx_index": i % 5,
                "log_index": 0,
                "address": "0x905dfcd5649217c42684f23958568e533c711aa3",
                "topics": [ev.topic0, "0x" + "11" * 32, "0x" + "22" * 32],
                "data_hex": "0x" + data.hex(),
            }
        )
    dir_.mkdir(parents=True, exist_ok=True)
    (dir_ / fname).write_text("\n".join(json.dumps(r) for r in rows))


def test_event_stream_decodes(spark, tmp_path, unipair):
    """S3 path: bridge JSONL -> readStream -> decode -> memory sink."""
    from apollo_spark.sources.streaming import event_stream

    bridge = tmp_path / "bridge"
    _write_bridge_files(bridge, unipair, n=20)
    stream = event_stream(
        spark,
        str(bridge),
        unipair.events["Swap"],
        chain="arbitrum",
        address="0x905dfcd5649217c42684f23958568e533c711aa3",
        outputs=["amount0In", "amount0Out"],
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("swaps_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM swaps_rt").collect()
    assert len(out) == 20
    by_block = {r.block_number: r for r in out}
    assert int(by_block[10_000_005].amount0In) == 5
    assert int(by_block[10_000_005].amount0Out) == 10
    # realtime semantics: wall-clock timestamp, not block time (events.go:310)
    now = int(time.time())
    assert all(abs(r.timestamp - now) < 300 for r in out)


def test_windowed_event_counts(spark, tmp_path, unipair):
    """Watermarked tumbling-window aggregation over the decoded stream."""
    from apollo_spark.sources.streaming import event_stream, windowed_event_counts

    bridge = tmp_path / "bridge2"
    _write_bridge_files(bridge, unipair, n=12)
    stream = event_stream(spark, str(bridge), unipair.events["Swap"], chain="arbitrum")
    counts = windowed_event_counts(stream, window_seconds=3600, watermark_seconds=60)
    q = (
        counts.writeStream.format("memory")
        .queryName("swap_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # append mode emits only closed windows; the current window is open, so
    # assert the query ran and the state machinery accepted the watermark
    assert q.lastProgress is not None
    spark.sql("SELECT * FROM swap_counts").collect()  # schema materializes


def test_method_call_stream_builds(spark, unipair):
    """S6: rate-ticker method stream constructs a valid streaming plan."""
    from apollo_spark.dsl.schema import ContractSpec, MethodSpec
    from apollo_spark.sources.streaming import method_call_stream

    contract = ContractSpec(
        address="0x905dfcd5649217c42684f23958568e533c711aa3",
        abi_name="unipair.abi.json",
        methods=[MethodSpec(name="getReserves", outputs=["_reserve0", "_reserve1"])],
        abi=unipair,
    )
    stream = method_call_stream(
        spark, contract, chain="arbitrum", interval_seconds=5, client_factory=lambda: None
    )
    assert stream.isStreaming
    assert {"chain", "contract_address", "_reserve0", "_reserve1", "timestamp"} <= set(stream.columns)


def test_sink_fanout_batch(spark, tmp_path):
    from apollo_spark.sinks import SinkConfig, SinkWriter

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    cfg = SinkConfig(
        csv_dir=str(tmp_path / "csv"),
        json_dir=str(tmp_path / "js"),
        parquet_dir=str(tmp_path / "pq"),
        single_file=True,
    )
    writer = SinkWriter(cfg)
    writer.write(df, "my_query")
    csv_back = spark.read.option("header", "true").csv(str(tmp_path / "csv" / "my_query"))
    assert {(int(r.id), r.s) for r in csv_back.collect()} == {(1, "a"), (2, "b")}
    js_back = spark.read.json(str(tmp_path / "js" / "my_query"))
    assert {(int(r.id), r.s) for r in js_back.collect()} == {(1, "a"), (2, "b")}
    pq_back = spark.read.parquet(str(tmp_path / "pq" / "my_query"))
    assert pq_back.count() == 2


def test_streaming_sink_fanout(spark, tmp_path, unipair):
    """foreachBatch fan-out: one stream feeding csv + parquet sinks."""
    from apollo_spark.sinks import SinkConfig, SinkWriter
    from apollo_spark.sources.streaming import event_stream

    bridge = tmp_path / "bridge3"
    _write_bridge_files(bridge, unipair, n=10)
    stream = event_stream(spark, str(bridge), unipair.events["Swap"], chain="arbitrum")
    writer = SinkWriter(SinkConfig(csv_dir=str(tmp_path / "scsv"), parquet_dir=str(tmp_path / "spq")))
    q = (
        stream.writeStream.foreachBatch(writer.foreach_batch("rt_swaps"))
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.read.parquet(str(tmp_path / "spq" / "rt_swaps")).count() == 10
    assert spark.read.option("header", "true").csv(str(tmp_path / "scsv" / "rt_swaps")).count() == 10


def test_foreach_batch_jdbc_never_overwrites_after_restart():
    """The streaming JDBC path must append unconditionally — restarts replay
    the in-flight micro-batch, and multiple streams of one query share the
    table with independent batch-id sequences, so ANY overwrite (in-memory
    first-write state or batch_id == 0) wipes rows a co-writer or a previous
    incarnation already committed."""
    from apollo_spark.sinks import SinkConfig, SinkWriter

    class _RecordingWrite:
        def __init__(self, log):
            self._log = log

        def jdbc(self, url, table, mode, properties):
            self._log.append((table, mode))

    class _FakeBatchDF:
        def __init__(self, log):
            self.write = _RecordingWrite(log)

    cfg = SinkConfig(jdbc_url="jdbc:fake://db")
    log: list = []
    writer = SinkWriter(cfg)
    hook = writer.foreach_batch("q")
    hook(_FakeBatchDF(log), 0)  # even the true first batch appends
    hook(_FakeBatchDF(log), 1)
    assert log == [("q", "append"), ("q", "append")]

    # restart: fresh writer object (in-memory state gone), batch 1 replayed
    log2: list = []
    hook2 = SinkWriter(cfg).foreach_batch("q")
    hook2(_FakeBatchDF(log2), 1)
    hook2(_FakeBatchDF(log2), 2)
    assert log2 == [("q", "append"), ("q", "append")]

    # a second stream of the same query (own batch-id sequence from 0)
    # must never overwrite the shared table
    log3: list = []
    hook3 = writer.foreach_batch("q")
    hook3(_FakeBatchDF(log3), 0)
    assert log3 == [("q", "append")]


def test_compile_streaming_query_applies_dsl_tail(spark, tmp_path, catalog, unipair):
    """Realtime EvalSave parity (main.go:173-193): the streaming compile must
    run the SAME transform/filter/save tail as batch over the bridge stream —
    and union a query's sources into one stream."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_streaming_query

    bridge = tmp_path / "bridge_dsl"
    _write_bridge_files(bridge, unipair, n=8)  # amount0In = 0..7
    schema = parse_schema(
        """
query rt_dsl {
  chain = "arbitrum"
  contract {
    address = "0x905dfcd5649217c42684f23958568e533c711aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount0In"]
    }
    transform {
      doubled = amount0In * 2
    }
  }
  filter = [ amount0In != 0 ]
  save {
    block = blocknumber
    v = doubled
  }
}
""",
        confdir="/root/reference/test",
    )
    q = schema.queries[0]
    sdf = compile_streaming_query(spark, catalog, q, schema, str(bridge))
    assert sdf.isStreaming
    assert sdf.columns == ["block", "v"]
    sq = (
        sdf.writeStream.format("memory")
        .queryName("rt_dsl_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt_dsl"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(60)
    rows = spark.sql("SELECT block, v FROM rt_dsl_tail").collect()
    # row 0 filtered out (amount0In == 0); v = amount0In * 2
    assert sorted((int(r.block), int(r.v)) for r in rows) == [
        (10_000_000 + i, 2 * i) for i in range(1, 8)
    ]


def test_compile_streaming_query_rejects_batch_only_blocks(spark, tmp_path, catalog):
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import PipelineError, compile_streaming_query

    schema = parse_schema(
        """
query rt_bad {
  chain = "arbitrum"
  contract {
    address = "0x905dfcd5649217c42684f23958568e533c711aa3"
    abi = "unipair.abi.json"
    event Swap {}
  }
  limit = 5
}
""",
        confdir="/root/reference/test",
    )
    q = schema.queries[0]
    with pytest.raises(PipelineError, match="batch-only"):
        compile_streaming_query(spark, catalog, q, schema, str(tmp_path))


def test_blockdater_table_lookup(spark, catalog):
    from apollo_spark.blockdater import blocks_table_lookup, resolve_query_range

    blocks = catalog.table("blocks")
    # arbitrum fixtures: block 10_000_000 at ts 1_650_000_000, 1s spacing
    assert blocks_table_lookup(blocks.filter("chain='arbitrum'"), "arbitrum", 1_650_000_100) == 10_000_100
    sb, eb, bi = resolve_query_range(
        start_time=1_650_000_100,
        end_time=1_650_000_200,
        time_interval=10,
        blocks=blocks,
        chain="arbitrum",
    )
    assert (sb, eb, bi) == (10_000_100, 10_000_200, 10)


def test_blockdater_interpolation():
    from apollo_spark.blockdater import BlockDater

    class FakeHeaders:
        """13s chain starting at ts 1_600_000_000, 1M blocks."""

        calls = 0

        def header(self, chain, block):
            FakeHeaders.calls += 1
            if block is None:
                block = 1_000_000
            return block, 1_600_000_000 + block * 13

    dater = BlockDater(FakeHeaders(), "ethereum")
    target_ts = 1_600_000_000 + 500_000 * 13
    got = dater.block_by_timestamp(target_ts)
    assert abs(got - 500_000) * 13 <= dater.tolerance_s
    # interpolation on a linear chain converges in O(1) probes, not O(log n)
    assert FakeHeaders.calls <= 6
    assert dater.seconds_to_block_interval(130) == 10


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key state must survive across micro-batches
    (restart from checkpoint), accumulating counts/totals."""
    import json

    from apollo_spark.sources.streaming import stateful_running_totals

    src = tmp_path / "events_stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_state")
    out_dir = str(tmp_path / "totals_out")

    def write_batch(fname, rows):
        (src / fname).write_text("\n".join(json.dumps(r) for r in rows))

    def run_once():
        stream = (
            spark.readStream.schema("user string, value double").json(str(src))
        )
        totals = stateful_running_totals(stream, key_col="user", value_col="value")
        q = (
            totals.writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("b1.json", [{"user": "a", "value": 1.0}, {"user": "a", "value": 2.0}, {"user": "b", "value": 5.0}])
    run_once()
    first = {r.key: (r.n, r.total) for r in spark.read.parquet(out_dir).collect()}
    assert first["a"] == (2, 3.0) and first["b"] == (1, 5.0)

    write_batch("b2.json", [{"user": "a", "value": 4.0}])
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:
        if r.key not in latest or r.n > latest[r.key][0]:
            latest[r.key] = (r.n, r.total)
    # state restored from checkpoint: 'a' continues from (2, 3.0)
    assert latest["a"] == (3, 7.0)
    assert latest["b"] == (1, 5.0)


from apollo_spark.testing import FakeLogNode as _DenseFakeLogNode


def _mklog(block, i):
    return {
        "chain": "ethereum",
        "block_number": block,
        "block_hash": f"0x{block:064x}",
        "tx_hash": f"0x{block * 1000 + i:064x}",
        "tx_index": i,
        "log_index": i,
        "address": "0x" + "ab" * 20,
        "topics": ["0x" + "11" * 32],
        "data": b"\x00" * 32,
    }


def test_rpc_log_source_bisects_only_failing_ranges(spark):
    from apollo_spark.sources.rpc_logs import RpcMetrics, rpc_log_source

    logs_by_block = {b: [_mklog(b, i) for i in range(3)] for b in range(100, 164)}
    metrics = RpcMetrics(spark)
    df = rpc_log_source(
        spark,
        lambda: _DenseFakeLogNode(logs_by_block, cap=8),
        chain="ethereum",
        from_block=100,
        to_block=163,
        parts=2,  # 2 partitions x 32 blocks, each must bisect down to <=8
        metrics=metrics,
    )
    out = df.toPandas()
    assert len(out) == 64 * 3  # every log exactly once despite splits
    # per partition: 1 call @32 (fail) + 2 @16 (fail) + 4 @8 (ok) = 7 calls, 3 splits
    assert metrics.report() == {"rpc_requests": 14, "range_splits": 6}
    assert sorted(out["block_number"].unique()) == list(range(100, 164))

    # driver-side replay of one partition's walk: bisection touches only the
    # failing subranges (apollo restarts the whole scan instead)
    node = _DenseFakeLogNode(logs_by_block, cap=8)
    stack = [(100, 131)]
    while stack:
        a, b = stack.pop()
        try:
            node.get_logs("ethereum", None, None, a, b)
        except Exception:
            mid = (a + b) // 2
            stack.extend([(mid + 1, b), (a, mid)])
    fetched = [c for c in node.calls if c[1] - c[0] + 1 <= 8]
    assert sorted(fetched) == [(100 + 8 * i, 107 + 8 * i) for i in range(4)]


def test_rpc_log_source_composes_with_decoder(spark, unipair):
    from apollo_spark.sources.logs import decoded_event_source
    from apollo_spark.sources.rpc_logs import rpc_log_source

    swap = unipair.events["Swap"]

    def swap_log(b):
        log = _mklog(b, 0)
        log["topics"] = [swap.topic0, "0x" + "11" * 32, "0x" + "22" * 32]
        log["data"] = abi_encode(["uint256"] * 4, [b, 0, 2 * b, 0])
        return log

    logs_by_block = {b: [swap_log(b)] for b in range(10, 20)}
    raw = rpc_log_source(
        spark,
        lambda: _DenseFakeLogNode(logs_by_block, cap=100),
        chain="ethereum",
        from_block=10,
        to_block=19,
        parts=2,
    )
    decoded = decoded_event_source(raw, swap, chain="ethereum", address=None)
    pdf = decoded.toPandas().sort_values("block_number")
    assert len(pdf) == 10
    assert [int(x) for x in pdf["amount0In"]] == list(range(10, 20))


def test_dedup_event_stream_drops_bridge_replays(spark, tmp_path, unipair):
    """A reconnecting bridge re-emits overlapping logs; the watermarked dedup
    must deliver each (tx_hash, log_index) exactly once — while KEEPING
    legitimate repeated events inside one transaction (same tx_hash/tx_index,
    distinct log_index: e.g. two Transfers emitted by one swap)."""
    import json

    from apollo_spark.sources.streaming import dedup_event_stream, event_stream

    bridge = tmp_path / "bridge_dup"
    _write_bridge_files(bridge, unipair, n=10)
    # two same-shape Swap events in ONE transaction: identical tx identity,
    # different log_index — a real multi-event tx, not a replay
    ev = unipair.events["Swap"]
    multi = [
        {
            "chain": "arbitrum",
            "block_number": 10_000_050,
            "block_hash": "0x" + "50" * 32,
            "tx_hash": "0x" + "aa" * 32,
            "tx_index": 3,
            "log_index": li,
            "address": "0x905dfcd5649217c42684f23958568e533c711aa3",
            "topics": [ev.topic0, "0x" + "11" * 32, "0x" + "22" * 32],
            "data_hex": "0x" + abi_encode(["uint256"] * 4, [100 + li, 0, 0, 0]).hex(),
        }
        for li in (0, 1)
    ]
    (bridge / "multi.jsonl").write_text("\n".join(json.dumps(r) for r in multi))
    # replay: everything again in a second file (overlap after reconnect)
    first = (bridge / "batch0.jsonl").read_text()
    (bridge / "batch1.jsonl").write_text(first + "\n" + "\n".join(json.dumps(r) for r in multi))
    # reorg re-inclusion: same (tx_hash, log_index) lands in a NEW block —
    # a distinct delivery that dedup must KEEP, not drop as a replay
    reorged = dict(multi[0], block_number=10_000_051, block_hash="0x" + "51" * 32)
    (bridge / "batch2.jsonl").write_text(json.dumps(reorged))

    stream = event_stream(spark, str(bridge), unipair.events["Swap"], chain="arbitrum")
    deduped = dedup_event_stream(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT tx_hash, tx_index, log_index, block_hash FROM dedup_rt").collect()
    # 10 single-log txs + 2 logs of the multi-event tx + 1 reorg
    # re-inclusion (new block_hash), each exactly once
    assert len(out) == 13
    assert len({(r.tx_hash, r.log_index, r.block_hash) for r in out}) == 13
    multi_rows = [r for r in out if r.tx_hash == "0x" + "aa" * 32]
    assert sorted(r.log_index for r in multi_rows) == [0, 0, 1]
    assert {r.block_hash for r in multi_rows if r.log_index == 0} == {
        "0x" + "50" * 32,
        "0x" + "51" * 32,
    }


def test_event_triggered_calls_streaming(spark, tmp_path, unipair):
    """Realtime S7: each decoded event row triggers the contract's method
    calls pinned at the event's block; merged columns land in the stream."""
    from apollo_spark.dsl.schema import ContractSpec, MethodSpec
    from apollo_spark.sources.streaming import event_stream, event_triggered_calls

    class FakeClient:
        def call(self, chain, to, data, block):
            # state AT the event's block: must receive the row's block_number
            assert block is not None
            return abi_encode(["uint112", "uint112", "uint32"], [block * 3, block * 5, 1])

    contract = ContractSpec(
        address="0x905dfcd5649217c42684f23958568e533c711aa3",
        abi_name="unipair.abi.json",
        methods=[MethodSpec(name="getReserves", outputs=["_reserve0", "_reserve1"])],
        abi=unipair,
    )
    bridge = tmp_path / "bridge_s7"
    _write_bridge_files(bridge, unipair, n=8)
    stream = event_stream(
        spark, str(bridge), unipair.events["Swap"],
        chain="arbitrum", address=contract.address, outputs=["amount0In"],
    )
    enriched = event_triggered_calls(
        stream, contract, chain="arbitrum", client_factory=lambda: FakeClient()
    )
    assert enriched.isStreaming
    q = (
        enriched.writeStream.format("memory")
        .queryName("s7_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt_s7"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT block_number, _reserve0, _reserve1 FROM s7_rt").collect()
    assert len(out) == 8
    for r in out:
        assert int(r._reserve0) == r.block_number * 3
        assert int(r._reserve1) == r.block_number * 5


def test_event_triggered_calls_drops_failed_rows(spark, tmp_path, unipair):
    """A reverting call drops the row (main.go:174-177), never poisons the
    batch."""
    from apollo_spark.dsl.schema import ContractSpec, MethodSpec
    from apollo_spark.sources.streaming import event_triggered_calls

    class FlakyClient:
        def call(self, chain, to, data, block):
            if block % 2 == 0:
                raise RuntimeError("execution reverted")
            return abi_encode(["uint112", "uint112", "uint32"], [1, 2, 3])

    contract = ContractSpec(
        address="0x905dfcd5649217c42684f23958568e533c711aa3",
        abi_name="unipair.abi.json",
        methods=[MethodSpec(name="getReserves", outputs=["_reserve0"])],
        abi=unipair,
    )
    # batch-frame mode: same operator, backfill path
    events = spark.createDataFrame(
        [(b, f"0x{b:x}") for b in range(100, 110)], "block_number long, tx_hash string"
    )
    out = event_triggered_calls(
        events, contract, chain="arbitrum", client_factory=lambda: FlakyClient()
    ).collect()
    assert sorted(r.block_number for r in out) == [101, 103, 105, 107, 109]


def test_stream_interval_join_windows_and_watermark(spark, tmp_path):
    """Watermarked stream-stream interval join: each left event matches only
    same-key right events from its lookback window."""
    import json

    from apollo_spark.sources.streaming import stream_interval_join

    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ldir.mkdir(), rdir.mkdir()
    base = 1_700_000_000
    (ldir / "l.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "timestamp": base + 1000, "order": "A"},
                {"user_id": 1, "timestamp": base + 5000, "order": "B"},
                {"user_id": 2, "timestamp": base + 1000, "order": "C"},
            ]
        )
    )
    (rdir / "r.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "timestamp": base + 400, "click": "x"},   # in A+B? A: within 3600 of +1000 yes; B(+5000): 5000-400=4600 > 3600 no
                {"user_id": 1, "timestamp": base + 4500, "click": "y"},  # after A -> only B
                {"user_id": 2, "timestamp": base + 900, "click": "z"},   # C only
                {"user_id": 2, "timestamp": base + 2000, "click": "w"},  # after C -> nothing
            ]
        )
    )
    left = spark.readStream.schema("user_id long, timestamp long, order string").json(str(ldir))
    right = spark.readStream.schema("user_id long, timestamp long, click string").json(str(rdir))
    joined = stream_interval_join(
        left, right, on="user_id", lookback_seconds=3600, watermark_seconds=60
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.order, r.r_click) for r in spark.sql("SELECT order, r_click FROM ssj").collect()}
    assert got == {("A", "x"), ("B", "y"), ("C", "z")}


def test_session_window_stats_closes_on_gap(spark, tmp_path):
    """Event-time session windows: events within the gap merge into one
    session; a quiet period splits sessions; watermark advance emits the
    closed ones."""
    import json

    from apollo_spark.sources.streaming import session_window_stats

    src = tmp_path / "sess_src"
    src.mkdir()
    base = 1_700_000_000
    rows = [
        {"user_id": 1, "timestamp": base + 0, "value": 1.0},
        {"user_id": 1, "timestamp": base + 100, "value": 2.0},    # same session (gap 300)
        {"user_id": 1, "timestamp": base + 1000, "value": 4.0},   # 900s quiet -> new session
        {"user_id": 2, "timestamp": base + 50, "value": 8.0},
        # watermark pusher: far-future event advances event time so all
        # earlier sessions close and land in the append-mode sink
        {"user_id": 99, "timestamp": base + 100_000, "value": 0.0},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("user_id long, timestamp long, value double").json(str(src))
    sessions = session_window_stats(
        stream, key_col="user_id", gap_seconds=300, watermark_seconds=60, value_col="value"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_rt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {
        (r.user_id, int(r.session_start.timestamp())): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_rt").collect()
        if r.user_id != 99
    }
    assert out == {
        (1, base + 0): (2, 3.0),     # two events merged, 300s gap honored
        (1, base + 1000): (1, 4.0),  # quiet period split
        (2, base + 50): (1, 8.0),
    }


def test_stream_restart_recovers_without_dup_or_loss(spark, tmp_path, unipair):
    """Restart-from-checkpoint e2e: run 1 sinks the first bridge batch; the
    'process' then dies (new SinkWriter + new query object, same checkpoint
    dir); run 2 sees a second bridge file containing replays + new rows.
    The file source must not re-read batch0, and the dedup state store must
    survive the restart so the cross-restart replays are dropped — parquet
    ends with every distinct log exactly once."""
    import json

    from apollo_spark.sinks import SinkConfig, SinkWriter
    from apollo_spark.sources.streaming import dedup_event_stream, event_stream

    bridge = tmp_path / "bridge_restart"
    _write_bridge_files(bridge, unipair, n=10)  # batch0.jsonl: rows 0..9
    ckpt = str(tmp_path / "ckpt_restart")
    pq_dir = tmp_path / "pq_restart"

    def run_once(qname: str) -> None:
        stream = event_stream(spark, str(bridge), unipair.events["Swap"], chain="arbitrum")
        writer = SinkWriter(SinkConfig(parquet_dir=str(pq_dir)))  # fresh writer = restarted process
        q = (
            dedup_event_stream(stream)
            .writeStream.foreachBatch(writer.foreach_batch("rt"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once("run1")
    out1 = spark.read.parquet(str(pq_dir / "rt"))
    assert out1.count() == 10

    # second bridge file: 3 replays of run-1 logs + 2 genuinely new logs
    ev = unipair.events["Swap"]
    first = (bridge / "batch0.jsonl").read_text().splitlines()
    new_rows = []
    for i in (100, 101):
        new_rows.append(
            {
                "chain": "arbitrum",
                "block_number": 10_000_000 + i,
                "block_hash": "0x" + f"{i:064x}",
                "tx_hash": "0x" + f"{i + 7:064x}",
                "tx_index": 0,
                "log_index": 0,
                "address": "0x905dfcd5649217c42684f23958568e533c711aa3",
                "topics": [ev.topic0, "0x" + "11" * 32, "0x" + "22" * 32],
                "data_hex": (bridge / "batch0.jsonl").read_text().splitlines()[0].split('"data_hex": "')[-1].rstrip('"}'),
            }
        )
    (bridge / "batch1.jsonl").write_text(
        "\n".join(first[:3] + [json.dumps(r) for r in new_rows])
    )
    run_once("run2")

    out2 = spark.read.parquet(str(pq_dir / "rt"))
    rows = out2.select("tx_hash", "log_index", "block_hash").collect()
    assert len(rows) == 12  # 10 originals + 2 new; 3 replays dropped across the restart
    assert len({(r.tx_hash, r.log_index, r.block_hash) for r in rows}) == 12


def test_streaming_hll_rollup_matches_batch_sketch(spark, tmp_path):
    """The continuously-merged register table after N micro-batches must be
    bit-identical to a one-shot batch sketch over the union of all data —
    the mergeability contract, now across the streaming boundary."""
    import json

    from apollo_spark.ops.sketch import hll_estimate, hll_registers, hll_summary
    from apollo_spark.sources.streaming import streaming_hll_rollup
    from apollo_spark.table_format import TxTable

    src = tmp_path / "hll_stream"
    src.mkdir()
    state = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "hll_ckpt")

    def run_once():
        stream = spark.readStream.schema("etype string, uid long").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                streaming_hll_rollup(state, "uid", ["etype"], p=6)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows1 = [{"etype": "a", "uid": i} for i in range(200)] + [
        {"etype": "b", "uid": i} for i in range(50)
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    run_once()
    rows2 = [{"etype": "a", "uid": i} for i in range(100, 400)]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    run_once()

    merged = TxTable(state).read(spark)
    whole = spark.createDataFrame(
        [(r["etype"], r["uid"]) for r in rows1 + rows2], "etype string, uid long"
    )
    want = hll_registers(whole, "uid", ["etype"], p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, want.collect()))

    # the estimate derived from streamed state tracks the true cardinality
    est = {
        r.etype: r.estimate
        for r in hll_estimate(hll_summary(merged, ["etype"], p=6), p=6).collect()
    }
    assert abs(est["a"] - 400) / 400 < 0.35  # p=6 -> ~13% expected error
    assert abs(est["b"] - 50) / 50 < 0.45


def test_streaming_cdc_novelty_across_microbatches(spark, tmp_path):
    """incremental_cdc_novelty across the real streaming boundary: a file
    stream feeds foreachBatch, the chunk-hash index accumulates per
    micro-batch, and the second batch's re-crawl of a first-batch document
    reports ZERO novelty while a genuinely new document reports 1.0. Both
    the index and the report table carry the (app, batch) txn guard."""
    import json

    from apollo_spark.ops.dedup import incremental_cdc_novelty
    from apollo_spark.table_format import TxTable

    src = tmp_path / "docs_stream"
    src.mkdir()
    idx = str(tmp_path / "cdc_idx")
    rep = str(tmp_path / "cdc_reports")
    ckpt = str(tmp_path / "cdc_ckpt")

    def sink(df, batch_id):
        # commit_report: the report table commits BEFORE the index moves, so
        # a crash between the two replays to an identical (skipped) report —
        # never a permanent zero-novelty record (round-5 ADVICE ordering)
        incremental_cdc_novelty(
            idx,
            df,
            txn_app="cdcnov",
            txn_batch=int(batch_id),
            commit_report=lambda out: TxTable(rep).write(
                out, mode="append", txn_app="cdcnov", txn_batch=int(batch_id)
            ),
        )

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # non-periodic token streams: a modular sequence like tok[(29*i)%70]
    # cycles every 70 words, creating real intra-doc duplicate chunks that
    # legitimately score non-novel (the op counts first occurrences only)
    import numpy.random as npr

    rng = npr.default_rng(23)
    base = " ".join(f"tok{k}" for k in rng.integers(0, 70, size=240))
    fresh = " ".join(f"neo{k}" for k in rng.integers(0, 70, size=240))
    (src / "b1.json").write_text(json.dumps({"doc_id": 1, "text": base}))
    run_once()
    (src / "b2.json").write_text(
        json.dumps({"doc_id": 2, "text": base}) + "\n" + json.dumps({"doc_id": 3, "text": fresh})
    )
    run_once()

    reports = {r.id: r for r in TxTable(rep).read(spark).collect()}
    assert reports[1].novel_frac == 1.0  # first-ever content
    assert reports[2].novel_frac == 0.0  # re-crawl across the stream boundary
    assert reports[3].novel_frac == 1.0  # new content in batch 2


def test_streaming_frontier_dedup_exact_key_across_batches(spark, tmp_path):
    """The crawl frontier: canonical-URL exact dedup across micro-batches —
    raw variants of one page (case, :80, utm params, fragments) collapse to
    one frontier row; a later batch re-submitting the same page adds
    nothing; a genuinely new page passes; junk rows drop; replay with no
    new files is a version no-op."""
    import json

    from apollo_spark.sources.streaming import streaming_frontier_dedup
    from apollo_spark.table_format import TxTable

    src = tmp_path / "urls_stream"
    src.mkdir()
    idx = str(tmp_path / "frontier_idx")
    out = str(tmp_path / "frontier_out")
    ckpt = str(tmp_path / "frontier_ckpt")

    def run_once():
        stream = spark.readStream.schema("crawl_id long, url string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(streaming_frontier_dedup(idx, out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [
        {"crawl_id": 1, "url": "http://www.ex.com/a"},
        {"crawl_id": 2, "url": "HTTP://WWW.EX.COM:80/a?utm_source=x"},  # same page
        {"crawl_id": 3, "url": "http://www.ex.com/b"},
        {"crawl_id": 4, "url": "junk not a url"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    run_once()
    rows1 = {r.crawl_id for r in TxTable(out).read(spark).collect()}
    assert rows1 == {1, 3}  # min crawl_id survives per canonical key; junk dropped

    b2 = [
        {"crawl_id": 5, "url": "http://www.ex.com/a#frag"},  # re-submit across batches
        {"crawl_id": 6, "url": "https://www.ex.com/a"},      # different scheme: NEW
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
    run_once()
    rows2 = {r.crawl_id for r in TxTable(out).read(spark).collect()}
    assert rows2 == {1, 3, 6}

    versions = [TxTable(p).current_version() for p in (idx, out)]
    run_once()  # no new files
    assert [TxTable(p).current_version() for p in (idx, out)] == versions


def test_streaming_cdc_retention_keeps_fresh_drops_recrawls(spark, tmp_path):
    """The continuous-ingest keep/drop gate in one call (round-5 verdict
    item 7): a file stream feeds streaming_cdc_retention; across real
    micro-batches fresh documents land in the survivors table, an exact
    re-crawl and a lightly-edited re-crawl are dropped (novelty below the
    0.5 gate), and a replay run with NO new files leaves every table — index,
    survivors, report — at the same version (txn no-op)."""
    import json

    import numpy.random as npr

    from apollo_spark.sources.streaming import streaming_cdc_retention
    from apollo_spark.table_format import TxTable

    src = tmp_path / "ret_stream"
    src.mkdir()
    idx = str(tmp_path / "ret_idx")
    kept = str(tmp_path / "ret_kept")
    rep = str(tmp_path / "ret_reports")
    ckpt = str(tmp_path / "ret_ckpt")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                streaming_cdc_retention(idx, kept, report_dir=rep, app_id="ret")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rng = npr.default_rng(31)
    base = " ".join(f"tok{k}" for k in rng.integers(0, 70, size=240))
    words = base.split(" ")
    edited = " ".join(words[:120] + ["tiny", "edit"] + words[120:])  # ~1 chunk new
    fresh = " ".join(f"neo{k}" for k in rng.integers(0, 70, size=240))

    (src / "b1.json").write_text(json.dumps({"doc_id": 1, "text": base}))
    run_once()
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 2, "text": base},    # exact re-crawl -> dropped
                {"doc_id": 3, "text": edited},  # edited re-crawl -> below gate -> dropped
                {"doc_id": 4, "text": fresh},   # genuinely new -> kept
            ]
        )
    )
    run_once()

    kept_ids = sorted(r.doc_id for r in TxTable(kept).read(spark).collect())
    assert kept_ids == [1, 4]
    reports = {r.id: r for r in TxTable(rep).read(spark).collect()}
    assert reports[2].novel_frac == 0.0
    assert 0.0 < reports[3].novel_frac < 0.5
    assert reports[4].novel_frac == 1.0

    # replay: no new files -> every table stays at its version
    versions = [TxTable(p).current_version() for p in (idx, kept, rep)]
    run_once()
    assert [TxTable(p).current_version() for p in (idx, kept, rep)] == versions


def test_dsl_streaming_push_fanout_e2e(spark, tmp_path, catalog, unipair):
    """The full apollo realtime analog (output/output.go:82-124 + the
    ROADMAP's WS/SSE latency path) from the DSL surface: a schema.hcl query
    compiles to a stream whose foreachBatch fan-out feeds BOTH an
    exactly-once TxTable sink and a live WebSocket client, across two real
    micro-batches — then the push overflow guard fires through the same
    streaming path on an oversized batch (round-5 verdict item 6)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_streaming_query
    from apollo_spark.sinks import SinkConfig, SinkWriter
    from apollo_spark.sinks_push import TopicHub, WsPushServer
    from apollo_spark.sources.ws_bridge import WsConnection
    from apollo_spark.table_format import TxTable

    schema = parse_schema(
        """
query rt_push {
  chain = "arbitrum"
  contract {
    address = "0x905dfcd5649217c42684f23958568e533c711aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount0In"]
    }
    transform {
      doubled = amount0In * 2
    }
  }
  filter = [ amount0In != 0 ]
  save {
    block = blocknumber
    v = doubled
  }
}
""",
        confdir="/root/reference/test",
    )
    q = schema.queries[0]
    bridge = tmp_path / "bridge_push"
    ckpt = str(tmp_path / "ckpt_push")
    hub = TopicHub()
    srv = WsPushServer(hub)
    try:
        ws = WsConnection(f"ws://127.0.0.1:{srv.port}/rt_push", timeout_s=15)
        deadline = time.time() + 10
        while hub.n_subscribers("rt_push") < 1 and time.time() < deadline:
            time.sleep(0.05)
        assert hub.n_subscribers("rt_push") == 1
        writer = SinkWriter(SinkConfig(tx_table_dir=str(tmp_path / "tx"), push_hub=hub))

        def run_once():
            sdf = compile_streaming_query(spark, catalog, q, schema, str(bridge))
            sq = (
                sdf.writeStream.foreachBatch(writer.foreach_batch("rt_push"))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            sq.awaitTermination(120)

        # micro-batch 1: events 0..3 (amount0In == 0 filtered -> 3 rows)
        _write_bridge_files(bridge, unipair, n=4)
        run_once()
        # micro-batch 2: NEW events 4..6 in a second bridge file (3 rows)
        _write_bridge_files(bridge, unipair, n=3, start=4, fname="batch1.jsonl")
        run_once()

        # the bulk sink saw every row exactly once...
        tx_rows = {
            (int(r.block), int(r.v))
            for r in TxTable(str(tmp_path / "tx" / "rt_push")).read(spark).collect()
        }
        expect = {(10_000_000 + i, 2 * i) for i in range(1, 7)}
        assert tx_rows == expect
        # ...and the SAME rows arrived at the live WS client as JSON
        got = set()
        deadline = time.time() + 30
        while len(got) < 6 and time.time() < deadline:
            try:
                m = json.loads(ws.recv_text())
                got.add((int(m["block"]), int(m["v"])))
            except Exception:
                time.sleep(0.1)
        assert got == expect
        ws.close()

        # overflow guard THROUGH the streaming path: a fresh stream with a
        # tiny push cap dies on an oversized micro-batch, naming the bulk
        # sinks as the right path for it
        capped = SinkWriter(
            SinkConfig(tx_table_dir=str(tmp_path / "tx2"), push_hub=hub, push_max_rows=3)
        )
        _write_bridge_files(bridge, unipair, n=10, start=100, fname="batch_big.jsonl")
        sdf = compile_streaming_query(spark, catalog, q, schema, str(bridge))
        sq = (
            sdf.writeStream.foreachBatch(capped.foreach_batch("rt_push"))
            .option("checkpointLocation", str(tmp_path / "ckpt_push2"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="latency path"):
            sq.awaitTermination(120)
    finally:
        srv.close()


def test_compile_streaming_query_rejects_window_block(spark, tmp_path, catalog):
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import PipelineError, compile_streaming_query

    schema = parse_schema(
        """
query rt_win {
  chain = "arbitrum"
  contract {
    address = "0x905dfcd5649217c42684f23958568e533c711aa3"
    abi = "unipair.abi.json"
    event Swap {}
  }
  window {
    order_by = [block_number]
    rn = row_number()
  }
}
""",
        confdir="/root/reference/test",
    )
    with pytest.raises(PipelineError, match="batch-only"):
        compile_streaming_query(spark, catalog, schema.queries[0], schema, str(tmp_path))


def test_streaming_cms_rollup_matches_batch_sketch_and_replay_safe(spark, tmp_path):
    """Add-merged CMS state after N micro-batches == one-shot batch sketch
    over the union (mergeability across the streaming boundary), and a
    re-run with NO new files leaves the state untouched (manifest
    exactly-once — critical for CMS, whose merge is NOT idempotent)."""
    import json

    from apollo_spark.ops.sketch import cms_counts, cms_estimate
    from apollo_spark.sources.streaming import streaming_cms_rollup
    from apollo_spark.table_format import TxTable

    src = tmp_path / "cms_stream"
    src.mkdir()
    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "cms_ckpt")

    def run_once():
        stream = spark.readStream.schema("tok string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                streaming_cms_rollup(state, "tok", depth=4, width=64)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows1 = [{"tok": "hot"}] * 50 + [{"tok": f"t{i}"} for i in range(30)]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    run_once()
    rows2 = [{"tok": "hot"}] * 70 + [{"tok": "warm"}] * 20
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    run_once()

    merged = TxTable(state).read(spark)
    whole = spark.createDataFrame([(r["tok"],) for r in rows1 + rows2], "tok string")
    want = cms_counts(whole, "tok", depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, want.collect()))

    v_before = TxTable(state).current_version()
    run_once()  # no new files -> empty batch run; state must not double-count
    est = cms_estimate(
        TxTable(state).read(spark),
        spark.createDataFrame([("hot",), ("warm",)], "tok string"),
        "tok",
        depth=4,
        width=64,
    )
    got = {r.tok: r.cms_count for r in est.collect()}
    assert got["hot"] == 120 and got["warm"] == 20  # CMS >= truth; equality at this width
    assert TxTable(state).current_version() in (v_before, v_before + 1)


def test_streaming_corpus_dedup_filters_across_batches(spark, tmp_path):
    """Near-dups must be dropped across micro-batch boundaries (vs the
    persistent index), exact dups within a batch collapse to the min id,
    and a checkpoint-replayed batch must not double-ingest."""
    import json as _json

    from apollo_spark.sources.streaming import streaming_corpus_dedup
    from apollo_spark.table_format import TxTable

    src = tmp_path / "docs_stream"
    src.mkdir()
    out = str(tmp_path / "docs_clean")
    idx = str(tmp_path / "docs_index")
    ckpt = str(tmp_path / "docs_ckpt")

    base = "the quick brown fox jumps over the lazy dog and runs far into the green forest tonight"
    other = "completely different text about spark execution plans and shuffle partitioning strategies overall"

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                streaming_corpus_dedup(idx, out, threshold=0.5)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    (src / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": other}])
    )
    run_once()
    assert {r.doc_id for r in TxTable(out).read(spark).collect()} == {1, 2}

    # batch 2: near-dup of 1 (cross-batch), fresh doc, and an intra-batch dup pair
    fresh = "entirely new material discussing columnar storage formats and vectorized execution engines today"
    (src / "b2.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 10, "text": base + " extra"},
                {"doc_id": 11, "text": fresh},
                {"doc_id": 12, "text": fresh + " appended"},
            ]
        )
    )
    run_once()
    kept = {r.doc_id for r in TxTable(out).read(spark).collect()}
    assert kept == {1, 2, 11}, kept  # 10 matches history, 12 matches smaller-id batchmate

    # replay with a fresh checkpoint: same batch ids re-run, nothing changes
    import shutil

    shutil.rmtree(ckpt)
    run_once()
    assert {r.doc_id for r in TxTable(out).read(spark).collect()} == {1, 2, 11}


def test_streaming_psi_monitor_drift_across_batches(spark, tmp_path):
    """PSI monitoring in the stream: batch 1 establishes the reference and
    reports psi exactly 0.0; batch 2 with a heavily shifted category mix
    reports psi above the 0.25 'investigate' line and counts its unseen
    category as a skipped bin; batch 3 replaying the reference mix reports
    psi exactly 0.0 again; a no-new-files replay adds no report rows."""
    import json

    from apollo_spark.sources.streaming import streaming_psi_monitor
    from apollo_spark.table_format import TxTable

    src = tmp_path / "ev_stream"
    src.mkdir()
    ref = str(tmp_path / "psi_ref")
    rep = str(tmp_path / "psi_rep")
    ckpt = str(tmp_path / "psi_ckpt")

    def run_once():
        stream = spark.readStream.schema("event_id long, event_type string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(streaming_psi_monitor(ref, rep))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def rows(n, et, start):
        return [{"event_id": start + i, "event_type": et} for i in range(n)]

    # batch 1: balanced 50/50 click/view — becomes the reference
    b1 = rows(50, "click", 0) + rows(50, "view", 100)
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    run_once()
    got = {r.batch_id: r for r in TxTable(rep).read(spark).collect()}
    assert got[0].psi == 0.0 and got[0].n_bins == 2 and got[0].n_bins_skipped == 0
    assert got[0].n_rows == 100

    # batch 2: 95/5 skew + a category the reference never saw
    b2 = rows(95, "click", 200) + rows(4, "view", 300) + rows(1, "error", 400)
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
    run_once()
    got = {r.batch_id: r for r in TxTable(rep).read(spark).collect()}
    assert got[1].psi > 0.25, got[1].psi  # the 'investigate' line
    assert got[1].n_bins == 2 and got[1].n_bins_skipped == 1  # 'error' skipped

    # batch 3: exactly the reference mix again -> PSI returns to 0.0
    b3 = rows(10, "click", 500) + rows(10, "view", 600)
    (src / "b3.json").write_text("\n".join(json.dumps(r) for r in b3))
    run_once()
    got = {r.batch_id: r for r in TxTable(rep).read(spark).collect()}
    assert got[2].psi == 0.0 and got[2].n_bins == 2

    # replay with no new files: no new report rows, reference unmoved
    n_before = TxTable(rep).read(spark).count()
    v_ref = TxTable(ref).current_version()
    run_once()
    assert TxTable(rep).read(spark).count() == n_before
    assert TxTable(ref).current_version() == v_ref


def test_streaming_decontamination_gate_drops_leaks_across_batches(spark, tmp_path):
    """Eval-set decontamination at ingest: across real micro-batches, docs
    sharing a 5-gram with any benchmark item are quarantined to the report
    table (with their batch id) while clean docs land in the output; the
    benchmark is static so no state grows; a replay run with no new files
    is a version no-op on both tables."""
    import json

    from apollo_spark.sources.streaming import streaming_decontamination_gate
    from apollo_spark.table_format import TxTable

    leak = "what is the capital of france answer paris"
    bench = spark.createDataFrame([(1, leak)], "bench_id long, text string")
    src = tmp_path / "docs_stream"
    src.mkdir()
    out = str(tmp_path / "clean_out")
    rep = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "decon_ckpt")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                streaming_decontamination_gate(bench, out, report_dir=rep)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [
        {"doc_id": 1, "text": f"prefix words {leak} suffix words"},  # verbatim leak
        {"doc_id": 2, "text": "a clean document about rivers and dams entirely"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    run_once()
    assert {r.doc_id for r in TxTable(out).read(spark).collect()} == {2}
    q1 = TxTable(rep).read(spark).collect()
    assert {(r.doc_id, r.batch) for r in q1} == {(1, 0)}
    assert q1[0].n_shared >= 1

    b2 = [
        {"doc_id": 3, "text": f"another contaminated doc {leak} reworded tail"},
        {"doc_id": 4, "text": "second clean doc on spark shuffles and joins"},
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
    run_once()
    assert {r.doc_id for r in TxTable(out).read(spark).collect()} == {2, 4}
    assert {r.doc_id for r in TxTable(rep).read(spark).collect()} == {1, 3}

    versions = [TxTable(p).current_version() for p in (out, rep)]
    run_once()  # replay: no new files -> txn no-op
    assert [TxTable(p).current_version() for p in (out, rep)] == versions


def test_streaming_blocking_drift_monitor(spark, tmp_path):
    """Blocking-geometry drift watchdog (round 10): uniform batches stay
    quiet; a planted-boilerplate batch raises rec_scrub on both the batch
    and cumulative channels and flips the drift flag against the pinned
    uniform geometry; a checkpoint-restart replay of the same batch is a
    no-op on stats AND report (txn guard)."""
    from apollo_spark.sources.streaming import streaming_blocking_drift_monitor
    from apollo_spark.table_format import TxTable

    stats, rep = str(tmp_path / "stats"), str(tmp_path / "rep")
    sink = streaming_blocking_drift_monitor(
        stats, rep, frac_floor=0, batch_frac_floor=0, pinned_scrub=False
    )
    # batch 0: uniform docs (every shingle df=1) -> hot share exactly 0.0
    b0 = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}") for i in range(40)],
        "doc_id long, text string",
    )
    sink(b0, 0)
    # batch 1: a structural line shared by every doc -> boilerplate skew
    BO = "click here to subscribe now and never miss another update"
    b1 = spark.createDataFrame(
        [(100 + i, f"{BO} u{i} v{i}") for i in range(40)], "doc_id long, text string"
    )
    sink(b1, 1)
    rows = {r["batch_id"]: r for r in TxTable(rep).read(spark).collect()}
    assert rows[0]["hot_share_batch"] == 0.0 and rows[0]["hot_share_total"] == 0.0
    assert rows[0]["drift"] is False
    assert rows[1]["rec_scrub_batch"] is True  # the early-warning channel
    assert rows[1]["rec_scrub_total"] is True
    assert rows[1]["drift"] is True
    assert rows[1]["n_docs_total"] == 80
    # replay: same (app, batch) -> stats and report unchanged
    v_vocab = TxTable(f"{stats}/vocab").current_version()
    v_docs = TxTable(f"{stats}/docs").current_version()
    sink(b1, 1)
    assert TxTable(f"{stats}/vocab").current_version() == v_vocab
    assert TxTable(f"{stats}/docs").current_version() == v_docs
    assert TxTable(rep).read(spark).count() == 2
