"""Unverified events (raw undecoded log surface) + cross-chain address
monitoring — the last two reference-roadmap corners (ROADMAP.md:78-79,
unshipped in the reference too; round-7 task 5)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def logs(spark, evm_dir):
    return spark.read.parquet(f"{evm_dir}/logs.parquet")


def test_raw_log_source_projection(spark, logs, evm_dir):
    """The decode-less surface: row-for-row the logs table, with topic0 /
    arity / size derived correctly and the reserved raw map carrying every
    topic plus the data hex."""
    from apollo_spark.sources.logs import raw_log_source

    raw = raw_log_source(logs)
    assert raw.count() == logs.count()
    r = raw.orderBy("tx_hash", "log_index").first()
    assert r["topic0"] == r["topics"][0]
    assert r["n_topics"] == len(r["topics"])
    assert r["data_bytes"] * 2 == len(r["data_hex"])
    assert r["raw"]["topic0"] == r["topic0"]
    assert r["raw"]["data"] == r["data_hex"]
    # pushdown filters narrow the scan
    eth = raw_log_source(logs, chain="ethereum")
    con = duckdb.connect()
    n_eth = con.sql(
        f"SELECT COUNT(*) FROM '{evm_dir}/logs.parquet' WHERE chain='ethereum'"
    ).fetchone()[0]
    assert eth.count() == n_eth


def test_raw_log_source_log0_rows(spark, logs):
    """LOG0 logs (EMPTY topics array) are a real shape on exactly the
    ABI-less surface this source targets: the row must come through with a
    null topic0 and a data-only raw map — not crash on the descending
    sequence(0,-1) key array or ANSI's out-of-range GetArrayItem."""
    from apollo_spark.sources.logs import raw_log_source

    log0 = spark.createDataFrame(
        [
            (
                "ethereum",
                "0xdeadbeef",
                7,
                "0xbh",
                "0xth",
                0,
                0,
                [],
                bytearray(b"\x00\x01"),
            )
        ],
        "chain string, address string, block_number long, block_hash string, "
        "tx_hash string, tx_index int, log_index int, topics array<string>, "
        "data binary",
    )
    raw = raw_log_source(log0.unionByName(logs.limit(1), allowMissingColumns=True))
    rows = {r["tx_hash"]: r for r in raw.collect()}
    r0 = rows["0xth"]
    assert r0["topic0"] is None
    assert r0["n_topics"] == 0
    assert set(r0["raw"].keys()) == {"data"}
    assert r0["raw"]["data"] == "0001"


def test_event_scan_skips_log0_rows(spark, logs):
    """A LOG0 row in the landed table must fall to the malformed-row drop
    (null topic0 != any signature), not blow up the decoded scan's topic0
    filter under ANSI."""
    from apollo_spark.abi import AbiEvent, AbiParam
    from apollo_spark.sources.logs import decoded_event_source

    log0 = spark.createDataFrame(
        [("ethereum", "0xdeadbeef", 7, "0xbh", "0xth", 0, 0, [], bytearray(b""))],
        "chain string, address string, block_number long, block_hash string, "
        "tx_hash string, tx_index int, log_index int, topics array<string>, "
        "data binary",
    )
    ev = AbiEvent(
        "Transfer",
        (
            AbiParam("from", "address", True),
            AbiParam("to", "address", True),
            AbiParam("value", "uint256"),
        ),
    )
    both = log0.unionByName(logs, allowMissingColumns=True)
    n_with = decoded_event_source(both, ev, outputs=["value"]).count()
    n_without = decoded_event_source(logs, ev, outputs=["value"]).count()
    assert n_with == n_without


def test_cdc_short_docs_single_chunk(spark):
    """Documents shorter than the rolling window can never cut: each must
    yield exactly ONE chunk with n_words == token count. Pre-fix, the
    descending sequence(window-1, size-1) evaluated clamped rolling hashes
    at fabricated positions and ~1/8 of 2-token docs emitted spurious cuts
    (wrong n_words, oracle divergence)."""
    from apollo_spark.ops.dedup import _cdc_chunks

    rows = [(i, f"w{i}") for i in range(40)] + [
        (100 + i, f"a{i} b{i}") for i in range(40)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = _cdc_chunks(d, "doc_id", "text", window=3, divisor=16).collect()
    assert len(out) == 80  # one chunk per doc
    for r in out:
        assert r["chunk_id"] == 0
        assert r["n_words"] == len(r["chunk_text"].split(" "))
        assert r["n_words"] == (1 if r["id"] < 100 else 2)


def test_selector_profile_matches_duckdb(spark, logs, evm_dir):
    """The recon aggregate equals the straight SQL profile over the same
    parquet — counts, contract cardinality, block span, payload stats."""
    from apollo_spark.sources.logs import raw_log_source, selector_profile

    prof = selector_profile(raw_log_source(logs)).toPandas()
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT topics[1] AS topic0, CAST(len(topics) AS INT) AS n_topics,
               COUNT(*) AS n_logs, COUNT(DISTINCT address) AS n_contracts,
               MIN(block_number) AS first_block, MAX(block_number) AS last_block,
               CAST(SUM(octet_length(data)) AS BIGINT) AS total_data_bytes,
               MAX(CAST(octet_length(data) AS BIGINT)) AS max_data_bytes
        FROM '{evm_dir}/logs.parquet'
        GROUP BY 1, 2 ORDER BY n_logs DESC, topic0 ASC, n_topics ASC
        """
    ).df()
    assert prof.reset_index(drop=True).astype(str).equals(want.astype(str))
    # the fixture's three event families surface as three signature shapes
    assert len(prof) == 3


def _write_two_chain_transfers(spark, tmp_path):
    """A tiny 2-chain logs+blocks catalog with one WATCHED address active
    on both chains (sender on ethereum, receiver on polygon) among decoys."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from apollo_spark.abi import Abi, abi_encode
    from apollo_spark.testing import _addr, _hash, _pad_topic

    rng = np.random.default_rng(7)
    erc20 = Abi.from_file("/root/reference/test/erc20.abi.json")
    t0 = erc20.events["Transfer"].topic0
    watched = _addr(rng)
    others = [_addr(rng) for _ in range(5)]
    token = _addr(rng)
    logs = {k: [] for k in ("chain", "block_number", "block_hash", "tx_hash",
                            "tx_index", "log_index", "address", "topics", "data")}
    blocks = {"chain": [], "block_number": [], "block_hash": [], "timestamp": []}
    expected = []  # (chain, block, sender, receiver, value)
    for chain, base in (("ethereum", 100), ("polygon", 500)):
        for i in range(8):
            blk = base + i
            bh = _hash(rng)
            blocks["chain"].append(chain)
            blocks["block_number"].append(blk)
            blocks["block_hash"].append(bh)
            blocks["timestamp"].append(1_700_000_000 + blk)
            if i % 2 == 0:  # watched is a party on even rows
                frm, to = (watched, others[i % 5]) if chain == "ethereum" else (others[i % 5], watched)
            else:
                frm, to = others[i % 5], others[(i + 1) % 5]
            val = 10_000 + i
            logs["chain"].append(chain)
            logs["block_number"].append(blk)
            logs["block_hash"].append(bh)
            logs["tx_hash"].append(_hash(rng))
            logs["tx_index"].append(i)
            logs["log_index"].append(0)
            logs["address"].append(token)
            logs["topics"].append([t0, _pad_topic(frm), _pad_topic(to)])
            logs["data"].append(abi_encode(["uint256"], [val]))
            if watched in (frm, to):
                expected.append((chain, blk, frm, to, float(val)))
    pq.write_table(
        pa.table({
            **{k: pa.array(logs[k]) for k in ("chain", "block_number", "block_hash", "tx_hash")},
            "tx_index": pa.array(logs["tx_index"], type=pa.int32()),
            "log_index": pa.array(logs["log_index"], type=pa.int32()),
            "address": pa.array(logs["address"]),
            "topics": pa.array(logs["topics"], type=pa.list_(pa.string())),
            "data": pa.array(logs["data"], type=pa.binary()),
        }),
        tmp_path / "logs.parquet",
    )
    pq.write_table(pa.table(blocks), tmp_path / "blocks.parquet")
    return watched, expected


def test_cross_chain_monitor_template_e2e(spark, tmp_path):
    """cross_chain_monitor_hcl parses, loop-expands over both chains, and
    publishes ONE union frame holding exactly the watched address's
    transfers from each chain (filter from==addr || to==addr)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.dsl.templates import cross_chain_monitor_hcl
    from apollo_spark.pipeline import compile_schema
    from apollo_spark.sources.tables import Catalog

    watched, expected = _write_two_chain_transfers(spark, tmp_path)
    catalog = Catalog(spark, str(tmp_path))
    src = cross_chain_monitor_hcl(watched, ["ethereum", "polygon"])
    schema = parse_schema(src, confdir="/root/reference/test")
    out = compile_schema(spark, catalog, schema)
    assert list(out) == ["cross_chain_monitor"]
    got = sorted(
        (r["chain"], r["block"], r["sender"], r["receiver"], float(r["amount"]))
        for r in out["cross_chain_monitor"].collect()
    )
    assert got == sorted(expected)
    # both chains are represented — the cross-chain part is real
    assert {c for c, *_ in got} == {"ethereum", "polygon"}
