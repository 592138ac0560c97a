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
