"""CLI end-to-end: schema.hcl + landed tables -> CSV output, driven through
the real `python -m apollo_spark` surface."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path


def test_cli_batch_csv(tmp_path, evm_dir):
    confdir = tmp_path / "conf"
    confdir.mkdir()
    shutil.copy("/root/reference/test/unipair.abi.json", confdir / "unipair.abi.json")
    (confdir / "schema.hcl").write_text(
        """
query flagship_swaps {
  chain = "arbitrum"
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount1In", "amount0Out"]
    }
    transform {
      usdc_sold = parse_decimals(amount1In, 6)
      eth_bought = parse_decimals(amount0Out, 18)
    }
  }
  filter = [ eth_bought != 0 ]
  save {
    block = blocknumber
    tx_hash = tx_hash
    price = usdc_sold / eth_bought
  }
}
"""
    )
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, "-m", "apollo_spark",
            "--confdir", str(confdir),
            "--data-dir", str(evm_dir),
            "--csv",
            "--output-dir", str(out_dir),
            "--log-level", "ERROR",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    csv_files = list((out_dir / "flagship_swaps").glob("*.csv"))
    assert len(csv_files) == 1  # single_file coalesce
    header = csv_files[0].read_text().splitlines()[0]
    assert header == "block,tx_hash,price"
    assert len(csv_files[0].read_text().splitlines()) > 100


def test_cli_realtime_multi_stream(tmp_path, evm_dir):
    """Realtime mode with TWO event sources in one query (two contracts):
    both must feed the query's single unioned stream (regression: per-event
    streams once shared one checkpoint dir, so the second .start() refused
    with a duplicate query id) and rows from BOTH contracts must land in the
    query's CSV sink exactly once."""
    import json
    import os
    import signal
    import time

    from apollo_spark.abi import Abi, abi_encode

    confdir = tmp_path / "conf"
    confdir.mkdir()
    shutil.copy("/root/reference/test/unipair.abi.json", confdir / "unipair.abi.json")
    addr_a = "0x905dfcd5649217c42684f23958568e533c711aa3"
    addr_b = "0x1111111111111111111111111111111111111111"
    (confdir / "schema.hcl").write_text(
        f"""
query rt_two_pools {{
  chain = "arbitrum"
  contract {{
    address = "{addr_a}"
    abi = "unipair.abi.json"
    event Swap {{
      outputs = ["amount0In"]
    }}
  }}
  contract {{
    address = "{addr_b}"
    abi = "unipair.abi.json"
    event Swap {{
      outputs = ["amount0In"]
    }}
  }}
}}
"""
    )
    # pre-populated bridge dir: 3 logs per contract
    abi = Abi.from_file(str(confdir / "unipair.abi.json"))
    ev = abi.events["Swap"]
    bridge = tmp_path / "bridge"
    bridge.mkdir()
    rows = []
    for j, addr in enumerate((addr_a, addr_b)):
        for i in range(3):
            rows.append(
                {
                    "chain": "arbitrum",
                    "block_number": 10_000_000 + i,
                    "block_hash": "0x" + f"{i:064x}",
                    "tx_hash": "0x" + f"{j * 100 + i + 7:064x}",
                    "tx_index": 0,
                    "log_index": j,
                    "address": addr,
                    "topics": [ev.topic0, "0x" + "11" * 32, "0x" + "22" * 32],
                    "data_hex": "0x" + abi_encode(["uint256"] * 4, [j * 10 + i, 0, 0, 0]).hex(),
                }
            )
    (bridge / "batch0.jsonl").write_text("\n".join(json.dumps(r) for r in rows))

    out_dir = tmp_path / "out"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "apollo_spark",
            "--confdir", str(confdir),
            "--data-dir", str(evm_dir),
            "--realtime",
            "--bridge-dir", str(bridge),
            "--csv",
            "--output-dir", str(out_dir),
            "--log-level", "ERROR",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd="/root/repo",
    )
    try:
        csv_dir = out_dir / "rt_two_pools"
        deadline = time.monotonic() + 240
        seen: set[str] = set()
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                _, err = proc.communicate()
                raise AssertionError(f"cli exited early rc={proc.returncode}: {err[-2000:]}")
            seen = set()
            for f in csv_dir.glob("*.csv") if csv_dir.exists() else []:
                lines = [ln for ln in f.read_text().splitlines() if ln and not ln.startswith("chain")]
                for ln in lines:
                    seen.add(ln)
            addrs = {ln.split(",")[1] for ln in seen if "," in ln}
            if addr_a in addrs and addr_b in addrs:
                break
            time.sleep(2)
        # settle + re-scan: the poll above may have caught a file mid-write
        time.sleep(3)
        seen = set()
        for f in csv_dir.glob("*.csv"):
            for ln in f.read_text().splitlines():
                if ln and not ln.startswith("chain") and ln.count(",") >= 8:
                    seen.add(ln)
        addrs = {ln.split(",")[1] for ln in seen}
        assert addr_a in addrs and addr_b in addrs, f"rows seen: {sorted(seen)[:10]}"
        # each log delivered exactly once (dedup active, no double-sink)
        assert len(seen) == 6, sorted(seen)
    finally:
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGTERM)
            try:
                proc.wait(30)
            except subprocess.TimeoutExpired:
                proc.kill()


def test_cli_missing_schema(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "apollo_spark", "--confdir", str(tmp_path), "--data-dir", str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert proc.returncode == 2
    assert "schema not found" in proc.stderr


def test_cli_batch_tx_table(tmp_path, evm_dir):
    """--tx-table: the CLI commits each query's result as a transactional
    snapshot; a reader opens the manifest (not the directory) and sees
    exactly the committed rows."""
    confdir = tmp_path / "conf"
    confdir.mkdir()
    shutil.copy("/root/reference/test/unipair.abi.json", confdir / "unipair.abi.json")
    (confdir / "schema.hcl").write_text(
        """
query flagship_swaps {
  chain = "arbitrum"
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount1In", "amount0Out"]
    }
  }
  save {
    block = blocknumber
    tx_hash = tx_hash
  }
}
"""
    )
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, "-m", "apollo_spark",
            "--confdir", str(confdir),
            "--data-dir", str(evm_dir),
            "--tx-table",
            "--output-dir", str(out_dir),
            "--log-level", "ERROR",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    from apollo_spark.table_format import TxTable

    t = TxTable(str(out_dir / "tables" / "flagship_swaps"))
    assert t.current_version() == 1
    # read through a fresh session-independent manifest open
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    df = t.read(spark)
    assert df.columns == ["block", "tx_hash"]
    assert df.count() > 100


def test_cli_init_writes_config_and_schema(tmp_path):
    """`init` subcommand (main.go:43-51): writes starter config.yml +
    schema.hcl, keeps existing files, and the starter schema parses."""
    from apollo_spark.cli import main
    from apollo_spark.dsl.schema import parse_schema

    conf = tmp_path / "conf"
    assert main(["init", "--confdir", str(conf)]) == 0
    assert (conf / "config.yml").exists() and (conf / "schema.hcl").exists()
    marker = "# user-edited"
    (conf / "config.yml").write_text(marker)
    assert main(["init", "--confdir", str(conf)]) == 0
    assert (conf / "config.yml").read_text() == marker  # idempotent, no clobber
    s = parse_schema((conf / "schema.hcl").read_text())
    assert s.queries[0].name == "my_transfers"
    assert s.queries[0].contracts[0].events[0].name == "Transfer"


def test_cli_flag_aliases(tmp_path):
    """-R realtime alias + --log-parts parse (flags.go:10-14,43-48)."""
    from apollo_spark.cli import build_parser

    args = build_parser().parse_args(
        ["-R", "--confdir", "c", "--data-dir", "d", "--log-parts", "17"]
    )
    assert args.realtime is True and args.log_parts == 17


def test_cli_check_and_explain(tmp_path, evm_dir):
    """--check compiles and prints output schemas without writing anything;
    --explain additionally prints the formatted physical plan."""
    confdir = tmp_path / "conf"
    confdir.mkdir()
    shutil.copy("/root/reference/test/unipair.abi.json", confdir / "unipair.abi.json")
    (confdir / "schema.hcl").write_text(
        """
query checked {
  chain = "arbitrum"
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount1In", "amount0Out"]
    }
  }
  save {
    block = blocknumber
    usdc = parse_decimals(amount1In, 6)
  }
}
"""
    )
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable, "-m", "apollo_spark",
            "--confdir", str(confdir), "--data-dir", str(evm_dir),
            "--csv", "--output-dir", str(out_dir),
            "--explain", "--log-level", "ERROR",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "query checked: struct<block:bigint,usdc:double>" in proc.stdout
    assert "== Physical Plan ==" in proc.stdout
    assert not out_dir.exists()  # nothing executed or written


def test_cli_table_maintenance(tmp_path, spark):
    """`table` subcommand: history/count/compact/vacuum over a TxTable."""
    from apollo_spark.cli import main
    from apollo_spark.table_format import TxTable

    root = str(tmp_path / "t")
    t = TxTable(root)
    t.write(spark.range(100).toDF("x"), mode="overwrite")
    t.write(spark.range(50).toDF("x"), mode="append")

    assert main(["table", "history", "--path", root]) == 0
    assert main(["table", "count", "--path", root]) == 0
    assert main(["table", "compact", "--path", root, "--num-files", "1"]) == 0
    assert main(["table", "vacuum", "--path", root, "--retain-last", "1"]) == 0
    assert TxTable(root).row_count() == 150  # maintenance preserved the data
