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
