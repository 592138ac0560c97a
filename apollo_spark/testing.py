"""Deterministic EVM fixture tables (FIXTURES.md) for offline tests/bench.

Seed-fixed synthetic chain data shaped like the reference's test fixtures
(/root/reference/test/unipair.abi.json, erc20.abi.json, schema.example.hcl):
raw ``logs`` (ABI-encoded with our own encoder), golden decoded
``swap_events`` / ``transfers``, ``blocks`` headers, ``method_results``
(getReserves grid), ``token_metadata`` and ``balances`` dims. Written as
parquet via pyarrow; generation is idempotent per directory.
"""

from __future__ import annotations

from decimal import Decimal
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from apollo_spark.abi import Abi, abi_encode

SEED = 42
CHAIN_SPACING = {"ethereum": 13, "arbitrum": 1, "polygon": 2}
START_TS = 1_650_000_000
START_BLOCK = 10_000_000
N_BLOCKS = 2_000

# the flagship example's pair address (schema.example.hcl:15)
FLAGSHIP_PAIR = "0x905dfcd5649217c42684f23958568e533c711aa3"

# synthetic uniswapv3 pool for the template fixtures (polygon chain so the
# ethereum/arbitrum log counts other tests pin stay untouched)
FLAGSHIP_V3_POOL = "0x45dda9cb7c25131df268515131f647d726f50608"

# hand-written public-interface ABIs for the protocol templates
ABI_FIXTURES_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "abis"


def _addr(rng: np.random.Generator) -> str:
    return "0x" + bytes(rng.integers(0, 256, 20, dtype=np.uint8)).hex()


def _hash(rng: np.random.Generator) -> str:
    return "0x" + bytes(rng.integers(0, 256, 32, dtype=np.uint8)).hex()


def _pad_topic(addr: str) -> str:
    return "0x" + addr.removeprefix("0x").rjust(64, "0")


def dec38(values) -> pa.Array:
    return pa.array([Decimal(int(v)) for v in values], type=pa.decimal128(38, 0))


def generate_evm_fixtures(root: str | Path, n_swaps: int = 8000, n_transfers: int = 6000) -> Path:
    root = Path(root)
    marker = root / "_FIXTURES_OK"
    if marker.exists() and marker.read_text() == "v5":
        return root
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    unipair = Abi.from_file("/root/reference/test/unipair.abi.json")
    erc20 = Abi.from_file("/root/reference/test/erc20.abi.json")
    swap_t0 = unipair.events["Swap"].topic0
    transfer_t0 = erc20.events["Transfer"].topic0

    # ---- blocks ----
    rows = {k: [] for k in ("chain", "block_number", "block_hash", "timestamp")}
    for chain, spacing in CHAIN_SPACING.items():
        for i in range(N_BLOCKS):
            rows["chain"].append(chain)
            rows["block_number"].append(START_BLOCK + i)
            rows["block_hash"].append(_hash(rng))
            rows["timestamp"].append(START_TS + i * spacing)
    pq.write_table(pa.table(rows), root / "blocks.parquet")
    block_hash = {
        (c, b): h for c, b, h in zip(rows["chain"], rows["block_number"], rows["block_hash"])
    }
    block_ts = {
        (c, b): t for c, b, t in zip(rows["chain"], rows["block_number"], rows["timestamp"])
    }

    # ---- swaps (arbitrum pairs; token0=18dec "ETH", token1=6dec "USDC") ----
    pairs = [FLAGSHIP_PAIR] + [_addr(rng) for _ in range(5)]
    wallets = [_addr(rng) for _ in range(50)]
    logs = {k: [] for k in ("chain", "block_number", "block_hash", "tx_hash", "tx_index", "log_index", "address", "topics", "data")}
    swap_rows = {k: [] for k in ("chain", "block_number", "block_hash", "timestamp", "contract_address", "event_name", "tx_hash", "tx_index", "amount0In", "amount1In", "amount0Out", "amount1Out")}

    def add_log(chain, blk, tx_hash, tx_index, log_index, address, topics, data):
        logs["chain"].append(chain)
        logs["block_number"].append(blk)
        logs["block_hash"].append(block_hash[(chain, blk)])
        logs["tx_hash"].append(tx_hash)
        logs["tx_index"].append(tx_index)
        logs["log_index"].append(log_index)
        logs["address"].append(address)
        logs["topics"].append(topics)
        logs["data"].append(data)

    for i in range(n_swaps):
        chain = "arbitrum"
        blk = int(rng.integers(START_BLOCK, START_BLOCK + N_BLOCKS))
        pair = pairs[int(rng.integers(0, len(pairs)))]
        buy = bool(rng.integers(0, 2))
        eth_amt = int(rng.uniform(1e15, 1e21))
        usdc_amt = int(rng.uniform(1e6, 1e11))
        if buy:  # USDC in, ETH out
            a0in, a1in, a0out, a1out = 0, usdc_amt, eth_amt, 0
        else:  # ETH in, USDC out
            a0in, a1in, a0out, a1out = eth_amt, 0, 0, usdc_amt
        tx_hash = _hash(rng)
        tx_index = int(rng.integers(0, 200))
        sender, to = wallets[int(rng.integers(0, 50))], wallets[int(rng.integers(0, 50))]
        data = abi_encode(["uint256"] * 4, [a0in, a1in, a0out, a1out])
        if rng.random() < 0.02:
            data = b""  # malformed: must be dropped (events.go:411-413)
        else:
            for col, val in (
                ("chain", chain), ("block_number", blk), ("block_hash", block_hash[(chain, blk)]),
                ("timestamp", block_ts[(chain, blk)]), ("contract_address", pair),
                ("event_name", "Swap"), ("tx_hash", tx_hash), ("tx_index", tx_index),
                ("amount0In", a0in), ("amount1In", a1in), ("amount0Out", a0out), ("amount1Out", a1out),
            ):
                swap_rows[col].append(val)
        add_log(chain, blk, tx_hash, tx_index, int(rng.integers(0, 10)), pair,
                [swap_t0, _pad_topic(sender), _pad_topic(to)], data)

    # ---- uniswapv3 swaps (polygon pools; int256 amounts, signed tick) ----
    univ3 = Abi.from_file(ABI_FIXTURES_DIR / "univ3pool.abi.json")
    v3_t0 = univ3.events["Swap"].topic0
    v3_pools = [FLAGSHIP_V3_POOL] + [_addr(rng) for _ in range(2)]
    v3 = {k: [] for k in ("chain", "block_number", "block_hash", "timestamp", "contract_address", "event_name", "tx_hash", "tx_index", "amount0", "amount1", "sqrtPriceX96", "liquidity", "tick")}
    for i in range(2000):
        chain = "polygon"
        blk = int(rng.integers(START_BLOCK, START_BLOCK + N_BLOCKS))
        pool = v3_pools[int(rng.integers(0, len(v3_pools)))]
        eth_amt = int(rng.uniform(1e15, 1e21))
        usdc_amt = int(rng.uniform(1e6, 1e11))
        # v3 semantics: one amount positive (paid in), the other negative (out)
        if bool(rng.integers(0, 2)):
            a0, a1 = eth_amt, -usdc_amt
        else:
            a0, a1 = -eth_amt, usdc_amt
        sqrt_px = int(rng.uniform(1e27, 1e29))
        liq = int(rng.uniform(1e15, 1e20))
        tick = int(rng.integers(-887_272, 887_273))
        tx_hash = _hash(rng)
        tx_index = int(rng.integers(0, 200))
        sender, rec = wallets[int(rng.integers(0, 50))], wallets[int(rng.integers(0, 50))]
        data = abi_encode(
            ["int256", "int256", "uint160", "uint128", "int24"], [a0, a1, sqrt_px, liq, tick]
        )
        add_log(chain, blk, tx_hash, tx_index, int(rng.integers(0, 10)), pool,
                [v3_t0, _pad_topic(sender), _pad_topic(rec)], data)
        for col, val in (
            ("chain", chain), ("block_number", blk), ("block_hash", block_hash[(chain, blk)]),
            ("timestamp", block_ts[(chain, blk)]), ("contract_address", pool),
            ("event_name", "Swap"), ("tx_hash", tx_hash), ("tx_index", tx_index),
            ("amount0", a0), ("amount1", a1), ("sqrtPriceX96", sqrt_px),
            ("liquidity", liq), ("tick", tick),
        ):
            v3[col].append(val)

    # ---- global ERC20 transfers (ethereum, many token contracts) ----
    tokens = [_addr(rng) for _ in range(20)]
    tr = {k: [] for k in ("chain", "block_number", "timestamp", "contract_address", "event_name", "tx_hash", "tx_index", "from", "to", "value")}
    for i in range(n_transfers):
        chain = "ethereum"
        blk = int(rng.integers(START_BLOCK, START_BLOCK + N_BLOCKS))
        token = tokens[int(rng.integers(0, len(tokens)))]
        frm, to = wallets[int(rng.integers(0, 50))], wallets[int(rng.integers(0, 50))]
        value = int(rng.uniform(1, 1e24))
        tx_hash = _hash(rng)
        tx_index = int(rng.integers(0, 300))
        add_log(chain, blk, tx_hash, tx_index, int(rng.integers(0, 10)), token,
                [transfer_t0, _pad_topic(frm), _pad_topic(to)],
                abi_encode(["uint256"], [value]))
        for col, val in (
            ("chain", chain), ("block_number", blk), ("timestamp", block_ts[(chain, blk)]),
            ("contract_address", token), ("event_name", "Transfer"), ("tx_hash", tx_hash),
            ("tx_index", tx_index), ("from", frm), ("to", to), ("value", value),
        ):
            tr[col].append(val)

    log_table = pa.table({
        **{k: pa.array(logs[k]) for k in ("chain", "block_number", "block_hash", "tx_hash")},
        "tx_index": pa.array(logs["tx_index"], type=pa.int32()),
        "log_index": pa.array(logs["log_index"], type=pa.int32()),
        "address": pa.array(logs["address"]),
        "topics": pa.array(logs["topics"], type=pa.list_(pa.string())),
        "data": pa.array(logs["data"], type=pa.binary()),
    })
    pq.write_table(log_table, root / "logs.parquet")

    swap_table = pa.table({
        **{k: pa.array(swap_rows[k]) for k in ("chain", "block_number", "block_hash", "timestamp", "contract_address", "event_name", "tx_hash")},
        "tx_index": pa.array(swap_rows["tx_index"], type=pa.int32()),
        **{k: dec38(swap_rows[k]) for k in ("amount0In", "amount1In", "amount0Out", "amount1Out")},
    })
    pq.write_table(swap_table, root / "swap_events.parquet")

    tr_table = pa.table({
        **{k: pa.array(tr[k]) for k in ("chain", "block_number", "timestamp", "contract_address", "event_name", "tx_hash")},
        "tx_index": pa.array(tr["tx_index"], type=pa.int32()),
        "from": pa.array(tr["from"]),
        "to": pa.array(tr["to"]),
        "value": dec38(tr["value"]),
    })
    pq.write_table(tr_table, root / "transfers.parquet")

    v3_table = pa.table({
        **{k: pa.array(v3[k]) for k in ("chain", "block_number", "block_hash", "timestamp", "contract_address", "event_name", "tx_hash")},
        "tx_index": pa.array(v3["tx_index"], type=pa.int32()),
        **{k: dec38(v3[k]) for k in ("amount0", "amount1", "sqrtPriceX96", "liquidity")},
        "tick": pa.array(v3["tick"], type=pa.int32()),
    })
    pq.write_table(v3_table, root / "univ3_swap_events.parquet")

    # ---- method_results: getReserves() per pair every 10 blocks ----
    mr = {k: [] for k in ("chain", "contract_address", "block_number", "timestamp", "_reserve0", "_reserve1", "_blockTimestampLast")}
    for pair in pairs:
        r0, r1 = int(1e21), int(2e12)
        for blk in range(START_BLOCK, START_BLOCK + N_BLOCKS, 10):
            r0 = max(int(r0 * rng.uniform(0.99, 1.01)), 10**18)
            r1 = max(int(r1 * rng.uniform(0.99, 1.01)), 10**9)
            mr["chain"].append("arbitrum")
            mr["contract_address"].append(pair)
            mr["block_number"].append(blk)
            mr["timestamp"].append(block_ts[("arbitrum", blk)])
            mr["_reserve0"].append(r0)
            mr["_reserve1"].append(r1)
            mr["_blockTimestampLast"].append(block_ts[("arbitrum", blk)])
    pq.write_table(pa.table({
        "chain": pa.array(mr["chain"]), "contract_address": pa.array(mr["contract_address"]),
        "block_number": pa.array(mr["block_number"]), "timestamp": pa.array(mr["timestamp"]),
        "_reserve0": dec38(mr["_reserve0"]), "_reserve1": dec38(mr["_reserve1"]),
        "_blockTimestampLast": pa.array(mr["_blockTimestampLast"]),
    }), root / "method_results.parquet")

    # ---- token_metadata + balances ----
    meta = {
        "chain": ["ethereum"] * len(tokens),
        "token_address": tokens,
        "decimals": [int([6, 8, 18][i % 3]) for i in range(len(tokens))],
        "symbol": [f"TOK{i}" for i in range(len(tokens))],
        "name": [f"Token {i}" for i in range(len(tokens))],
    }
    pq.write_table(pa.table(meta), root / "token_metadata.parquet")

    bal = {k: [] for k in ("chain", "block_number", "address", "token_address", "raw_balance")}
    for w in wallets[:10]:
        for blk in range(START_BLOCK, START_BLOCK + N_BLOCKS, 100):
            bal["chain"].append("ethereum")
            bal["block_number"].append(blk)
            bal["address"].append(w)
            bal["token_address"].append(None)
            bal["raw_balance"].append(int(rng.uniform(1e16, 1e22)))
            tok = tokens[int(rng.integers(0, len(tokens)))]
            bal["chain"].append("ethereum")
            bal["block_number"].append(blk)
            bal["address"].append(w)
            bal["token_address"].append(tok)
            bal["raw_balance"].append(int(rng.uniform(1e6, 1e24)))
    pq.write_table(pa.table({
        "chain": pa.array(bal["chain"]), "block_number": pa.array(bal["block_number"]),
        "address": pa.array(bal["address"]), "token_address": pa.array(bal["token_address"], type=pa.string()),
        "raw_balance": dec38(bal["raw_balance"]),
    }), root / "balances.parquet")

    # ---- contracts (code-bearing addresses; is_contract ROADMAP.md:81) ----
    pq.write_table(
        pa.table(
            {
                "chain": ["arbitrum"] * len(pairs) + ["ethereum"] * len(tokens),
                "address": list(pairs) + list(tokens),
            }
        ),
        root / "contracts.parquet",
    )

    # ---- prices (get_price, commented out at dsl/functions.go:105-121) ----
    pr = {k: [] for k in ("chain", "token_address", "block_number", "price_usd")}
    for i, tok in enumerate(tokens):
        for blk in range(START_BLOCK, START_BLOCK + N_BLOCKS, 100):
            pr["chain"].append("ethereum")
            pr["token_address"].append(tok)
            pr["block_number"].append(blk)
            pr["price_usd"].append(round(1.0 + i + (blk - START_BLOCK) / 1e5, 6))
    pq.write_table(pa.table(pr), root / "prices.parquet")

    # ---- transactions (tx/mempool monitoring, ROADMAP.md:67-76) ----
    tx = {k: [] for k in ("chain", "block_number", "block_hash", "tx_hash", "tx_index", "from_address", "to_address", "value", "gas_used", "timestamp")}
    for i in range(5000):
        blk = START_BLOCK + int(rng.integers(0, N_BLOCKS))
        tx["chain"].append("ethereum")
        tx["block_number"].append(blk)
        tx["block_hash"].append(block_hash[("ethereum", blk)])
        tx["tx_hash"].append(_hash(rng))
        tx["tx_index"].append(int(rng.integers(0, 200)))
        tx["from_address"].append(wallets[int(rng.integers(0, len(wallets)))])
        tx["to_address"].append(
            tokens[int(rng.integers(0, len(tokens)))] if i % 3 == 0 else wallets[int(rng.integers(0, len(wallets)))]
        )
        tx["value"].append(int(rng.uniform(0, 5e18)))
        tx["gas_used"].append(int(rng.integers(21_000, 500_000)))
        tx["timestamp"].append(block_ts[("ethereum", blk)])
    # every LOG's transaction also lands, so tx-context enrichment joins
    # (ROADMAP.md:78 tx_sender/tx_receiver) resolve for decoded events
    seen_tx = set(tx["tx_hash"])
    for chain, blk, bh, th, ti in zip(
        logs["chain"], logs["block_number"], logs["block_hash"], logs["tx_hash"], logs["tx_index"]
    ):
        if th in seen_tx:
            continue
        seen_tx.add(th)
        tx["chain"].append(chain)
        tx["block_number"].append(blk)
        tx["block_hash"].append(bh)
        tx["tx_hash"].append(th)
        tx["tx_index"].append(ti)
        tx["from_address"].append(wallets[int(rng.integers(0, len(wallets)))])
        tx["to_address"].append(tokens[int(rng.integers(0, len(tokens)))])
        tx["value"].append(int(rng.uniform(0, 5e18)))
        tx["gas_used"].append(int(rng.integers(21_000, 500_000)))
        tx["timestamp"].append(block_ts[(chain, blk)])
    pq.write_table(
        pa.table({**{k: pa.array(v) for k, v in tx.items() if k != "value"}, "value": dec38(tx["value"])}),
        root / "transactions.parquet",
    )

    marker.write_text("v5")
    return root


class FakeLogNode:
    """eth_getLogs fake for rpc_log_source tests: rejects ranges wider than
    ``cap`` blocks (RangeTooLargeError) and records every call. Lives here
    (not in the test module) so Spark workers can unpickle it."""

    def __init__(self, logs_by_block: dict, cap: int):
        self.logs_by_block = logs_by_block
        self.cap = cap
        self.calls: list = []

    def get_logs(self, chain, address, topic0, from_block, to_block):
        from apollo_spark.sources.rpc_logs import RangeTooLargeError

        self.calls.append((from_block, to_block))
        if to_block - from_block + 1 > self.cap:
            raise RangeTooLargeError(f"{from_block}-{to_block}")
        out = []
        for b in range(from_block, to_block + 1):
            out.extend(self.logs_by_block.get(b, []))
        return out
