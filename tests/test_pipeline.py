"""End-to-end pipeline tests: reference schemas over deterministic fixtures,
value-compared against DuckDB oracles (the project's correctness bar,
BASELINE.md t2)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from apollo_spark.dsl.schema import parse_schema
from apollo_spark.pipeline import PipelineOptions, compile_query, compile_schema
from apollo_spark.sources.tables import Catalog

FLAGSHIP_SCHEMA = """
variables = {
  b = upper("eth_buy")
  s = upper("eth_sell")
}

query usdc_eth_swaps {
  chain = "arbitrum"
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount1In", "amount0Out", "amount0In", "amount1Out"]
    }
    transform {
      usdc_sold = parse_decimals(amount1In, 6)
      eth_sold = parse_decimals(amount0In, 18)
      usdc_bought = parse_decimals(amount1Out, 6)
      eth_bought = parse_decimals(amount0Out, 18)
      buy = amount0Out != 0
    }
  }
  filter = [
    eth_bought != 0
  ]
  save {
    timestamp = timestamp
    block = blocknumber
    contract = contract_address
    tx_hash = tx_hash
    swap_price = eth_bought != 0 ? (usdc_sold / eth_bought) : (usdc_bought / eth_sold)
    direction = buy ? b : s
    size_in_usdc = eth_bought != 0 ? usdc_sold : usdc_bought
  }
}
"""

ORACLE_FLAGSHIP = """
SELECT timestamp,
       block_number AS block,
       contract_address AS contract,
       tx_hash,
       (CAST(amount1In AS DOUBLE) / 1e6) / (CAST(amount0Out AS DOUBLE) / 1e18) AS swap_price,
       CASE WHEN CAST(amount0Out AS DOUBLE) <> 0 THEN 'ETH_BUY' ELSE 'ETH_SELL' END AS direction,
       CAST(amount1In AS DOUBLE) / 1e6 AS size_in_usdc
FROM swap_events
WHERE contract_address = '0x905dfcd5649217c42684f23958568e533c711aa3'
  AND CAST(amount0Out AS DOUBLE) / 1e18 <> 0
"""


def _duck(evm_dir: Path):
    con = duckdb.connect()
    for t in ("swap_events", "univ3_swap_events", "transfers", "blocks", "method_results", "balances", "token_metadata", "contracts", "prices", "transactions"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{evm_dir}/{t}.parquet'")
    return con


def assert_frames_match(spark_df, duck_rel, sort_cols, approx_cols=(), tol=1e-9):
    import decimal

    import numpy as np

    sp = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    du = duck_rel.df().sort_values(sort_cols).reset_index(drop=True)
    assert len(sp) == len(du), f"row count {len(sp)} vs oracle {len(du)}"
    assert list(sp.columns) == list(du.columns), f"{list(sp.columns)} vs {list(du.columns)}"

    def is_numericish(s):
        if s.dtype.kind in "fiu":
            return True
        probe = s.dropna()
        return len(probe) > 0 and isinstance(probe.iloc[0], decimal.Decimal)

    for c in sp.columns:
        a, b = sp[c], du[c]
        if c in approx_cols or (is_numericish(a) and is_numericish(b)):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            rt = tol if c in approx_cols else 0.0
            assert np.allclose(af, bf, rtol=rt, atol=0.0, equal_nan=True), f"column {c} differs"
        else:
            mism = (a.astype(str) != b.astype(str)).sum()
            assert mism == 0, f"column {c}: {mism} mismatching values"


def test_flagship_swaps_query_vs_oracle(spark, catalog, evm_dir):
    schema = parse_schema(FLAGSHIP_SCHEMA, confdir="/root/reference/test")
    schema.validate()
    df = compile_query(spark, catalog, schema.queries[0], schema)
    con = _duck(evm_dir)
    assert_frames_match(
        df,
        con.sql(ORACLE_FLAGSHIP),
        sort_cols=["tx_hash"],
        approx_cols=("swap_price", "size_in_usdc"),
    )
    assert df.count() > 500  # flagship pair gets ~1/6 of 8k swaps, half are buys


def test_decode_drops_malformed(spark, catalog, evm_dir):
    """~2% of swap logs have empty data and must be dropped silently."""
    from apollo_spark.abi import Abi
    from apollo_spark.sources.logs import decoded_event_source

    abi = Abi.from_file("/root/reference/test/unipair.abi.json")
    df = decoded_event_source(catalog.table("logs"), abi.events["Swap"], chain="arbitrum")
    con = _duck(evm_dir)
    expected = con.sql("SELECT count(*) FROM swap_events").fetchone()[0]
    assert df.count() == expected


def test_decoded_values_match_golden(spark, catalog, evm_dir):
    """Full decode path (topics+data -> typed columns) equals the golden
    swap_events table, including timestamps from the blocks join."""
    from apollo_spark.abi import Abi
    from apollo_spark.sources.logs import decoded_event_source

    abi = Abi.from_file("/root/reference/test/unipair.abi.json")
    df = decoded_event_source(
        catalog.table("logs"),
        abi.events["Swap"],
        chain="arbitrum",
        outputs=["amount0In", "amount1In", "amount0Out", "amount1Out"],
        blocks=catalog.table("blocks"),
    ).select("tx_hash", "block_number", "timestamp", "contract_address", "amount0In", "amount1In", "amount0Out", "amount1Out")
    con = _duck(evm_dir)
    assert_frames_match(
        df,
        con.sql(
            "SELECT tx_hash, block_number, timestamp, contract_address, amount0In, amount1In, amount0Out, amount1Out FROM swap_events"
        ),
        sort_cols=["tx_hash"],
    )


def test_global_event_query(spark, catalog, evm_dir):
    """Standalone event block = address-unfiltered scan (events.go:121-216)."""
    src = """
query all_transfers {
  chain = "ethereum"
  event Transfer {
    abi = "erc20.abi.json"
    outputs = ["from", "to", "value"]
  }
  save {
    block = blocknumber
    token = contract_address
    sender = from
    receiver = to
    amount = parse_decimals(value, 18)
  }
}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(spark, catalog, schema.queries[0], schema)
    con = _duck(evm_dir)
    assert_frames_match(
        df,
        con.sql(
            'SELECT block_number AS block, contract_address AS token, "from" AS sender, "to" AS receiver,'
            " CAST(value AS DOUBLE) / 1e18 AS amount FROM transfers"
        ),
        sort_cols=["block", "token", "sender", "receiver", "amount"],
        approx_cols=("amount",),
    )


def test_method_query_landed_table(spark, catalog, evm_dir):
    """Interval method caller against the landed method_results table
    (S5 semantics without live RPC)."""
    src = """
query reserves {
  chain = "arbitrum"
  start_block = 10000000
  end_block = 10000500
  block_interval = 50
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    method getReserves { outputs = ["_reserve0", "_reserve1"] }
  }
  transform {
    mid_price = (parse_decimals(_reserve1, 6)) / (parse_decimals(_reserve0, 18))
  }
  save {
    block = blocknumber
    price = mid_price
  }
}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    schema.validate()
    df = compile_query(spark, catalog, schema.queries[0], schema)
    con = _duck(evm_dir)
    assert_frames_match(
        df,
        con.sql(
            """
            SELECT block_number AS block,
                   (CAST(_reserve1 AS DOUBLE)/1e6) / (CAST(_reserve0 AS DOUBLE)/1e18) AS price
            FROM method_results
            WHERE contract_address = '0x905dfcd5649217c42684f23958568e533c711aa3'
              AND block_number BETWEEN 10000000 AND 10000500
              AND (block_number - 10000000) % 50 = 0
            """
        ),
        sort_cols=["block"],
        approx_cols=("price",),
    )


def test_method_query_rpc_client(spark, catalog):
    """Live-RPC path with an injectable deterministic client (SURVEY §7 hard
    part #2): spark.range grid -> mapInPandas eth_call."""
    from apollo_spark.abi import abi_encode

    src = """
query reserves_rpc {
  chain = "arbitrum"
  start_block = 10000000
  end_block = 10000100
  block_interval = 10
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    method getReserves { outputs = ["_reserve0", "_reserve1"] }
  }
  save {
    block = blocknumber
    r0 = _reserve0
    r1 = _reserve1
  }
}
"""

    class FakeClient:
        def call(self, chain, to, data, block):
            # deterministic pure function of (block)
            return abi_encode(["uint112", "uint112", "uint32"], [block * 3, block * 5, 1650000000])

    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(
        spark, catalog, schema.queries[0], schema, PipelineOptions(client_factory=lambda: FakeClient())
    )
    rows = {r.block: (int(r.r0), int(r.r1)) for r in df.collect()}
    assert len(rows) == 10
    assert rows[10000000] == (30000000, 50000000)
    assert rows[10000090] == (30000270, 50000450)


def test_loop_expansion_union(spark, catalog, evm_dir):
    """loop block -> per-item pipelines unioned under one query name (Q2)."""
    src = """
loop {
  items = ["ethereum", "arbitrum"]
  query multi {
    chain = item
    event Transfer {
      abi = "erc20.abi.json"
      outputs = ["from", "to", "value"]
    }
    save {
      chain_name = "${item}"
      block = blocknumber
      amount = value
    }
  }
}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    dfs = compile_schema(spark, catalog, schema)
    assert list(dfs) == ["multi"]
    out = dfs["multi"]
    # transfers only exist on ethereum in the fixtures; arbitrum leg is empty
    chains = {r.chain_name for r in out.select("chain_name").distinct().collect()}
    assert chains == {"ethereum"}
    con = _duck(evm_dir)
    assert out.count() == con.sql("SELECT count(*) FROM transfers").fetchone()[0]


def test_event_attached_methods(spark, catalog, evm_dir):
    """S7: event rows enriched with method results at block+offset via join
    (events.go:93-104; block_offset dsl/schema.go:300-302)."""
    src = """
query swaps_with_reserves {
  chain = "arbitrum"
  contract {
    address = "0x905dfCD5649217c42684f23958568e533C711Aa3"
    abi = "unipair.abi.json"
    event Swap {
      outputs = ["amount0In", "amount1Out"]
      method getReserves {
        outputs = ["_reserve0", "_reserve1"]
        block_offset = 0
      }
    }
  }
  save {
    block = blocknumber
    tx_hash = tx_hash
    r0 = _reserve0
    r1 = _reserve1
  }
}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(spark, catalog, schema.queries[0], schema)
    con = _duck(evm_dir)
    expected = con.sql(
        """
        SELECT s.block_number AS block, s.tx_hash, m._reserve0 AS r0, m._reserve1 AS r1
        FROM swap_events s
        JOIN method_results m
          ON m.contract_address = s.contract_address AND m.block_number = s.block_number
        WHERE s.contract_address = '0x905dfcd5649217c42684f23958568e533c711aa3'
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"])


def test_balance_enrichment(spark, catalog, evm_dir):
    """balance(addr) -> as-of join on the balances table, /1e18 scaling
    (chainservice/chainservice.go:244-259)."""
    con = _duck(evm_dir)
    addr = con.sql("SELECT address FROM balances WHERE token_address IS NULL LIMIT 1").fetchone()[0]
    src = f"""
query bal {{
  chain = "ethereum"
  event Transfer {{
    abi = "erc20.abi.json"
    outputs = ["from", "to", "value"]
  }}
  save {{
    block = blocknumber
    tx_hash = tx_hash
    eth_balance = balance("{addr}")
  }}
}}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        f"""
        SELECT t.block_number AS block, t.tx_hash,
               (SELECT CAST(b.raw_balance AS DOUBLE) / 1e18
                FROM balances b
                WHERE b.token_address IS NULL AND b.address = '{addr}'
                  AND b.chain = 'ethereum' AND b.block_number <= t.block_number
                ORDER BY b.block_number DESC LIMIT 1) AS eth_balance
        FROM transfers t
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"], approx_cols=("eth_balance",))


def test_uint256_escape_hatch(spark, unipair_abi_or_none=None):
    """SURVEY §1.2 policy: Decimal(38,0) default nulls out >38-digit values;
    uint_as_string=True passes the full uint256 losslessly."""
    from apollo_spark.abi import Abi, abi_encode
    from apollo_spark.sources.logs import decoded_event_source

    abi = Abi.from_file("/root/reference/test/unipair.abi.json")
    swap = abi.events["Swap"]
    huge = 2**255 + 12345  # 77 digits
    small = 42
    rows = []
    for i, a0 in enumerate([huge, small]):
        rows.append(
            (
                "ethereum", 100 + i, f"0x{i:064x}", f"0x{i+7:064x}", 0, i,
                "0x" + "ab" * 20,
                [swap.topic0, "0x" + "11" * 32, "0x" + "22" * 32],
                bytearray(abi_encode(["uint256"] * 4, [a0, 0, 1, 0])),
            )
        )
    logs = spark.createDataFrame(
        rows,
        "chain string, block_number long, block_hash string, tx_hash string, "
        "tx_index int, log_index int, address string, topics array<string>, data binary",
    )
    dec = decoded_event_source(logs, swap, chain="ethereum").toPandas().sort_values("block_number")
    assert dec.iloc[0]["amount0In"] is None  # 77 digits -> NULL under Decimal(38,0)
    assert int(dec.iloc[1]["amount0In"]) == small
    s = (
        decoded_event_source(logs, swap, chain="ethereum", uint_as_string=True)
        .toPandas()
        .sort_values("block_number")
    )
    assert s.iloc[0]["amount0In"] == str(huge)  # lossless as string
    assert s.iloc[1]["amount0In"] == str(small)


def test_is_contract_enrichment(spark, catalog, evm_dir):
    """is_contract(addr): membership in the landed code-bearing-address dim
    (roadmap item apollo never shipped, ROADMAP.md:81). Booleans are KEPT in
    output — documented deviation from the reference's bool-drop quirk
    (output/output.go:64-77)."""
    con = _duck(evm_dir)
    wallet = con.sql("SELECT address FROM balances WHERE token_address IS NULL LIMIT 1").fetchone()[0]
    src = f"""
query contracts_flag {{
  chain = "ethereum"
  event Transfer {{
    abi = "erc20.abi.json"
    outputs = ["from", "to", "value"]
  }}
  save {{
    tx_hash = tx_hash
    emitter_is_contract = is_contract(contract_address)
    wallet_is_contract = is_contract("{wallet}")
  }}
}}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        f"""
        SELECT t.tx_hash,
               EXISTS (SELECT 1 FROM contracts c
                       WHERE c.chain = 'ethereum' AND c.address = t.contract_address) AS emitter_is_contract,
               EXISTS (SELECT 1 FROM contracts c
                       WHERE c.chain = 'ethereum' AND c.address = '{wallet}') AS wallet_is_contract
        FROM transfers t
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"])
    # the emitting erc20 token must actually be flagged true
    assert df.filter("emitter_is_contract").count() == df.count()
    assert df.filter("wallet_is_contract").count() == 0


def test_get_price_enrichment(spark, catalog, evm_dir):
    """get_price(token) at the row's block via as-of join on the landed
    prices table (the stub apollo left commented out, dsl/functions.go:105-121)."""
    con = _duck(evm_dir)
    token = con.sql("SELECT token_address FROM prices LIMIT 1").fetchone()[0]
    src = f"""
query priced {{
  chain = "ethereum"
  event Transfer {{
    abi = "erc20.abi.json"
    outputs = ["value"]
  }}
  save {{
    tx_hash = tx_hash
    px = get_price("{token}")
  }}
}}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        f"""
        SELECT t.tx_hash,
               (SELECT p.price_usd FROM prices p
                WHERE p.chain = 'ethereum' AND p.token_address = '{token}'
                  AND p.block_number <= t.block_number
                ORDER BY p.block_number DESC LIMIT 1) AS px
        FROM transfers t
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"], approx_cols=("px",))


def test_transaction_source_filters_match_oracle(spark, catalog, evm_dir):
    """Roadmap tier (ROADMAP.md:67-76): historical tx monitoring with
    declarative filters; predicates must also match a DuckDB oracle."""
    import duckdb

    from apollo_spark.sources.transactions import transaction_source

    con = duckdb.connect()
    con.execute(f"CREATE VIEW transactions AS SELECT * FROM '{evm_dir}/transactions.parquet'")
    to_addr = con.sql("SELECT to_address FROM transactions GROUP BY 1 ORDER BY count(*) DESC LIMIT 1").fetchone()[0]
    df = transaction_source(
        catalog, chain="ethereum", to_address=to_addr, min_value=1e18
    ).select("tx_hash", "from_address", "value")
    expected = con.sql(
        f"""
        SELECT tx_hash, from_address, value FROM transactions
        WHERE chain = 'ethereum' AND to_address = '{to_addr}' AND CAST(value AS DOUBLE) >= 1e18
        """
    )
    assert df.count() > 0
    assert_frames_match(df, expected, sort_cols=["tx_hash"])


def test_transaction_stream_pending_filter(spark, tmp_path):
    """Mempool mode: pending txs (null block) stream through the same filter
    tail; availableNow drain into memory sink."""
    import json

    from apollo_spark.sources.transactions import transaction_stream

    bridge = tmp_path / "txbridge"
    bridge.mkdir()
    rows = [
        {"chain": "ethereum", "block_number": None, "tx_hash": f"0x{i:064x}",
         "from_address": "0x" + "aa" * 20, "to_address": "0x" + "bb" * 20,
         "value": str(i * 10**18), "gas_used": 21000}
        for i in range(6)
    ]
    (bridge / "pending0.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    stream = transaction_stream(spark, str(bridge), to_address="0x" + "bb" * 20, min_value=2e18)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("pending_txs")
        .option("checkpointLocation", str(tmp_path / "ckpt_tx"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM pending_txs").collect()
    assert len(out) == 4  # values 2..5 ETH pass the >= 2 ETH filter
    assert all(r.block_number is None for r in out)


def test_template_expansion_runs_flagship(spark, catalog, evm_dir):
    """`template = "uniswapv2"` (ROADMAP.md:82-87) expands the standard event
    set; subset selection keeps the save shape single-event."""
    con = _duck(evm_dir)
    src = """
query tpl_swaps {
  chain = "arbitrum"
  contract "0x905dfcd5649217c42684f23958568e533c711aa3" {
    template = "uniswapv2"
    template_events = ["Swap"]
  }
  save {
    tx_hash = tx_hash
    eth_out = parse_decimals(amount0Out, 18)
  }
}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    c = schema.queries[0].contracts[0]
    assert c.abi_name == "unipair.abi.json"  # template default
    assert [e.name for e in c.events] == ["Swap"]
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        """
        SELECT tx_hash, CAST(amount0Out AS DOUBLE) / 1e18 AS eth_out
        FROM swap_events WHERE contract_address = '0x905dfcd5649217c42684f23958568e533c711aa3'
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"], approx_cols=("eth_out",))


def test_read_sql_source(spark, catalog, evm_dir):
    """read_sql (schema-ideas.hcl:124-126): ANSI SQL source over catalog
    views, sharing the DSL tail."""
    con = _duck(evm_dir)
    src = """
query sql_src {
  chain = "ethereum"
  source_sql = "SELECT contract_address, COUNT(*) AS n FROM swap_events GROUP BY contract_address"
  filter = [
    n > 0
  ]
  save {
    contract_address = contract_address
    n = n
  }
}
"""
    schema = parse_schema(src)
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        "SELECT contract_address, COUNT(*) AS n FROM swap_events GROUP BY 1 ORDER BY 1"
    )
    assert_frames_match(df, expected, sort_cols=["contract_address"])


def test_struct_event_decodes_to_json_column(spark):
    """Tuple-typed (struct) event params flow through the full Spark decode
    path as JSON strings — the composite escape hatch of the §1.2 type
    policy (go-ethereum supports struct events; apollo inherits them)."""
    import json as _json

    from apollo_spark.abi import Abi, abi_encode
    from apollo_spark.sources.logs import decoded_event_source

    abi = Abi.from_json(_json.dumps([
        {
            "type": "event",
            "name": "OrderPlaced",
            "inputs": [
                {"name": "maker", "type": "address", "indexed": True},
                {
                    "name": "order",
                    "type": "tuple",
                    "components": [
                        {"name": "id", "type": "uint256"},
                        {"name": "qty", "type": "uint32[2]"},
                        {"name": "note", "type": "string"},
                    ],
                },
            ],
        }
    ]))
    ev = abi.events["OrderPlaced"]
    maker = "0x" + "cd" * 20
    rows = [
        (
            "ethereum", 100 + i, f"0x{i:064x}", f"0x{i+7:064x}", 0, i,
            "0x" + "ab" * 20,
            [ev.topic0, "0x" + maker.removeprefix("0x").rjust(64, "0")],
            bytearray(abi_encode(["(uint256,uint32[2],string)"], [(i, [i, i + 1], f"n{i}")])),
        )
        for i in range(3)
    ]
    logs = spark.createDataFrame(
        rows,
        "chain string, block_number long, block_hash string, tx_hash string, "
        "tx_index int, log_index int, address string, topics array<string>, data binary",
    )
    dec = decoded_event_source(logs, ev, chain="ethereum").toPandas().sort_values("block_number")
    assert len(dec) == 3
    assert list(dec["maker"]) == [maker] * 3
    parsed = [_json.loads(v) for v in dec["order"]]
    assert parsed[1] == [1, [1, 2], "n1"]  # JSON renders the tuple faithfully


def test_uniswapv3_template_end_to_end(spark, catalog, evm_dir):
    """`template = "uniswapv3"` (reference ROADMAP.md:82-87): the public
    IUniswapV3Pool Swap signature (int256 amounts, signed tick) expands,
    decodes from raw logs, and matches the golden fixture table."""
    from apollo_spark.testing import ABI_FIXTURES_DIR

    con = _duck(evm_dir)
    src = """
query v3_swaps {
  chain = "polygon"
  contract "0x45dda9cb7c25131df268515131f647d726f50608" {
    template = "uniswapv3"
    template_events = ["Swap"]
  }
  save {
    tx_hash = tx_hash
    eth_delta = parse_decimals(amount0, 18)
    tick = tick
  }
}
"""
    schema = parse_schema(src, confdir=ABI_FIXTURES_DIR)
    c = schema.queries[0].contracts[0]
    assert c.abi_name == "univ3pool.abi.json"
    assert [e.name for e in c.events] == ["Swap"]
    assert c.events[0].outputs == ["amount0", "amount1", "sqrtPriceX96", "liquidity", "tick"]
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        """
        SELECT tx_hash, CAST(amount0 AS DOUBLE) / 1e18 AS eth_delta, CAST(tick AS BIGINT) AS tick
        FROM univ3_swap_events
        WHERE contract_address = '0x45dda9cb7c25131df268515131f647d726f50608'
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"], approx_cols=("eth_delta",))
    # signed decode really happened: both directions present
    neg = df.filter("eth_delta < 0").count()
    assert 0 < neg < df.count()


def test_protocol_template_expansion_shapes():
    """compound / aave / makerdao templates parse, resolve their fixture
    ABIs, and expand the documented event sets."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.dsl.templates import TEMPLATES
    from apollo_spark.testing import ABI_FIXTURES_DIR

    for tpl_name, want_first in (
        ("compound", "Mint"),
        ("aave", "Deposit"),
        ("makerdao", "NewCdp"),
    ):
        src = f"""
query t {{
  chain = "ethereum"
  contract "0x{'ab' * 20}" {{
    template = "{tpl_name}"
  }}
  save {{
    tx_hash = tx_hash
  }}
}}
"""
        schema = parse_schema(src, confdir=ABI_FIXTURES_DIR)
        c = schema.queries[0].contracts[0]
        assert c.abi_name == TEMPLATES[tpl_name]["abi"]
        assert [e.name for e in c.events] == list(TEMPLATES[tpl_name]["events"])
        assert c.events[0].name == want_first
        # every expanded event resolves against the ABI with its outputs
        assert c.abi is not None
        for ev in c.events:
            abi_ev = c.abi.events[ev.name]
            abi_names = {p.name for p in abi_ev.inputs}
            assert set(ev.outputs) <= abi_names, (tpl_name, ev.name)


def test_dsl_query_reads_tx_table_source(spark, tmp_path):
    """A TxTable directory is a first-class catalog source: DSL queries see
    the CURRENT committed snapshot (and only committed data)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog
    from apollo_spark.table_format import TxTable

    t = TxTable(str(tmp_path / "metrics"))
    t.write(spark.createDataFrame([(1, 10.0), (2, -3.0)], "k long, v double"))
    t.write(spark.createDataFrame([(3, 7.0)], "k long, v double"))  # append

    cat = Catalog(spark, tmp_path)
    assert cat.has("metrics") and "metrics" in cat.names()
    schema = parse_schema(
        """
        query tx_positive {
          chain = "ethereum"
          source_table = "metrics"
          filter = [ v > 0 ]
          save {
            k = k
            v = v
          }
          sort = [k]
        }
        """
    )
    out = compile_query(spark, cat, schema.queries[0], schema)
    assert [(r.k, r.v) for r in out.collect()] == [(1, 10.0), (3, 7.0)]
    # delete lands a new version; the catalog follows the snapshot
    t.delete_where(spark, "k = 1")
    out2 = compile_query(spark, cat, schema.queries[0], schema)
    assert [(r.k, r.v) for r in out2.collect()] == [(3, 7.0)]


def test_tx_context_enrichment(spark, catalog, evm_dir):
    """tx_sender()/tx_receiver(): full transaction context on decoded events
    (ROADMAP.md:78, planned-not-shipped in the reference) via the landed
    transactions table."""
    con = _duck(evm_dir)
    src = """
query tx_ctx {
  chain = "ethereum"
  event Transfer {
    abi = "erc20.abi.json"
    outputs = ["from", "to", "value"]
  }
  save {
    tx_hash = tx_hash
    sender = tx_sender()
    receiver = tx_receiver()
  }
}
"""
    schema = parse_schema(src, confdir="/root/reference/test")
    df = compile_query(spark, catalog, schema.queries[0], schema)
    expected = con.sql(
        """
        SELECT t.tx_hash, x.from_address AS sender, x.to_address AS receiver
        FROM transfers t
        LEFT JOIN (SELECT DISTINCT ON (chain, tx_hash) chain, tx_hash, from_address, to_address
                   FROM transactions ORDER BY chain, tx_hash) x
          ON x.chain = 'ethereum' AND x.tx_hash = t.tx_hash
        """
    )
    assert_frames_match(df, expected, sort_cols=["tx_hash"])
    # the fixture lands every log's transaction: context must actually resolve
    assert df.filter("sender IS NULL").count() == 0


def test_cross_chain_address_monitoring(spark, catalog, evm_dir):
    """ROADMAP.md:80 'Cross-chain address monitoring': one loop query watches
    the same wallet's outgoing transactions on every chain — loop expansion x
    transactions source x filter, a pure composition of shipped features."""
    con = _duck(evm_dir)
    wallet, = con.sql(
        """SELECT from_address FROM transactions
           GROUP BY 1 HAVING COUNT(DISTINCT chain) >= 2
           ORDER BY COUNT(*) DESC, from_address LIMIT 1"""
    ).fetchone()
    src = f"""
loop {{
  items = ["ethereum", "arbitrum"]
  query watched {{
    chain = item
    source_table = "transactions"
    filter = [
      from_address == "{wallet}",
      chain == item
    ]
    save {{
      chain = chain
      tx_hash = tx_hash
      to_address = to_address
    }}
  }}
}}
"""
    from apollo_spark.pipeline import compile_schema

    schema = parse_schema(src)
    out = compile_schema(spark, catalog, schema)["watched"]
    expected = con.sql(
        f"""SELECT chain, tx_hash, to_address FROM transactions
            WHERE from_address = '{wallet}' AND chain IN ('ethereum', 'arbitrum')"""
    )
    assert_frames_match(out, expected, sort_cols=["chain", "tx_hash"])
    assert out.select("chain").distinct().count() == 2
