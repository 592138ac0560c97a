# Flagship walkthrough schema — the composed apollo surface in one file.
# README.md "Flagship demo" has the exact commands; tests/test_flagship_demo.py
# runs this end-to-end through `python -m apollo_spark` in a subprocess.
#
# Pieces exercised (SURVEY.md §2 ids):
#   Q2 loop        — one query body expanded over two pair contracts,
#                    published as ONE union frame with a per-row `pair` col
#   S1 events      — historical contract-event scan (Swap) per pair
#   S7 methods     — event-attached getReserves at the event's block
#   P1 transform   — parse_decimals fixed-point decoding
#   F1 filter      — conjunctive WHERE on a transformed column
#   P2 save        — projection incl. the loop context var
#   O2/O3/O4 sinks — CSV + JDBC + TxTable fan-out (CLI flags)

loop {
  items = [
    "0x905dfcd5649217c42684f23958568e533c711aa3",
    "0x5ab45cea583b924d8cb1369d611afd228b52bf74",
  ]

  query pair_prices {
    chain = "arbitrum"

    contract {
      address = item
      abi = "unipair.abi.json"

      event Swap {
        outputs = ["amount1In", "amount0Out"]

        method getReserves {
          outputs = ["_reserve0", "_reserve1"]
          block_offset = 0
        }
      }

      transform {
        usdc_sold = parse_decimals(amount1In, 6)
        eth_bought = parse_decimals(amount0Out, 18)
      }
    }

    filter = [ eth_bought != 0 ]

    save {
      pair = item
      block = blocknumber
      tx_hash = tx_hash
      price = usdc_sold / eth_bought
      reserve0 = _reserve0
      reserve1 = _reserve1
    }
  }
}
