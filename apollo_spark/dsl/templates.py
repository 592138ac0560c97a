"""Contract templates — apollo roadmap feature (ROADMAP.md:82-87,
schema-ideas.hcl:28-53): `template = "uniswapv2"` on a contract expands to
the protocol's standard event set so users don't re-declare well-known ABIs.

A template fixes the default ABI file name and the events (with their
canonical output lists); the schema can still add/override events next to
the template."""

from __future__ import annotations

TEMPLATES: dict[str, dict] = {
    "uniswapv2": {
        "abi": "unipair.abi.json",
        "events": {
            "Swap": ["amount0In", "amount1In", "amount0Out", "amount1Out"],
            "Sync": ["reserve0", "reserve1"],
            "Mint": ["amount0", "amount1"],
            "Burn": ["amount0", "amount1"],
        },
    },
    "erc20": {
        "abi": "erc20.abi.json",
        "events": {
            "Transfer": ["from", "to", "value"],
            "Approval": ["owner", "spender", "value"],
        },
    },
    # remaining ROADMAP.md:82-87 protocol set; ABIs land under
    # tests/fixtures/abis (public interface signatures, hand-written)
    "uniswapv3": {
        "abi": "univ3pool.abi.json",
        "events": {
            "Swap": ["amount0", "amount1", "sqrtPriceX96", "liquidity", "tick"],
            "Mint": ["amount", "amount0", "amount1"],
            "Burn": ["amount", "amount0", "amount1"],
            "Collect": ["amount0", "amount1"],
            "Initialize": ["sqrtPriceX96", "tick"],
        },
    },
    "compound": {
        "abi": "ctoken.abi.json",
        "events": {
            "Mint": ["minter", "mintAmount", "mintTokens"],
            "Redeem": ["redeemer", "redeemAmount", "redeemTokens"],
            "Borrow": ["borrower", "borrowAmount", "accountBorrows", "totalBorrows"],
            "RepayBorrow": ["payer", "borrower", "repayAmount", "accountBorrows", "totalBorrows"],
            "LiquidateBorrow": ["liquidator", "borrower", "repayAmount", "cTokenCollateral", "seizeTokens"],
        },
    },
    "aave": {
        "abi": "aave_lendingpool.abi.json",
        "events": {
            "Deposit": ["reserve", "user", "onBehalfOf", "amount"],
            "Withdraw": ["reserve", "user", "to", "amount"],
            "Borrow": ["reserve", "user", "onBehalfOf", "amount", "borrowRate"],
            "Repay": ["reserve", "user", "repayer", "amount"],
            "FlashLoan": ["target", "initiator", "asset", "amount", "premium"],
        },
    },
    "makerdao": {
        "abi": "makerdao_cdpmanager.abi.json",
        "events": {
            "NewCdp": ["usr", "own", "cdp"],
        },
    },
}


def cross_chain_monitor_hcl(
    address: str,
    chains: list[str],
    abi: str = "erc20.abi.json",
    event: str = "Transfer",
    from_param: str = "from",
    to_param: str = "to",
    value_param: str = "value",
    query_name: str = "cross_chain_monitor",
) -> str:
    """Cross-chain address monitoring (reference ROADMAP.md:79, unshipped
    there) as a canned schema: one ``loop`` over the chains, a GLOBAL
    (address-unfiltered) event scan per chain, filtered to logs where the
    watched address appears on either side. Every loop frame shares the
    query NAME, so the DSL's loop-union semantics publish ONE frame with a
    per-row ``chain`` column — the exact monitoring table a watcher tails.

    Composition over machinery: the loop block (Q2), global-event source
    (S2), ``||`` filter (F1) and context save are all certified pieces;
    this helper just writes the schema a user would otherwise hand-compose.
    Use ``parse_schema(cross_chain_monitor_hcl(...), confdir=...)`` and
    compile as usual (batch or realtime)."""
    addr = address.lower()
    chains_hcl = ", ".join(f'"{c}"' for c in chains)
    return f"""
loop {{
  items = [{chains_hcl}]
  query {query_name} {{
    chain = item
    event {event} {{
      abi = "{abi}"
      outputs = ["{from_param}", "{to_param}", "{value_param}"]
    }}
    filter = [
      {from_param} == "{addr}" || {to_param} == "{addr}"
    ]
    save {{
      chain = item
      block = blocknumber
      tx = tx_hash
      token = contract_address
      sender = {from_param}
      receiver = {to_param}
      amount = {value_param}
    }}
  }}
}}
"""
