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
