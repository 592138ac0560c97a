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
}
