"""Etherscan-style ABI fetch (reference ROADMAP.md:57 — `apollo abi fetch`).

Downloads a verified contract's ABI from an Etherscan-compatible API and
lands it as ``<address>.abi.json`` next to a schema, so a ``contract`` block
can reference it without hand-copying. The HTTP layer is injectable (the
test/offline path passes a fake ``fetcher``); the live default uses stdlib
urllib — no client library needed for one GET.

    python -m apollo_spark.abi_fetch --address 0xdac1...ec7 --out ./conf \
        --api-url https://api.etherscan.io/api --api-key $ETHERSCAN_KEY
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Callable
from urllib.parse import urlencode


class AbiFetchError(Exception):
    pass


def _default_fetcher(url: str) -> bytes:
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as r:  # noqa: S310 — https API URL built below
        return r.read()


def fetch_abi(
    address: str,
    api_url: str = "https://api.etherscan.io/api",
    api_key: str = "",
    fetcher: Callable[[str], bytes] | None = None,
) -> list:
    """Return the parsed ABI (list of items) for a verified contract.

    Speaks the Etherscan envelope: ``{"status": "1", "result": "<json>"}``
    with the ABI double-encoded as a string; ``status: "0"`` carries the
    error text in ``result`` (e.g. unverified contract)."""
    address = address.lower()
    if not (address.startswith("0x") and len(address) == 42):
        raise AbiFetchError(f"not an address: {address!r}")
    q = {"module": "contract", "action": "getabi", "address": address}
    if api_key:
        q["apikey"] = api_key
    raw = (fetcher or _default_fetcher)(f"{api_url}?{urlencode(q)}")
    try:
        envelope = json.loads(raw)
    except json.JSONDecodeError as e:
        raise AbiFetchError(f"non-JSON response: {raw[:120]!r}") from e
    if not isinstance(envelope, dict):
        raise AbiFetchError(f"unexpected response shape: {type(envelope).__name__}")
    if str(envelope.get("status")) != "1":
        raise AbiFetchError(f"API error for {address}: {envelope.get('result')}")
    abi = json.loads(envelope["result"])
    if not isinstance(abi, list):
        raise AbiFetchError(f"unexpected ABI payload type {type(abi).__name__}")
    return abi


def fetch_and_land(
    address: str,
    out_dir: str | Path,
    api_url: str = "https://api.etherscan.io/api",
    api_key: str = "",
    fetcher: Callable[[str], bytes] | None = None,
) -> Path:
    """Fetch + write ``<out_dir>/<address>.abi.json``; validates the ABI
    parses through our codec (events usable in schemas) before writing."""
    from apollo_spark.abi import Abi

    abi = fetch_abi(address, api_url=api_url, api_key=api_key, fetcher=fetcher)
    Abi.from_json(json.dumps(abi))  # raises if the item shapes are unusable
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{address.lower()}.abi.json"
    path.write_text(json.dumps(abi, indent=2) + "\n")
    return path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser("apollo_spark.abi_fetch", description=__doc__)
    p.add_argument("--address", required=True)
    p.add_argument("--out", required=True, help="directory to land <address>.abi.json")
    p.add_argument("--api-url", default="https://api.etherscan.io/api")
    p.add_argument("--api-key", default="")
    args = p.parse_args(argv)
    try:
        path = fetch_and_land(args.address, args.out, api_url=args.api_url, api_key=args.api_key)
    except AbiFetchError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(str(path))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
