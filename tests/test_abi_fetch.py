"""Etherscan-style ABI fetch subcommand (reference ROADMAP.md:57) with an
injectable fetcher — the offline-container test path."""

from __future__ import annotations

import json

import pytest

from apollo_spark.abi_fetch import AbiFetchError, fetch_abi, fetch_and_land, main

USDT = "0xdAC17F958D2ee523a2206206994597C13D831ec7"
TRANSFER_ABI = [
    {
        "anonymous": False,
        "name": "Transfer",
        "type": "event",
        "inputs": [
            {"indexed": True, "name": "from", "type": "address"},
            {"indexed": True, "name": "to", "type": "address"},
            {"indexed": False, "name": "value", "type": "uint256"},
        ],
    }
]


def _ok_fetcher(calls):
    def fetch(url: str) -> bytes:
        calls.append(url)
        return json.dumps({"status": "1", "message": "OK", "result": json.dumps(TRANSFER_ABI)}).encode()

    return fetch


def test_fetch_abi_parses_envelope_and_builds_url():
    calls: list[str] = []
    abi = fetch_abi(USDT, api_key="K", fetcher=_ok_fetcher(calls))
    assert abi == TRANSFER_ABI
    (url,) = calls
    assert url.startswith("https://api.etherscan.io/api?")
    assert "module=contract" in url and "action=getabi" in url
    assert USDT.lower() in url and "apikey=K" in url


def test_fetch_and_land_writes_loadable_abi(tmp_path):
    path = fetch_and_land(USDT, tmp_path, fetcher=_ok_fetcher([]))
    assert path.name == f"{USDT.lower()}.abi.json"
    from apollo_spark.abi import Abi

    abi = Abi.from_file(path)
    # the landed file is schema-usable: topic0 derives from the real signature
    assert abi.events["Transfer"].topic0 == (
        "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )


def test_fetch_abi_error_paths():
    def unverified(url: str) -> bytes:
        return json.dumps({"status": "0", "result": "Contract source code not verified"}).encode()

    with pytest.raises(AbiFetchError, match="not verified"):
        fetch_abi(USDT, fetcher=unverified)
    with pytest.raises(AbiFetchError, match="not an address"):
        fetch_abi("0x123")
    with pytest.raises(AbiFetchError, match="non-JSON"):
        fetch_abi(USDT, fetcher=lambda u: b"<html>rate limited</html>")


def test_cli_main(tmp_path, monkeypatch, capsys):
    import apollo_spark.abi_fetch as mod

    monkeypatch.setattr(mod, "_default_fetcher", _ok_fetcher([]))
    rc = main(["--address", USDT, "--out", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert out.endswith(".abi.json") and json.loads(open(out).read()) == TRANSFER_ABI
