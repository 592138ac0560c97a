"""ABI codec tests: keccak vectors, round-trip encode/decode, HandleLog rules
(/root/reference/chainservice/events.go:410-484)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from apollo_spark.abi import (
    Abi,
    AbiEvent,
    AbiParam,
    abi_decode,
    abi_encode,
    decode_log,
    decode_return,
    encode_calldata,
    keccak256,
    to_checksum_address,
)

UNIPAIR = Abi.from_file("/root/reference/test/unipair.abi.json")
ERC20 = Abi.from_file("/root/reference/test/erc20.abi.json")


def test_keccak_known_vectors():
    assert keccak256(b"").hex() == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert (
        keccak256(b"Transfer(address,address,uint256)").hex()
        == "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    # > 1 rate block (136 bytes) exercises multi-block absorb
    assert keccak256(b"a" * 200) != keccak256(b"a" * 199)


def test_swap_topic0_matches_published_hash():
    assert UNIPAIR.events["Swap"].topic0 == "0xd78ad95fa46c994b6551d0da85fc275fe613ce37657fb8d5e3d130840159d822"


def test_checksum_address_eip55():
    assert to_checksum_address("0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed") == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed"


def test_selector():
    # balanceOf(address) -> 0x70a08231 (public well-known selector)
    assert ERC20.functions["balanceOf"].selector.hex() == "70a08231"


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=2**256 - 1),
    b=st.integers(min_value=-(2**255), max_value=2**255 - 1),
    flag=st.booleans(),
    addr=st.binary(min_size=20, max_size=20),
)
def test_roundtrip_static(a, b, flag, addr):
    types = ["uint256", "int256", "bool", "address"]
    vals = [a, b, flag, "0x" + addr.hex()]
    out = abi_decode(types, abi_encode(types, vals))
    assert out == vals


@settings(max_examples=100, deadline=None)
@given(s=st.text(max_size=120), arr=st.lists(st.integers(min_value=0, max_value=2**128), max_size=8))
def test_roundtrip_dynamic(s, arr):
    types = ["string", "uint256[]", "uint8"]
    vals = [s, arr, 7]
    out = abi_decode(types, abi_encode(types, vals))
    assert out == vals


def test_decode_log_drop_rules():
    ev = UNIPAIR.events["Swap"]
    data = abi_encode(["uint256"] * 4, [1, 2, 3, 4])
    topics = [ev.topic0, "0x" + "11" * 32, "0x" + "22" * 32]
    out = decode_log(ev, topics, data)
    assert out is not None and out["amount0In"] == 1 and out["amount1Out"] == 4
    # empty data -> dropped (events.go:411-413)
    assert decode_log(ev, topics, b"") is None
    # missing indexed topic -> dropped (events.go:415-417)
    assert decode_log(ev, topics[:2], data) is None


def test_decode_log_leftpad_retry():
    """Short payload retried as LeftPadBytes(data, 64) (events.go:447-455)."""
    ev = AbiEvent("E", (AbiParam("x", "uint256"), AbiParam("y", "uint256")))
    short = (42).to_bytes(32, "big")  # only one word for two params
    out = decode_log(ev, [ev.topic0], short)
    assert out == {"x": 0, "y": 42}  # zero-padded left, value lands in word 2


def test_calldata_and_return():
    fn = UNIPAIR.functions["getReserves"]
    assert encode_calldata(fn, []) == fn.selector
    ret = abi_encode(["uint112", "uint112", "uint32"], [10**21, 2 * 10**12, 1650000000])
    out = decode_return(fn, ret)
    assert out == {"_reserve0": 10**21, "_reserve1": 2 * 10**12, "_blockTimestampLast": 1650000000}


def test_single_unnamed_return_positional():
    """matchABIValue single-output rule (chainservice/utils.go:24-36)."""
    from apollo_spark.abi import AbiFunction

    fn = AbiFunction("totalSupply", (), (AbiParam("", "uint256"),))
    out = decode_return(fn, abi_encode(["uint256"], [999]))
    assert out == {"totalSupply": 999}
