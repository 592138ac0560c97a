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


# ---------------------------------------------------- tuples / nested arrays


def test_abi_spec_vector_f():
    """Exact bytes from the Solidity ABI spec's worked example:
    f(uint256 0x123, uint32[] [0x456,0x789], bytes10 '1234567890',
      bytes 'Hello, world!')."""
    from apollo_spark.abi import abi_decode, abi_encode

    expected = bytes.fromhex(
        "0000000000000000000000000000000000000000000000000000000000000123"
        "0000000000000000000000000000000000000000000000000000000000000080"
        "3132333435363738393000000000000000000000000000000000000000000000"
        "00000000000000000000000000000000000000000000000000000000000000e0"
        "0000000000000000000000000000000000000000000000000000000000000002"
        "0000000000000000000000000000000000000000000000000000000000000456"
        "0000000000000000000000000000000000000000000000000000000000000789"
        "000000000000000000000000000000000000000000000000000000000000000d"
        "48656c6c6f2c20776f726c642100000000000000000000000000000000000000"
    )
    types = ["uint256", "uint32[]", "bytes10", "bytes"]
    vals = [0x123, [0x456, 0x789], "0x31323334353637383930", "0x48656c6c6f2c20776f726c6421"]
    assert abi_encode(types, vals) == expected
    assert abi_decode(types, expected) == vals


def test_abi_spec_vector_g_nested_dynamic():
    """Spec example g(uint256[][],string[]) with ([[1,2],[3]],
    ['one','two','three']) — nested dynamic arrays, previously unsupported."""
    from apollo_spark.abi import abi_decode, abi_encode

    expected = bytes.fromhex(
        "0000000000000000000000000000000000000000000000000000000000000040"
        "0000000000000000000000000000000000000000000000000000000000000140"
        "0000000000000000000000000000000000000000000000000000000000000002"
        "0000000000000000000000000000000000000000000000000000000000000040"
        "00000000000000000000000000000000000000000000000000000000000000a0"
        "0000000000000000000000000000000000000000000000000000000000000002"
        "0000000000000000000000000000000000000000000000000000000000000001"
        "0000000000000000000000000000000000000000000000000000000000000002"
        "0000000000000000000000000000000000000000000000000000000000000001"
        "0000000000000000000000000000000000000000000000000000000000000003"
        "0000000000000000000000000000000000000000000000000000000000000003"
        "0000000000000000000000000000000000000000000000000000000000000060"
        "00000000000000000000000000000000000000000000000000000000000000a0"
        "00000000000000000000000000000000000000000000000000000000000000e0"
        "0000000000000000000000000000000000000000000000000000000000000003"
        "6f6e650000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000003"
        "74776f0000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000005"
        "7468726565000000000000000000000000000000000000000000000000000000"
    )
    types = ["uint256[][]", "string[]"]
    vals = [[[1, 2], [3]], ["one", "two", "three"]]
    assert abi_encode(types, vals) == expected
    assert abi_decode(types, expected) == vals


def test_tuple_roundtrip_and_static_layout():
    from apollo_spark.abi import abi_decode, abi_encode

    # static tuple: multi-word inline layout, no pointer
    types = ["(uint256,address,bool)", "uint8"]
    vals = [(42, "0x" + "ab" * 20, True), 7]
    blob = abi_encode(types, vals)
    assert len(blob) == 4 * 32  # 3 inline tuple words + trailing uint8
    assert abi_decode(types, blob) == vals
    # dynamic tuple (contains string) + fixed array of tuples
    types2 = ["(uint256,string)", "(uint32,uint32)[2]"]
    vals2 = [(9, "hello world"), [(1, 2), (3, 4)]]
    assert abi_decode(types2, abi_encode(types2, vals2)) == vals2
    # tuples nested in dynamic arrays of tuples
    types3 = ["(address,(uint256,bytes))[]"]
    vals3 = [[("0x" + "01" * 20, (5, "0xdead")), ("0x" + "02" * 20, (6, "0xbeef"))]]
    assert abi_decode(types3, abi_encode(types3, vals3)) == vals3
    # fixed array of static elements: no length word
    types4 = ["uint256[3]"]
    blob4 = abi_encode(types4, [[10, 20, 30]])
    assert len(blob4) == 3 * 32
    assert abi_decode(types4, blob4) == [[10, 20, 30]]


def test_tuple_abi_json_canonicalization_and_event_decode():
    """ABI JSON with components: signature uses the canonical (t1,t2) form
    (topic0 must hash it) and the decoder handles a struct-carrying event."""
    import json

    from apollo_spark.abi import Abi, abi_encode, decode_log, keccak256

    abi = Abi.from_json(json.dumps([
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
                        {"name": "parts", "type": "uint32[2]"},
                        {"name": "note", "type": "string"},
                    ],
                },
            ],
        }
    ]))
    ev = abi.events["OrderPlaced"]
    assert ev.signature == "OrderPlaced(address,(uint256,uint32[2],string))"
    assert ev.topic0 == "0x" + keccak256(ev.signature.encode()).hex()
    order = (77, [1, 2], "limit")
    data = abi_encode(["(uint256,uint32[2],string)"], [order])
    maker = "0x" + "cd" * 20
    out = decode_log(ev, [ev.topic0, "0x" + maker.removeprefix("0x").rjust(64, "0")], data)
    assert out == {"maker": maker, "order": order}


def test_indexed_dynamic_param_yields_topic_hash():
    """Indexed string/array/tuple params store keccak(encoding) in the topic;
    the decoder must surface the hash, not attempt (impossible) recovery."""
    import json

    from apollo_spark.abi import Abi, abi_encode, decode_log

    abi = Abi.from_json(json.dumps([
        {
            "type": "event",
            "name": "Named",
            "inputs": [
                {"name": "name", "type": "string", "indexed": True},
                {"name": "v", "type": "uint256"},
            ],
        }
    ]))
    ev = abi.events["Named"]
    topic_hash = "0x" + "7a" * 32
    out = decode_log(ev, [ev.topic0, topic_hash], abi_encode(["uint256"], [5]))
    assert out == {"name": topic_hash, "v": 5}


# ----------------------------------------------------- property-based codec


def test_abi_codec_roundtrip_property():
    """decode(encode(v)) == v over randomized type trees: elementary types,
    tuples, fixed/dynamic arrays, nested to depth 3."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apollo_spark.abi import abi_decode, abi_encode

    elementary = st.sampled_from(["uint256", "uint32", "int64", "address", "bool", "bytes4", "bytes", "string"])

    def extend(children):
        return st.one_of(
            # tuple of 1-3 child types
            st.lists(children, min_size=1, max_size=3).map(lambda ts: f"({','.join(ts)})"),
            # fixed or dynamic array of a child type
            st.tuples(children, st.sampled_from(["[]", "[1]", "[2]", "[3]"])).map(lambda p: p[0] + p[1]),
        )

    types = st.recursive(elementary, extend, max_leaves=6)

    def value_for(t: str):
        if t.endswith("]"):
            o = t.rindex("[")
            inside, elem = t[o + 1 : -1], t[:o]
            n = st.integers(0, 3) if inside == "" else st.just(int(inside))
            return n.flatmap(lambda k: st.lists(value_for(elem), min_size=k, max_size=k))
        if t.startswith("("):
            comps, depth, start = [], 0, 0
            inner = t[1:-1]
            for i, ch in enumerate(inner):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    comps.append(inner[start:i])
                    start = i + 1
            comps.append(inner[start:])
            return st.tuples(*[value_for(c) for c in comps])
        if t.startswith("uint"):
            return st.integers(0, 2 ** int(t[4:]) - 1)
        if t.startswith("int"):
            bits = int(t[3:])
            return st.integers(-(2 ** (bits - 1)), 2 ** (bits - 1) - 1)
        if t == "address":
            return st.binary(min_size=20, max_size=20).map(lambda b: "0x" + b.hex())
        if t == "bool":
            return st.booleans()
        if t == "bytes":
            return st.binary(min_size=0, max_size=40).map(lambda b: "0x" + b.hex())
        if t.startswith("bytes"):
            n = int(t[5:])
            return st.binary(min_size=n, max_size=n).map(lambda b: "0x" + b.hex())
        if t == "string":
            return st.text(max_size=20).map(lambda s: s.encode("utf-8", "replace").decode("utf-8", "replace"))
        raise AssertionError(t)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(types, min_size=1, max_size=3).flatmap(
        lambda ts: st.tuples(st.just(ts), st.tuples(*[value_for(t) for t in ts]))
    ))
    def roundtrip(case):
        ts, vals = case
        vals = list(vals)
        blob = abi_encode(ts, vals)
        assert len(blob) % 32 == 0
        decoded = abi_decode(ts, blob)

        def norm(v):
            if isinstance(v, (list, tuple)):
                return [norm(x) for x in v]
            return v

        assert norm(decoded) == norm(vals)

    roundtrip()
