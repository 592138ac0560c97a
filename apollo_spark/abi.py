"""Minimal EVM ABI toolkit: keccak-256, event topics, log decode, calldata.

Replaces the reference's go-ethereum ABI usage
(/root/reference/generate/callmsg.go:19-65, chainservice/events.go:410-484,
chainservice/utils.go:24-36). Pure Python from the public Ethereum contract
ABI spec and the Keccak reference algorithm — no external deps. keccak runs
only at plan-build time (one hash per event/method signature), so speed is
irrelevant; decode runs inside Arrow-batched pandas UDFs.

Supported types cover go-ethereum's full ABI surface (the reference inherits
it): address, uintN/intN, bool, bytesN, bytes, string, tuples (structs,
declared via ``components`` and canonicalized to ``(t1,t2,...)``), and
arbitrarily nested fixed ``T[k]`` / dynamic ``T[]`` arrays of any of these.
Tuple values decode to python tuples; the Spark type policy renders them as
JSON strings (SURVEY §1.2 escape-hatch convention).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

# ------------------------------------------------------------------ keccak256

_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_KECCAK_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_MASK = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[list[int]]) -> None:
    for rnd in range(24):
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(state[x][y], _KECCAK_ROT[x][y])
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        state[0][0] ^= _KECCAK_RC[rnd]


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    state = [[0] * 5 for _ in range(5)]
    padded = bytearray(data)
    padded.append(0x01)  # Keccak (pre-SHA3) domain padding, as Ethereum uses
    while len(padded) % rate:
        padded.append(0x00)
    padded[-1] |= 0x80
    for block_off in range(0, len(padded), rate):
        block = padded[block_off : block_off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : i * 8 + 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f(state)
    out = bytearray()
    for i in range(4):  # 32 bytes from the first 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def to_checksum_address(addr: str) -> str:
    """EIP-55 checksum (go-ethereum common.Address.String() rendering)."""
    a = addr.lower().removeprefix("0x")
    h = keccak256(a.encode()).hex()
    return "0x" + "".join(c.upper() if int(h[i], 16) >= 8 else c for i, c in enumerate(a))


def normalize_address(addr: str) -> str:
    """Engine-wide address normal form: lowercase 0x-hex. (Deviation from the
    reference's EIP-55 rendering, documented in SURVEY §1.2 fixture notes.)"""
    a = addr.lower()
    return a if a.startswith("0x") else "0x" + a


# ----------------------------------------------------------------- ABI model


@dataclass(frozen=True)
class AbiParam:
    name: str
    type: str
    indexed: bool = False


@dataclass(frozen=True)
class AbiEvent:
    name: str
    inputs: tuple[AbiParam, ...]

    @property
    def signature(self) -> str:
        return f"{self.name}({','.join(p.type for p in self.inputs)})"

    @property
    def topic0(self) -> str:
        """Event signature hash (generate/callmsg.go:56-65)."""
        return "0x" + keccak256(self.signature.encode()).hex()

    @property
    def indexed_inputs(self) -> tuple[AbiParam, ...]:
        return tuple(p for p in self.inputs if p.indexed)

    @property
    def data_inputs(self) -> tuple[AbiParam, ...]:
        return tuple(p for p in self.inputs if not p.indexed)


@dataclass(frozen=True)
class AbiFunction:
    name: str
    inputs: tuple[AbiParam, ...]
    outputs: tuple[AbiParam, ...]

    @property
    def signature(self) -> str:
        return f"{self.name}({','.join(p.type for p in self.inputs)})"

    @property
    def selector(self) -> bytes:
        return keccak256(self.signature.encode())[:4]


@dataclass(frozen=True)
class Abi:
    events: dict[str, AbiEvent]
    functions: dict[str, AbiFunction]

    @classmethod
    def from_json(cls, text: str) -> "Abi":
        raw = json.loads(text)
        if isinstance(raw, dict):  # some ABIs ship as {"abi": [...]}
            raw = raw.get("abi", [])
        events: dict[str, AbiEvent] = {}
        functions: dict[str, AbiFunction] = {}

        def canon(p: dict) -> str:
            """Canonical type string: 'tuple...' + components become
            '(t1,t2,...)...' — the form signature hashing requires
            (solidity ABI spec; go-ethereum abi.NewType does the same)."""
            t = p["type"]
            if t.startswith("tuple"):
                inner = ",".join(canon(c) for c in p.get("components", []))
                return f"({inner})" + t[len("tuple") :]
            return t

        for item in raw:
            kind = item.get("type")
            if kind == "event":
                ev = AbiEvent(
                    item["name"],
                    tuple(
                        AbiParam(p.get("name", ""), canon(p), bool(p.get("indexed")))
                        for p in item.get("inputs", [])
                    ),
                )
                events[ev.name] = ev
            elif kind == "function":
                fn = AbiFunction(
                    item["name"],
                    tuple(AbiParam(p.get("name", ""), canon(p)) for p in item.get("inputs", [])),
                    tuple(AbiParam(p.get("name", ""), canon(p)) for p in item.get("outputs", [])),
                )
                functions[fn.name] = fn
        return cls(events, functions)

    @classmethod
    def from_file(cls, path: str | Path) -> "Abi":
        return cls.from_json(Path(path).read_text())


# ------------------------------------------------------------- encode/decode


@dataclass(frozen=True)
class _Type:
    """Parsed ABI type tree: elementary base or tuple components, plus array
    suffixes innermost-first (``None`` = dynamic ``[]``, int = fixed ``[k]``)."""

    base: str
    arr: tuple[int | None, ...] = ()
    components: tuple["_Type", ...] = ()


def _parse_type(typ: str) -> _Type:
    arr: list[int | None] = []
    while typ.endswith("]"):
        o = typ.rindex("[")
        inside = typ[o + 1 : -1]
        arr.insert(0, None if inside == "" else int(inside))
        typ = typ[:o]
    if typ.startswith("("):
        if not typ.endswith(")"):
            raise ValueError(f"malformed tuple type {typ!r}")
        comps: list[_Type] = []
        depth, start, inner = 0, 0, typ[1:-1]
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                comps.append(_parse_type(inner[start:i]))
                start = i + 1
        if inner[start:]:
            comps.append(_parse_type(inner[start:]))
        return _Type("tuple", tuple(arr), tuple(comps))
    return _Type(typ, tuple(arr))


def _type_is_dynamic(t: _Type) -> bool:
    if any(k is None for k in t.arr):
        return True
    if t.base in ("bytes", "string"):
        return True
    if t.base == "tuple":
        return any(_type_is_dynamic(c) for c in t.components)
    return False


def _static_size(t: _Type) -> int:
    """Encoded byte size of a STATIC type (head/tail spec: static tuples and
    fixed arrays occupy multiple 32-byte words inline)."""
    if t.arr:
        inner = _Type(t.base, t.arr[:-1], t.components)
        k = t.arr[-1]
        assert k is not None
        return k * _static_size(inner)
    if t.base == "tuple":
        return sum(_static_size(c) for c in t.components)
    return 32


def _decode_static(typ: str, word: bytes):
    """Single-word elementary decode (also used for indexed topics)."""
    if typ == "address":
        return normalize_address("0x" + word[-20:].hex())
    if typ.startswith("uint"):
        return int.from_bytes(word, "big")
    if typ.startswith("int"):
        return int.from_bytes(word, "big", signed=True)
    if typ == "bool":
        return bool(int.from_bytes(word, "big"))
    if typ.startswith("bytes"):  # bytesN
        n = int(typ[5:])
        return "0x" + word[:n].hex()
    raise ValueError(f"unsupported static ABI type {typ!r}")


def _decode_at(t: _Type, data: bytes, pos: int):
    """Decode one value whose encoding starts inline at ``pos`` (static) —
    callers resolve dynamic pointers before descending."""
    if t.arr:
        inner = _Type(t.base, t.arr[:-1], t.components)
        k = t.arr[-1]
        if k is None:  # dynamic array tail: len word + element area
            n = int.from_bytes(data[pos : pos + 32], "big")
            return _decode_seq(inner, data, pos + 32, n)
        return _decode_seq(inner, data, pos, k)
    if t.base == "tuple":
        return tuple(_decode_seq_hetero(t.components, data, pos))
    if t.base == "string":
        n = int.from_bytes(data[pos : pos + 32], "big")
        return data[pos + 32 : pos + 32 + n].decode("utf-8", errors="replace")
    if t.base == "bytes":
        n = int.from_bytes(data[pos : pos + 32], "big")
        return "0x" + data[pos + 32 : pos + 32 + n].hex()
    word = data[pos : pos + 32]
    if len(word) < 32:
        raise ValueError("ABI data too short")
    return _decode_static(t.base, word)


def _decode_seq(elem: _Type, data: bytes, base: int, n: int) -> list:
    """n same-typed elements starting at ``base``: inline when static,
    head-pointers (relative to ``base``) when dynamic."""
    out = []
    if _type_is_dynamic(elem):
        for j in range(n):
            off = int.from_bytes(data[base + j * 32 : base + (j + 1) * 32], "big")
            out.append(_decode_at(elem, data, base + off))
    else:
        size = _static_size(elem)
        for j in range(n):
            out.append(_decode_at(elem, data, base + j * size))
    return out


def _decode_seq_hetero(types: tuple[_Type, ...], data: bytes, base: int) -> list:
    """Heterogeneous head/tail sequence (tuple bodies, top-level blobs):
    static members inline, dynamic members behind base-relative pointers."""
    out = []
    pos = base
    for t in types:
        if _type_is_dynamic(t):
            off = int.from_bytes(data[pos : pos + 32], "big")
            out.append(_decode_at(t, data, base + off))
            pos += 32
        else:
            out.append(_decode_at(t, data, pos))
            pos += _static_size(t)
    return out


def abi_decode(types: list[str], data: bytes) -> list:
    """Decode a head/tail ABI blob into python values (full go-ethereum type
    surface: tuples, fixed + dynamic arrays, arbitrary nesting)."""
    parsed = tuple(_parse_type(t) for t in types)
    if len(data) < sum(32 if _type_is_dynamic(t) else _static_size(t) for t in parsed):
        raise ValueError("ABI data too short")
    return _decode_seq_hetero(parsed, data, 0)


def decode_log(event: AbiEvent, topics: list[str], data: bytes) -> dict | None:
    """Decode one log row the way HandleLog does (chainservice/events.go:410-484):

    * empty ``data`` -> drop (events.go:411-413)
    * more indexed params than topics -> drop (events.go:415-417,436-438)
    * indexed params come from topics[1:]; decoded by their declared ABI type
      (documented deviation: apollo force-renders every indexed topic as an
      address via common.BytesToAddress, events.go:440)
    * non-indexed decoded from ``data``, with a left-pad-to-64-bytes retry on
      short payloads (common.LeftPadBytes(data, 64), events.go:447-455)
    Returns {output_name: value} or None for dropped rows.
    """
    if not data:
        return None
    idx = event.indexed_inputs
    if len(topics) < len(idx) + 1:
        return None
    out: dict = {}
    for i, p in enumerate(idx):
        word = bytes.fromhex(topics[i + 1].removeprefix("0x"))
        t = _parse_type(p.type)
        if _type_is_dynamic(t) or t.arr or t.base == "tuple":
            # indexed dynamic/composite params are stored as keccak(encoding)
            # — only the hash is recoverable (go-ethereum behaves the same)
            out[p.name] = "0x" + word.hex()
        else:
            out[p.name] = _decode_static(p.type, word)
    data_params = event.data_inputs
    types = [p.type for p in data_params]
    try:
        vals = abi_decode(types, data)
    except (ValueError, IndexError):
        try:
            vals = abi_decode(types, data.rjust(64, b"\x00"))
        except (ValueError, IndexError):
            return None
    for p, v in zip(data_params, vals):
        out[p.name] = v
    return out


def _encode_static(typ: str, value) -> bytes:
    if typ == "address":
        return bytes(12) + bytes.fromhex(str(value).lower().removeprefix("0x"))
    if typ.startswith("uint"):
        return int(value).to_bytes(32, "big")
    if typ.startswith("int"):
        return int(value).to_bytes(32, "big", signed=True)
    if typ == "bool":
        return int(bool(value)).to_bytes(32, "big")
    if typ.startswith("bytes") and typ != "bytes":
        b = bytes.fromhex(str(value).removeprefix("0x"))
        return b + bytes(32 - len(b))
    raise ValueError(f"unsupported static ABI type {typ!r}")


def _encode_value(t: _Type, value) -> bytes:
    """Full encoding of one value (the bytes a head pointer would target)."""
    if t.arr:
        inner = _Type(t.base, t.arr[:-1], t.components)
        k = t.arr[-1]
        if k is None:
            return len(value).to_bytes(32, "big") + _encode_seq(inner, list(value))
        if len(value) != k:
            raise ValueError(f"fixed array length mismatch: want {k}, got {len(value)}")
        return _encode_seq(inner, list(value))
    if t.base == "tuple":
        return _encode_seq_hetero(t.components, list(value))
    if t.base == "string":
        blob = value.encode()
        return len(blob).to_bytes(32, "big") + blob + bytes((32 - len(blob) % 32) % 32)
    if t.base == "bytes":
        blob = bytes.fromhex(str(value).removeprefix("0x"))
        return len(blob).to_bytes(32, "big") + blob + bytes((32 - len(blob) % 32) % 32)
    return _encode_static(t.base, value)


def _encode_seq(elem: _Type, values: list) -> bytes:
    if _type_is_dynamic(elem):
        tails = [_encode_value(elem, v) for v in values]
        head_len = 32 * len(values)
        head, off = [], head_len
        for tl in tails:
            head.append(off.to_bytes(32, "big"))
            off += len(tl)
        return b"".join(head) + b"".join(tails)
    return b"".join(_encode_value(elem, v) for v in values)


def _encode_seq_hetero(types: tuple[_Type, ...], values: list) -> bytes:
    head_len = sum(32 if _type_is_dynamic(t) else _static_size(t) for t in types)
    head: list[bytes] = []
    tail: list[bytes] = []
    off = head_len
    for t, v in zip(types, values):
        if _type_is_dynamic(t):
            blob = _encode_value(t, v)
            head.append(off.to_bytes(32, "big"))
            tail.append(blob)
            off += len(blob)
        else:
            head.append(_encode_value(t, v))
    return b"".join(head) + b"".join(tail)


def abi_encode(types: list[str], values: list) -> bytes:
    return _encode_seq_hetero(tuple(_parse_type(t) for t in types), list(values))


def encode_calldata(fn: AbiFunction, args: list) -> bytes:
    """BuildCallInput equivalent (generate/callmsg.go:39-54)."""
    return fn.selector + abi_encode([p.type for p in fn.inputs], args)


def decode_return(fn: AbiFunction, data: bytes) -> dict:
    """Decode call return; single unnamed output handled positionally
    (chainservice/utils.go:24-36 matchABIValue)."""
    vals = abi_decode([p.type for p in fn.outputs], data)
    out: dict = {}
    for i, (p, v) in enumerate(zip(fn.outputs, vals)):
        out[p.name or (fn.name if len(fn.outputs) == 1 else f"out{i}")] = v
    return out
