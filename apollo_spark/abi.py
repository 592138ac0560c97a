"""Minimal EVM ABI toolkit: keccak-256, event topics, log decode, calldata.

Replaces the reference's go-ethereum ABI usage
(/root/reference/generate/callmsg.go:19-65, chainservice/events.go:410-484,
chainservice/utils.go:24-36). Pure Python from the public Ethereum contract
ABI spec and the Keccak reference algorithm — no external deps. keccak runs
only at plan-build time (one hash per event/method signature), so speed is
irrelevant; decode runs inside Arrow-batched pandas UDFs.

Supported types cover the reference's test ABIs (test/unipair.abi.json,
test/erc20.abi.json): address, uintN/intN, bool, bytesN, bytes, string, and
one-dimensional dynamic arrays thereof.
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
        for item in raw:
            kind = item.get("type")
            if kind == "event":
                ev = AbiEvent(
                    item["name"],
                    tuple(AbiParam(p.get("name", ""), p["type"], bool(p.get("indexed"))) for p in item.get("inputs", [])),
                )
                events[ev.name] = ev
            elif kind == "function":
                fn = AbiFunction(
                    item["name"],
                    tuple(AbiParam(p.get("name", ""), p["type"]) for p in item.get("inputs", [])),
                    tuple(AbiParam(p.get("name", ""), p["type"]) for p in item.get("outputs", [])),
                )
                functions[fn.name] = fn
        return cls(events, functions)

    @classmethod
    def from_file(cls, path: str | Path) -> "Abi":
        return cls.from_json(Path(path).read_text())


# ------------------------------------------------------------- encode/decode


def _is_dynamic(typ: str) -> bool:
    return typ in ("bytes", "string") or typ.endswith("[]")


def _decode_static(typ: str, word: bytes):
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


def abi_decode(types: list[str], data: bytes) -> list:
    """Decode a head/tail ABI blob into python values."""
    values = []
    for i, typ in enumerate(types):
        head = data[i * 32 : (i + 1) * 32]
        if len(head) < 32:
            raise ValueError("ABI data too short")
        if not _is_dynamic(typ):
            values.append(_decode_static(typ, head))
            continue
        off = int.from_bytes(head, "big")
        if typ in ("bytes", "string"):
            ln = int.from_bytes(data[off : off + 32], "big")
            blob = data[off + 32 : off + 32 + ln]
            values.append(blob.decode("utf-8", errors="replace") if typ == "string" else "0x" + blob.hex())
        else:  # T[]
            elem = typ[:-2]
            if _is_dynamic(elem):
                raise ValueError(f"nested dynamic arrays unsupported: {typ}")
            ln = int.from_bytes(data[off : off + 32], "big")
            body_off = off + 32
            values.append([_decode_static(elem, data[body_off + j * 32 : body_off + (j + 1) * 32]) for j in range(ln)])
    return values


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


def abi_encode(types: list[str], values: list) -> bytes:
    head: list[bytes] = []
    tail: list[bytes] = []
    head_len = 32 * len(types)
    for typ, val in zip(types, values):
        if not _is_dynamic(typ):
            head.append(_encode_static(typ, val))
            continue
        offset = head_len + sum(len(t) for t in tail)
        head.append(offset.to_bytes(32, "big"))
        if typ in ("bytes", "string"):
            blob = val.encode() if typ == "string" else bytes.fromhex(str(val).removeprefix("0x"))
            padded = blob + bytes((32 - len(blob) % 32) % 32)
            tail.append(len(blob).to_bytes(32, "big") + padded)
        else:
            elem = typ[:-2]
            body = b"".join(_encode_static(elem, v) for v in val)
            tail.append(len(val).to_bytes(32, "big") + body)
    return b"".join(head) + b"".join(tail)


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
