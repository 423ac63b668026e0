"""MessagePack codec — the compact sidecar/event wire format.

Public spec (msgpack/spec.md).  Both directions over the full core
model:

* nil / booleans; integers across every width (positive/negative
  fixint, uint8-64, int8-64 — the encoder always picks the smallest
  representation, as the spec recommends);
* float64 encode (float32 accepted on decode);
* str (fixstr, str8/16/32) and bin (bin8/16/32) with byte-exact UTF-8
  handling;
* array (fixarray, array16/32) and map (fixmap, map16/32);
* the timestamp extension (type -1) in all three spec layouts:
  fixext4 (u32 seconds), fixext8 (nanos<<34 | seconds in a u64), and
  ext8/12 (u32 nanos + i64 seconds) — the encoder picks the smallest
  layout that fits, the decoder validates the nanos < 10^9 rule.

Guards mirror the container codecs: bounds-checked lengths, capped
container sizes and nesting depth, and ``unpackb`` requires the
buffer to be consumed EXACTLY (trailing bytes raise).  Ext types
other than timestamp decode to ``(type, bytes)`` tuples rather than
being dropped — unknown extensions are data, not errors.
"""

from __future__ import annotations

import struct

from .errors import DBPSInvalidInputError

MAX_CONTAINER = 1 << 24
MAX_DEPTH = 64


class MsgpackFormatError(DBPSInvalidInputError):
    """Malformed MessagePack data."""


class Timestamp:
    """The spec's timestamp extension value: integer seconds + nanos."""

    __slots__ = ("seconds", "nanos")

    def __init__(self, seconds: int, nanos: int = 0):
        if not 0 <= nanos < 1_000_000_000:
            raise MsgpackFormatError(f"nanos {nanos} out of range")
        self.seconds = int(seconds)
        self.nanos = int(nanos)

    def __eq__(self, other):
        return (
            isinstance(other, Timestamp)
            and self.seconds == other.seconds
            and self.nanos == other.nanos
        )

    def __hash__(self):
        return hash((self.seconds, self.nanos))

    def __repr__(self):
        return f"Timestamp({self.seconds}, {self.nanos})"


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _pack_into(out: bytearray, v, depth: int) -> None:
    if depth >= MAX_DEPTH:
        raise MsgpackFormatError("nesting over the depth cap")
    if v is None:
        out.append(0xC0)
    elif v is True:
        out.append(0xC3)
    elif v is False:
        out.append(0xC2)
    elif isinstance(v, int):
        if 0 <= v <= 0x7F:
            out.append(v)
        elif -32 <= v < 0:
            out.append(v & 0xFF)
        elif 0 < v <= 0xFF:
            out += b"\xcc" + bytes([v])
        elif 0 < v <= 0xFFFF:
            out += b"\xcd" + struct.pack(">H", v)
        elif 0 < v <= 0xFFFFFFFF:
            out += b"\xce" + struct.pack(">I", v)
        elif 0 < v <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + struct.pack(">Q", v)
        elif -0x80 <= v < 0:
            out += b"\xd0" + struct.pack(">b", v)
        elif -0x8000 <= v < 0:
            out += b"\xd1" + struct.pack(">h", v)
        elif -0x80000000 <= v < 0:
            out += b"\xd2" + struct.pack(">i", v)
        elif -0x8000000000000000 <= v < 0:
            out += b"\xd3" + struct.pack(">q", v)
        else:
            raise MsgpackFormatError(f"integer {v} outside 64 bits")
    elif isinstance(v, float):
        out += b"\xcb" + struct.pack(">d", v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += b"\xd9" + bytes([n])
        elif n <= 0xFFFF:
            out += b"\xda" + struct.pack(">H", n)
        elif n <= 0xFFFFFFFF:
            out += b"\xdb" + struct.pack(">I", n)
        else:
            raise MsgpackFormatError("string over 2^32 bytes")
        out += b
    elif isinstance(v, (bytes, bytearray)):
        n = len(v)
        if n <= 0xFF:
            out += b"\xc4" + bytes([n])
        elif n <= 0xFFFF:
            out += b"\xc5" + struct.pack(">H", n)
        elif n <= 0xFFFFFFFF:
            out += b"\xc6" + struct.pack(">I", n)
        else:
            raise MsgpackFormatError("binary over 2^32 bytes")
        out += bytes(v)
    elif isinstance(v, Timestamp):
        sec, nanos = v.seconds, v.nanos
        if nanos == 0 and 0 <= sec <= 0xFFFFFFFF:
            out += b"\xd6\xff" + struct.pack(">I", sec)  # timestamp32
        elif 0 <= sec < (1 << 34):
            out += b"\xd7\xff" + struct.pack(
                ">Q", (nanos << 34) | sec
            )  # timestamp64
        else:
            out += b"\xc7\x0c\xff" + struct.pack(
                ">Iq", nanos, sec
            )  # timestamp96
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        elif n <= 0xFFFFFFFF:
            out += b"\xdd" + struct.pack(">I", n)
        else:
            raise MsgpackFormatError("array over 2^32 entries")
        for item in v:
            _pack_into(out, item, depth + 1)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + struct.pack(">H", n)
        elif n <= 0xFFFFFFFF:
            out += b"\xdf" + struct.pack(">I", n)
        else:
            raise MsgpackFormatError("map over 2^32 entries")
        for k, item in v.items():
            _pack_into(out, k, depth + 1)
            _pack_into(out, item, depth + 1)
    else:
        raise MsgpackFormatError(f"unpackable type {type(v).__name__}")


def packb(v) -> bytes:
    out = bytearray()
    _pack_into(out, v, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _need(data: bytes, pos: int, n: int) -> None:
    if pos + n > len(data):
        raise MsgpackFormatError(f"truncated at offset {pos}")


def _decode_ext(etype: int, payload: bytes):
    if etype == -1:  # timestamp
        if len(payload) == 4:
            return Timestamp(struct.unpack(">I", payload)[0], 0)
        if len(payload) == 8:
            (u,) = struct.unpack(">Q", payload)
            return Timestamp(u & ((1 << 34) - 1), u >> 34)
        if len(payload) == 12:
            nanos, sec = struct.unpack(">Iq", payload)
            return Timestamp(sec, nanos)
        raise MsgpackFormatError(
            f"timestamp ext of {len(payload)} bytes"
        )
    return (etype, payload)  # unknown extension: preserved, not dropped


def _unpack_at(data: bytes, pos: int, depth: int):
    if depth >= MAX_DEPTH:
        raise MsgpackFormatError("nesting over the depth cap")
    _need(data, pos, 1)
    b = data[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(data, pos, b & 0x0F, depth)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(data, pos, b & 0x0F, depth)
    if 0xA0 <= b <= 0xBF:
        return _unpack_str(data, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        w = (1, 2, 4)[b - 0xC4]
        _need(data, pos, w)
        n = int.from_bytes(data[pos : pos + w], "big")
        pos += w
        _need(data, pos, n)
        return data[pos : pos + n], pos + n
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        w = (1, 2, 4)[b - 0xC7]
        _need(data, pos, w)
        n = int.from_bytes(data[pos : pos + w], "big")
        pos += w
        _need(data, pos, 1 + n)
        etype = struct.unpack(">b", data[pos : pos + 1])[0]
        return _decode_ext(etype, data[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b == 0xCA:
        _need(data, pos, 4)
        return struct.unpack(">f", data[pos : pos + 4])[0], pos + 4
    if b == 0xCB:
        _need(data, pos, 8)
        return struct.unpack(">d", data[pos : pos + 8])[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        w = 1 << (b - 0xCC)
        _need(data, pos, w)
        return int.from_bytes(data[pos : pos + w], "big"), pos + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        w = 1 << (b - 0xD0)
        _need(data, pos, w)
        return (
            int.from_bytes(data[pos : pos + w], "big", signed=True),
            pos + w,
        )
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        _need(data, pos, 1 + n)
        etype = struct.unpack(">b", data[pos : pos + 1])[0]
        return _decode_ext(etype, data[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        w = (1, 2, 4)[b - 0xD9]
        _need(data, pos, w)
        n = int.from_bytes(data[pos : pos + w], "big")
        pos += w
        return _unpack_str(data, pos, n)
    if b in (0xDC, 0xDD):  # array 16/32
        w = (2, 4)[b - 0xDC]
        _need(data, pos, w)
        n = int.from_bytes(data[pos : pos + w], "big")
        return _unpack_array(data, pos + w, n, depth)
    if b in (0xDE, 0xDF):  # map 16/32
        w = (2, 4)[b - 0xDE]
        _need(data, pos, w)
        n = int.from_bytes(data[pos : pos + w], "big")
        return _unpack_map(data, pos + w, n, depth)
    raise MsgpackFormatError(f"reserved type byte 0x{b:02x}")


def _unpack_str(data: bytes, pos: int, n: int):
    _need(data, pos, n)
    try:
        return data[pos : pos + n].decode("utf-8"), pos + n
    except UnicodeDecodeError as e:
        raise MsgpackFormatError(f"str is not UTF-8: {e}") from None


def _unpack_array(data: bytes, pos: int, n: int, depth: int):
    if n > MAX_CONTAINER:
        raise MsgpackFormatError(f"array size {n} over the cap")
    out = []
    for _ in range(n):
        v, pos = _unpack_at(data, pos, depth + 1)
        out.append(v)
    return out, pos


def _unpack_map(data: bytes, pos: int, n: int, depth: int):
    if n > MAX_CONTAINER:
        raise MsgpackFormatError(f"map size {n} over the cap")
    out = {}
    for _ in range(n):
        k, pos = _unpack_at(data, pos, depth + 1)
        if isinstance(k, (bytes, bytearray)):
            k = bytes(k)
        elif not isinstance(k, (str, int, bool, float)) and k is not None:
            raise MsgpackFormatError(
                f"unhashable map key type {type(k).__name__}"
            )
        v, pos = _unpack_at(data, pos, depth + 1)
        out[k] = v
    return out, pos


def unpackb(data: bytes):
    """Decode exactly one value; trailing bytes raise."""
    v, pos = _unpack_at(bytes(data), 0, 0)
    if pos != len(data):
        raise MsgpackFormatError(
            f"{len(data) - pos} trailing bytes after the value"
        )
    return v
