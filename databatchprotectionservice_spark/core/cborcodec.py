"""CBOR codec (RFC 8949) — the standards-track sibling of MessagePack.

Public spec: RFC 8949 (STD 94), "Concise Binary Object
Representation".  Both directions over the full core model:

* unsigned / negative integers across every argument width (the
  encoder always emits the RFC's *preferred serialization* — the
  smallest argument that fits);
* byte strings and UTF-8 text strings (definite on encode; the
  decoder also reassembles INDEFINITE-length strings from their
  definite chunks per §3.2.3, rejecting mixed-type chunks);
* arrays and maps, definite and indefinite; map keys must be
  distinct after decoding (§5.6 calls duplicate keys invalid — this
  decoder enforces it) and hashable;
* tags (major type 6): preserved as :class:`CborTag` values so
  semantic layers stay data, mirroring the msgpack codec's
  unknown-ext contract;
* simple values false/true/null/undefined plus the full float ladder
  — half/single/double precision decode (all big-endian per the
  spec), shortest-roundtrip encode (1.5 emits as float16, 1.1 as
  float64), NaN/Infinity included.

Guards mirror the container codecs: bounds-checked arguments, capped
container sizes and nesting depth, strict UTF-8, and ``loads``
requires the buffer to be consumed EXACTLY (trailing bytes raise).

Reference scope: the reference service ingests opaque event payloads
(``src/data_batch_protection_service.cpp``); CBOR is the IETF wire
format those sidecars arrive in (CoAP/COSE/WebAuthn ecosystems), so
the codec sits beside ``msgpackcodec.py`` with the same API shape.
"""

from __future__ import annotations

import math
import struct

from .errors import DBPSInvalidInputError

MAX_CONTAINER = 1 << 24
MAX_DEPTH = 64

_BREAK = object()  # sentinel returned only inside indefinite bodies


class CborFormatError(DBPSInvalidInputError):
    """Malformed CBOR data."""


class Undefined:
    """The spec's `undefined` simple value (0xf7), a singleton."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"


UNDEFINED = Undefined()


class CborTag:
    """A tagged value (major type 6), preserved rather than dropped."""

    __slots__ = ("tag", "value")

    def __init__(self, tag: int, value):
        if tag < 0:
            raise CborFormatError(f"tag {tag} negative")
        self.tag = int(tag)
        self.value = value

    def __eq__(self, other):
        return (
            isinstance(other, CborTag)
            and self.tag == other.tag
            and self.value == other.value
        )

    def __hash__(self):
        return hash((self.tag, _hashable(self.value)))

    def __repr__(self):
        return f"CborTag({self.tag}, {self.value!r})"


def _hashable(v):
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v


# ---------------------------------------------------------------------------
# encode — preferred serialization (§4.1)
# ---------------------------------------------------------------------------


def _head(out: bytearray, major: int, arg: int) -> None:
    mt = major << 5
    if arg < 24:
        out.append(mt | arg)
    elif arg < 0x100:
        out += struct.pack(">BB", mt | 24, arg)
    elif arg < 0x10000:
        out += struct.pack(">BH", mt | 25, arg)
    elif arg < 0x100000000:
        out += struct.pack(">BI", mt | 26, arg)
    elif arg < 0x10000000000000000:
        out += struct.pack(">BQ", mt | 27, arg)
    else:
        raise CborFormatError(f"argument {arg} exceeds 64 bits")


def _pack_float(out: bytearray, v: float) -> None:
    # shortest representation that round-trips exactly (§4.1 note);
    # NaN canonicalizes to the half-width 0x7e00 quiet NaN
    if math.isnan(v):
        out += b"\xf9\x7e\x00"
        return
    for code, fmt in ((0xF9, ">e"), (0xFA, ">f")):
        try:
            raw = struct.pack(fmt, v)
        except (OverflowError, struct.error):
            continue
        if struct.unpack(fmt, raw)[0] == v:
            out.append(code)
            out += raw
            return
    out.append(0xFB)
    out += struct.pack(">d", v)


def _pack_into(out: bytearray, v, depth: int) -> None:
    if depth > MAX_DEPTH:
        raise CborFormatError(f"nesting deeper than {MAX_DEPTH}")
    if v is None:
        out.append(0xF6)
    elif v is UNDEFINED:
        out.append(0xF7)
    elif isinstance(v, bool):
        out.append(0xF5 if v else 0xF4)
    elif isinstance(v, int):
        if v >= 0:
            _head(out, 0, v)
        else:
            _head(out, 1, -1 - v)
    elif isinstance(v, float):
        _pack_float(out, v)
    elif isinstance(v, (bytes, bytearray)):
        _head(out, 2, len(v))
        out += v
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        _head(out, 3, len(raw))
        out += raw
    elif isinstance(v, (list, tuple)):
        if len(v) > MAX_CONTAINER:
            raise CborFormatError("array too large")
        _head(out, 4, len(v))
        for x in v:
            _pack_into(out, x, depth + 1)
    elif isinstance(v, dict):
        if len(v) > MAX_CONTAINER:
            raise CborFormatError("map too large")
        _head(out, 5, len(v))
        for k, x in v.items():
            _pack_into(out, k, depth + 1)
            _pack_into(out, x, depth + 1)
    elif isinstance(v, CborTag):
        _head(out, 6, v.tag)
        _pack_into(out, v.value, depth + 1)
    else:
        raise CborFormatError(f"cannot encode {type(v).__name__}")


def dumps(v) -> bytes:
    out = bytearray()
    _pack_into(out, v, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _need(data: bytes, pos: int, n: int) -> None:
    if pos + n > len(data):
        raise CborFormatError(f"need {n} bytes at {pos}, buffer ends")


_ARG_FMT = {24: ">B", 25: ">H", 26: ">I", 27: ">Q"}


def _read_head(data: bytes, pos: int) -> tuple[int, int, int | None, int]:
    """(major, info, argument, next_pos); argument None = indefinite.

    For major type 7 with info 25/26/27 the argument integer IS the
    raw float bit pattern (the caller reinterprets it)."""
    _need(data, pos, 1)
    b = data[pos]
    major, info = b >> 5, b & 0x1F
    pos += 1
    if info < 24:
        return major, info, info, pos
    if info in _ARG_FMT:
        fmt = _ARG_FMT[info]
        n = struct.calcsize(fmt)
        _need(data, pos, n)
        return major, info, struct.unpack_from(fmt, data, pos)[0], pos + n
    if info == 31:
        if major in (0, 1, 6):
            raise CborFormatError(
                f"indefinite length invalid for major type {major}"
            )
        return major, info, None, pos
    raise CborFormatError(f"reserved additional info {info}")


def _decode_string(data, pos, major, n, depth):
    if n is not None:
        if n > MAX_CONTAINER:
            raise CborFormatError("string too large")
        _need(data, pos, n)
        raw = data[pos : pos + n]
        pos += n
    else:
        # indefinite: definite chunks of the SAME major type until break
        parts = bytearray()
        while True:
            _need(data, pos, 1)
            if data[pos] == 0xFF:
                pos += 1
                break
            cmajor, _cinfo, cn, pos = _read_head(data, pos)
            if cmajor != major or cn is None:
                raise CborFormatError(
                    "indefinite string chunk of wrong type"
                )
            if cn > MAX_CONTAINER or len(parts) + cn > MAX_CONTAINER:
                raise CborFormatError("string too large")
            _need(data, pos, cn)
            parts += data[pos : pos + cn]
            pos += cn
        raw = bytes(parts)
    if major == 2:
        return bytes(raw), pos
    try:
        return raw.decode("utf-8"), pos
    except UnicodeDecodeError as e:
        raise CborFormatError("text string is not UTF-8") from e


def _decode_at(data: bytes, pos: int, depth: int):
    if depth > MAX_DEPTH:
        raise CborFormatError(f"nesting deeper than {MAX_DEPTH}")
    major, info, n, pos = _read_head(data, pos)
    if major == 0:
        return n, pos
    if major == 1:
        return -1 - n, pos
    if major in (2, 3):
        return _decode_string(data, pos, major, n, depth)
    if major == 4:
        out = []
        if n is not None:
            if n > MAX_CONTAINER:
                raise CborFormatError("array too large")
            for _ in range(n):
                v, pos = _decode_at(data, pos, depth + 1)
                out.append(v)
        else:
            while True:
                _need(data, pos, 1)
                if data[pos] == 0xFF:
                    pos += 1
                    break
                v, pos = _decode_at(data, pos, depth + 1)
                out.append(v)
                if len(out) > MAX_CONTAINER:
                    raise CborFormatError("array too large")
        return out, pos
    if major == 5:
        out = {}
        count = 0
        while True:
            if n is not None:
                if n > MAX_CONTAINER:
                    raise CborFormatError("map too large")
                if count == n:
                    break
            else:
                _need(data, pos, 1)
                if data[pos] == 0xFF:
                    pos += 1
                    break
                if count > MAX_CONTAINER:
                    raise CborFormatError("map too large")
            k, pos = _decode_at(data, pos, depth + 1)
            v, pos = _decode_at(data, pos, depth + 1)
            try:
                dup = k in out
            except TypeError as e:
                raise CborFormatError(
                    f"unhashable map key {type(k).__name__}"
                ) from e
            if dup:
                raise CborFormatError(f"duplicate map key {k!r}")
            out[k] = v
            count += 1
        return out, pos
    if major == 6:
        v, pos = _decode_at(data, pos, depth + 1)
        return CborTag(n, v), pos
    # major 7: simple values, floats, break
    if info == 31:
        raise CborFormatError("unexpected break (0xff) outside container")
    if info < 24:
        simple = n
    elif info == 24:
        simple = n
        if simple < 32:
            raise CborFormatError(
                f"two-byte simple value {simple} below 32 is invalid"
            )
    elif info == 25:
        return struct.unpack(">e", struct.pack(">H", n))[0], pos
    elif info == 26:
        return struct.unpack(">f", struct.pack(">I", n))[0], pos
    else:  # info == 27
        return struct.unpack(">d", struct.pack(">Q", n))[0], pos
    if simple == 20:
        return False, pos
    if simple == 21:
        return True, pos
    if simple == 22:
        return None, pos
    if simple == 23:
        return UNDEFINED, pos
    return ("simple", simple), pos


def loads(data: bytes):
    """Decode exactly one CBOR item; trailing bytes raise."""
    if not data:
        raise CborFormatError("empty buffer")
    v, pos = _decode_at(bytes(data), 0, 0)
    if pos != len(data):
        raise CborFormatError(
            f"{len(data) - pos} trailing bytes after CBOR item"
        )
    return v
