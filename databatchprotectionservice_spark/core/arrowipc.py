"""Arrow IPC (Feather V2) file reader, from scratch — including the
flatbuffers wire format itself.

Public-spec provenance (no Arrow or FlatBuffers library code is used
for the DECODE direction; ``pyarrow`` appears only as the independent
*producer* in tests and operators):

* File layout + encapsulated-message framing: Apache Arrow Columnar
  Format specification, "IPC File Format" / "Encapsulated message
  format" sections (arrow.apache.org/docs/format/Columnar.html):
  ``ARROW1\\0\\0`` magic, a stream of ``[0xFFFFFFFF][i32 metadata
  size][Message flatbuffer][padded body]`` messages, an end-of-stream
  marker, the Footer flatbuffer, ``i32 footer length``, ``ARROW1``.
* FlatBuffers wire format: Google's public "FlatBuffers internals"
  documentation: root = ``uoffset32``; every table starts with a
  signed ``soffset32`` pointing BACK to its vtable; the vtable is
  ``[u16 vtable_bytes][u16 table_bytes][u16 slot per field]`` where a
  slot holds the field's byte offset inside the table (0 = absent);
  scalars are inline, strings/vectors/tables sit behind a
  ``uoffset32`` relative to the field position; strings and vectors
  carry a ``u32`` length prefix; structs are inline with C layout;
  a union occupies two slots (``u8`` type tag, then the value table).
* Table/field slot numbering: the public ``Message.fbs`` /
  ``File.fbs`` / ``Schema.fbs`` in apache/arrow (field id N lives in
  vtable slot ``4 + 2*N``; union members are tagged in declaration
  order starting at 1).

Reference scope: the reference service ships opaque byte payloads
(``src/data_batch_protection_service.cpp``); Arrow IPC is the
interchange format an ML feature pipeline actually hands around, so
the walk lives beside the other from-scratch container codecs
(``tfrecordcodec.py``, ``avrocodec.py``, ``orcmeta.py``).

Scope (asserted, never guessed): little-endian files, uncompressed
bodies, no dictionary batches, flat (non-nested) columns of types
Int(8/16/32/64, signed or unsigned), FloatingPoint(SINGLE/DOUBLE),
Bool, Utf8 and Binary.  Anything else raises
:class:`ArrowIpcFormatError` naming the offending tag so the seam is
explicit, in the same style as the other codecs' unsupported paths.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .errors import DBPSInvalidInputError

MAGIC = b"ARROW1"
_CONTINUATION = 0xFFFFFFFF

#: MessageHeader union tags, Message.fbs declaration order
_MSG_SCHEMA = 1
_MSG_DICTIONARY_BATCH = 2
_MSG_RECORD_BATCH = 3

#: Type union tags, Schema.fbs declaration order (subset + names for
#: the unsupported-seam error message)
_TYPE_NAMES = {
    1: "Null", 2: "Int", 3: "FloatingPoint", 4: "Binary", 5: "Utf8",
    6: "Bool", 7: "Decimal", 8: "Date", 9: "Time", 10: "Timestamp",
    11: "Interval", 12: "List", 13: "Struct", 14: "Union",
    15: "FixedSizeBinary", 16: "FixedSizeList", 17: "Map",
    18: "Duration", 19: "LargeBinary", 20: "LargeUtf8", 21: "LargeList",
}
_T_INT = 2
_T_FP = 3
_T_BINARY = 4
_T_UTF8 = 5
_T_BOOL = 6


class ArrowIpcFormatError(DBPSInvalidInputError):
    """Malformed or out-of-scope Arrow IPC bytes."""


def _u16(data: bytes, pos: int) -> int:
    if pos < 0 or pos + 2 > len(data):
        raise ArrowIpcFormatError(f"u16 read out of bounds at {pos}")
    return struct.unpack_from("<H", data, pos)[0]


def _i32(data: bytes, pos: int) -> int:
    if pos < 0 or pos + 4 > len(data):
        raise ArrowIpcFormatError(f"i32 read out of bounds at {pos}")
    return struct.unpack_from("<i", data, pos)[0]


def _u32(data: bytes, pos: int) -> int:
    if pos < 0 or pos + 4 > len(data):
        raise ArrowIpcFormatError(f"u32 read out of bounds at {pos}")
    return struct.unpack_from("<I", data, pos)[0]


def _i64(data: bytes, pos: int) -> int:
    if pos < 0 or pos + 8 > len(data):
        raise ArrowIpcFormatError(f"i64 read out of bounds at {pos}")
    return struct.unpack_from("<q", data, pos)[0]


class _Table:
    """One flatbuffers table: vtable-indirected field access.

    ``pos`` is the table position inside ``data``; the signed soffset
    stored there points back to the vtable.  Field id N lives in
    vtable slot ``4 + 2*N``; a zero (or out-of-vtable) slot means the
    field was omitted and the schema default applies.
    """

    __slots__ = ("data", "pos", "vt", "vt_bytes")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        soff = _i32(data, pos)
        self.vt = pos - soff
        self.vt_bytes = _u16(data, self.vt)
        if self.vt_bytes < 4:
            raise ArrowIpcFormatError(f"vtable at {self.vt} too short")

    def _field_pos(self, fid: int) -> int | None:
        slot = 4 + 2 * fid
        if slot + 2 > self.vt_bytes:
            return None
        rel = _u16(self.data, self.vt + slot)
        if rel == 0:
            return None
        return self.pos + rel

    def scalar(self, fid: int, fmt: str, default):
        p = self._field_pos(fid)
        if p is None:
            return default
        size = struct.calcsize(fmt)
        if p + size > len(self.data):
            raise ArrowIpcFormatError(f"scalar field {fid} out of bounds")
        return struct.unpack_from(fmt, self.data, p)[0]

    def _indirect(self, fid: int) -> int | None:
        p = self._field_pos(fid)
        if p is None:
            return None
        return p + _u32(self.data, p)

    def table(self, fid: int) -> "_Table | None":
        tpos = self._indirect(fid)
        return None if tpos is None else _Table(self.data, tpos)

    def string(self, fid: int) -> str | None:
        spos = self._indirect(fid)
        if spos is None:
            return None
        n = _u32(self.data, spos)
        if spos + 4 + n > len(self.data):
            raise ArrowIpcFormatError(f"string field {fid} out of bounds")
        try:
            return self.data[spos + 4 : spos + 4 + n].decode("utf-8")
        except UnicodeDecodeError as e:
            raise ArrowIpcFormatError(
                f"string field {fid} is not UTF-8"
            ) from e

    def vector(self, fid: int, stride: int = 1) -> tuple[int, int] | None:
        """(element start, element count) or None if absent; the
        declared count must fit the buffer at ``stride`` bytes each."""
        vpos = self._indirect(fid)
        if vpos is None:
            return None
        n = _u32(self.data, vpos)
        if vpos + 4 + stride * n > len(self.data):
            raise ArrowIpcFormatError(
                f"vector field {fid} declares {n} elements past the end"
            )
        return vpos + 4, n

    def table_vector(self, fid: int) -> list["_Table"]:
        v = self.vector(fid, stride=4)
        if v is None:
            return []
        start, n = v
        out = []
        for i in range(n):
            epos = start + 4 * i
            out.append(_Table(self.data, epos + _u32(self.data, epos)))
        return out


@dataclass(frozen=True)
class FieldSpec:
    """Decoded Schema.fbs Field for the supported flat types."""

    name: str
    nullable: bool
    type_name: str  # 'int64' 'uint32' 'float32' 'float64' 'bool'
    #                 'utf8' 'binary'
    bit_width: int  # ints/floats; 1 for bool, 0 for varlen


def _decode_field(f: _Table) -> FieldSpec:
    name = f.string(0) or ""
    nullable = bool(f.scalar(1, "<b", 0))
    tag = f.scalar(2, "<B", 0)
    t = f.table(3)
    if tag not in (_T_INT, _T_FP, _T_BOOL, _T_UTF8, _T_BINARY):
        raise ArrowIpcFormatError(
            f"field {name!r}: type {_TYPE_NAMES.get(tag, tag)} "
            "not supported"
        )
    if f.table(4) is not None:
        raise ArrowIpcFormatError(
            f"field {name!r}: dictionary encoding not supported"
        )
    if f.table_vector(5):
        raise ArrowIpcFormatError(
            f"field {name!r}: nested children not supported"
        )
    if tag == _T_INT:
        if t is None:
            raise ArrowIpcFormatError(f"field {name!r}: Int missing body")
        width = t.scalar(0, "<i", 0)
        signed = bool(t.scalar(1, "<b", 0))
        if width not in (8, 16, 32, 64):
            raise ArrowIpcFormatError(
                f"field {name!r}: Int bitWidth {width} unsupported"
            )
        return FieldSpec(
            name, nullable, f"{'int' if signed else 'uint'}{width}", width
        )
    if tag == _T_FP:
        if t is None:
            raise ArrowIpcFormatError(f"field {name!r}: FP missing body")
        precision = t.scalar(0, "<h", 0)
        if precision == 1:
            return FieldSpec(name, nullable, "float32", 32)
        if precision == 2:
            return FieldSpec(name, nullable, "float64", 64)
        raise ArrowIpcFormatError(
            f"field {name!r}: FloatingPoint precision {precision} "
            "unsupported (HALF is out of scope)"
        )
    if tag == _T_BOOL:
        return FieldSpec(name, nullable, "bool", 1)
    if tag == _T_UTF8:
        return FieldSpec(name, nullable, "utf8", 0)
    return FieldSpec(name, nullable, "binary", 0)


def _decode_schema(s: _Table) -> list[FieldSpec]:
    endianness = s.scalar(0, "<h", 0)
    if endianness != 0:
        raise ArrowIpcFormatError("big-endian IPC files not supported")
    fields = [_decode_field(f) for f in s.table_vector(1)]
    if not fields:
        raise ArrowIpcFormatError("schema has no fields")
    return fields


def _bit(buf: bytes, i: int) -> int:
    return (buf[i >> 3] >> (i & 7)) & 1


#: numpy little-endian dtype characters per supported fixed type
_NP_KIND = {
    "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float32": "f4", "float64": "f8",
}


def _decode_column(
    spec: FieldSpec,
    length: int,
    null_count: int,
    bufs: list[bytes],
) -> list:
    """One FieldNode + its buffers -> python values (None for null)."""
    validity = bufs[0]
    if null_count and len(validity) * 8 < length:
        raise ArrowIpcFormatError(
            f"field {spec.name!r}: validity bitmap too short"
        )

    def null_at(i: int) -> bool:
        return bool(null_count) and _bit(validity, i) == 0

    if spec.type_name in ("utf8", "binary"):
        offsets_buf, data_buf = bufs[1], bufs[2]
        if len(offsets_buf) < 4 * (length + 1):
            raise ArrowIpcFormatError(
                f"field {spec.name!r}: offsets buffer too short"
            )
        offs = struct.unpack_from(f"<{length + 1}i", offsets_buf, 0)
        out = []
        for i in range(length):
            if null_at(i):
                out.append(None)
                continue
            lo, hi = offs[i], offs[i + 1]
            if lo < 0 or hi < lo or hi > len(data_buf):
                raise ArrowIpcFormatError(
                    f"field {spec.name!r}: offsets not monotone in-bounds"
                )
            raw = data_buf[lo:hi]
            if spec.type_name == "utf8":
                try:
                    out.append(raw.decode("utf-8"))
                except UnicodeDecodeError as e:
                    raise ArrowIpcFormatError(
                        f"field {spec.name!r}: value {i} is not UTF-8"
                    ) from e
            else:
                out.append(raw)
        return out
    data_buf = bufs[1]
    if spec.type_name == "bool":
        if len(data_buf) * 8 < length:
            raise ArrowIpcFormatError(
                f"field {spec.name!r}: bool buffer too short"
            )
        bits = np.unpackbits(
            np.frombuffer(data_buf, dtype=np.uint8),
            bitorder="little",
        )[:length]
        vals = [bool(b) for b in bits]
    else:
        step = spec.bit_width // 8
        if len(data_buf) < step * length:
            raise ArrowIpcFormatError(
                f"field {spec.name!r}: value buffer too short"
            )
        vals = np.frombuffer(
            data_buf[: step * length],
            dtype=f"<{_NP_KIND[spec.type_name]}",
        ).tolist()
    if not null_count:
        return vals
    return [None if null_at(i) else v for i, v in enumerate(vals)]


def _read_message(data: bytes, pos: int) -> tuple[_Table, int, int]:
    """Encapsulated message at ``pos`` -> (Message table, body start,
    total metadata length including prefix+padding)."""
    if _u32(data, pos) != _CONTINUATION:
        raise ArrowIpcFormatError(
            f"message at {pos}: missing 0xFFFFFFFF continuation"
        )
    meta_len = _i32(data, pos + 4)
    if meta_len <= 0 or pos + 8 + meta_len > len(data):
        raise ArrowIpcFormatError(
            f"message at {pos}: metadata length {meta_len} out of bounds"
        )
    region = data[pos + 8 : pos + 8 + meta_len]
    root = _u32(region, 0)
    return _Table(region, root), pos + 8 + meta_len, 8 + meta_len


def _decode_record_batch(
    msg: _Table, body: bytes, fields: list[FieldSpec]
) -> tuple[int, list[list]]:
    """RecordBatch message + body -> (length, columns)."""
    header_tag = msg.scalar(1, "<B", 0)
    if header_tag != _MSG_RECORD_BATCH:
        raise ArrowIpcFormatError(
            f"expected RecordBatch message, got tag {header_tag}"
        )
    rb = msg.table(2)
    if rb is None:
        raise ArrowIpcFormatError("RecordBatch message missing header")
    if rb.table(3) is not None:
        raise ArrowIpcFormatError("compressed IPC bodies not supported")
    length = rb.scalar(0, "<q", 0)
    if length < 0:
        raise ArrowIpcFormatError(f"RecordBatch length {length} negative")
    nv = rb.vector(1, stride=16)
    bv = rb.vector(2, stride=16)
    if nv is None or bv is None:
        raise ArrowIpcFormatError("RecordBatch missing nodes or buffers")
    nstart, nlen = nv
    bstart, blen = bv
    if nlen != len(fields):
        raise ArrowIpcFormatError(
            f"RecordBatch has {nlen} nodes for {len(fields)} fields"
        )
    # struct FieldNode { long length; long null_count; } stride 16
    nodes = [
        (_i64(rb.data, nstart + 16 * i), _i64(rb.data, nstart + 16 * i + 8))
        for i in range(nlen)
    ]
    # struct Buffer { long offset; long length; } stride 16
    buffers = [
        (_i64(rb.data, bstart + 16 * i), _i64(rb.data, bstart + 16 * i + 8))
        for i in range(blen)
    ]
    for off, ln in buffers:
        if off < 0 or ln < 0 or off + ln > len(body):
            raise ArrowIpcFormatError(
                f"buffer ({off},{ln}) escapes body of {len(body)} bytes"
            )
    bix = 0

    def take() -> bytes:
        nonlocal bix
        if bix >= len(buffers):
            raise ArrowIpcFormatError("RecordBatch ran out of buffers")
        off, ln = buffers[bix]
        bix += 1
        return body[off : off + ln]

    columns = []
    for spec, (node_len, null_count) in zip(fields, nodes):
        if node_len != length:
            raise ArrowIpcFormatError(
                f"field {spec.name!r}: node length {node_len} != "
                f"batch length {length}"
            )
        nbufs = 3 if spec.type_name in ("utf8", "binary") else 2
        bufs = [take() for _ in range(nbufs)]
        col = _decode_column(spec, length, null_count, bufs)
        nc = sum(1 for v in col if v is None)
        if nc != null_count:
            raise ArrowIpcFormatError(
                f"field {spec.name!r}: decoded {nc} nulls, "
                f"node declared {null_count}"
            )
        columns.append(col)
    if bix != len(buffers):
        raise ArrowIpcFormatError(
            f"RecordBatch declared {len(buffers)} buffers, "
            f"consumed {bix}"
        )
    return length, columns


def read_arrow_ipc(data: bytes) -> dict:
    """Walk a complete Arrow IPC FILE (Feather V2) from bytes.

    Returns ``{"fields": [FieldSpec...], "batches": [{"length": n,
    "columns": [[values...]...]}...], "body_bytes": total}`` after
    asserting the full framing: leading+trailing magic, footer
    flatbuffer, footer schema == leading stream Schema message (field
    names, order and types), every record-batch Block, and per-batch
    buffer accounting.  Values come back as Python scalars with
    ``None`` for nulls.
    """
    if len(data) < 8 + 4 + 6 or data[: len(MAGIC)] != MAGIC:
        raise ArrowIpcFormatError("missing leading ARROW1 magic")
    if data[-6:] != MAGIC:
        raise ArrowIpcFormatError("missing trailing ARROW1 magic")
    footer_len = _i32(data, len(data) - 10)
    footer_start = len(data) - 10 - footer_len
    if footer_len <= 0 or footer_start < 8:
        raise ArrowIpcFormatError(f"footer length {footer_len} out of bounds")
    fregion = data[footer_start : footer_start + footer_len]
    footer = _Table(fregion, _u32(fregion, 0))
    schema_t = footer.table(1)
    if schema_t is None:
        raise ArrowIpcFormatError("footer has no schema")
    fields = _decode_schema(schema_t)
    dict_blocks = footer.vector(2, stride=24)
    if dict_blocks is not None and dict_blocks[1] > 0:
        raise ArrowIpcFormatError("dictionary batches not supported")
    rb_v = footer.vector(3, stride=24)
    blocks = []
    if rb_v is not None:
        start, n = rb_v
        # struct Block { long offset; int metaDataLength; long
        # bodyLength; } — C layout pads the int to 8, stride 24
        for i in range(n):
            p = start + 24 * i
            blocks.append(
                (_i64(fregion, p), _i32(fregion, p + 8), _i64(fregion, p + 16))
            )

    # cross-check: the stream section opens with a Schema message that
    # must agree with the footer's copy
    smsg, _, _ = _read_message(data, 8)
    if smsg.scalar(1, "<B", 0) != _MSG_SCHEMA:
        raise ArrowIpcFormatError("stream does not open with a Schema")
    stream_schema = smsg.table(2)
    if stream_schema is None:
        raise ArrowIpcFormatError("Schema message missing body")
    stream_fields = _decode_schema(stream_schema)
    if stream_fields != fields:
        raise ArrowIpcFormatError(
            "stream Schema disagrees with footer schema"
        )

    batches = []
    body_bytes = 0
    for offset, meta_len, body_len in blocks:
        if offset < 8 or offset + meta_len + body_len > footer_start:
            raise ArrowIpcFormatError(
                f"record-batch block ({offset},{meta_len},{body_len}) "
                "escapes the stream section"
            )
        msg, body_start, consumed = _read_message(data, offset)
        if consumed != meta_len:
            raise ArrowIpcFormatError(
                f"block metaDataLength {meta_len} != framed {consumed}"
            )
        declared = msg.scalar(3, "<q", 0)
        if declared != body_len:
            raise ArrowIpcFormatError(
                f"message bodyLength {declared} != block bodyLength "
                f"{body_len}"
            )
        body = data[body_start : body_start + body_len]
        length, columns = _decode_record_batch(msg, body, fields)
        body_bytes += body_len
        batches.append({"length": length, "columns": columns})
    return {"fields": fields, "batches": batches, "body_bytes": body_bytes}
