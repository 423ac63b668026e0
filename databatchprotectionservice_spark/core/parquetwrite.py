"""Parquet writer from scratch — the loop closed in both directions.

Emits spec-compliant flat parquet files using only first-party
layers: the compact-protocol serializer (``core/thriftcodec.py
ThriftWriter``) for page headers, column metadata and the footer;
PLAIN value encoding per physical type; hybrid-RLE definition levels
for nullable columns; and — when ``codec="SNAPPY"`` — page bodies
compressed by OUR snappy (``core/snappycodec.py``), so a file can be
produced end-to-end with zero third-party bytes and still be read by
pyarrow, Spark, and DuckDB (the unit suite pins all three).

Shape: one row group; each column chunk holds one V1 data page per
``page_rows`` rows (default: everything in one page — pass the knob
to exercise the multi-page layout real writers emit at size).
Dictionaries, V2 pages, statistics, and nesting beyond one LIST
level are writer seams — the READER (``core/parquetread.py``)
covers them, this writer targets the canonical minimal layout every
reader accepts.

Column types: INT32, INT64, FLOAT, DOUBLE, BOOLEAN, BYTE_ARRAY
(raw bytes) and STRING (BYTE_ARRAY + the UTF8 converted-type
annotation, so readers surface str).  ``None`` values make a column
OPTIONAL with proper definition levels; all-present columns are
written REQUIRED.  A ``LIST<T>`` type (since r11) writes the
standard 3-level layout — ``optional group (LIST) { repeated group
list { optional T element } }`` — striping each record into
repetition/definition level runs (the exact inverse of the reader's
``assemble_nested``): None -> d0, [] -> d1, [None] -> d2, value ->
d3, with r=1 continuing the record's list.  pyarrow, DuckDB and our
own reader all recover the lists (the unit suite pins all three).
"""

from __future__ import annotations

import struct

from .errors import DBPSInvalidInputError
from .snappycodec import snappy_compress
from .thriftcodec import (
    T_BINARY,
    T_I32,
    T_I64,
    T_LIST,
    T_STRUCT,
    ThriftWriter,
)

MAGIC = b"PAR1"
_TYPE_IDS = {
    "BOOLEAN": 0,
    "INT32": 1,
    "INT64": 2,
    "FLOAT": 4,
    "DOUBLE": 5,
    "BYTE_ARRAY": 6,
}
_CODEC_IDS = {"UNCOMPRESSED": 0, "SNAPPY": 1}
_LOGICAL = {"STRING": "BYTE_ARRAY"}  # logical -> physical + UTF8 tag


class ParquetWriteError(DBPSInvalidInputError):
    """Out-of-subset write request."""


def _plain_encode(values: list, ptype: str) -> bytes:
    out = bytearray()
    if ptype == "INT32":
        for v in values:
            out += struct.pack("<i", int(v))
    elif ptype == "INT64":
        for v in values:
            out += struct.pack("<q", int(v))
    elif ptype == "FLOAT":
        for v in values:
            out += struct.pack("<f", float(v))
    elif ptype == "DOUBLE":
        for v in values:
            out += struct.pack("<d", float(v))
    elif ptype == "BOOLEAN":
        acc = bit = 0
        for v in values:
            if v:
                acc |= 1 << bit
            bit += 1
            if bit == 8:
                out.append(acc)
                acc = bit = 0
        if bit:
            out.append(acc)
    elif ptype == "BYTE_ARRAY":
        for v in values:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(b)) + b
    else:
        raise ParquetWriteError(f"unwritable physical type {ptype}")
    return bytes(out)


def _rle_levels(levels: list) -> bytes:
    """Level run (definition or repetition, any bit width <= 8) as a
    u32-length-prefixed hybrid RLE stream — one run per same-value
    stretch (run values occupy ceil(bit_width/8) = 1 byte)."""
    body = bytearray()
    i = 0
    n = len(levels)
    while i < n:
        j = i
        while j < n and levels[j] == levels[i]:
            j += 1
        run = j - i
        # ULEB128 of (run << 1), then the 1-byte level value
        u = run << 1
        while True:
            b = u & 0x7F
            u >>= 7
            body.append(b | 0x80 if u else b)
            if not u:
                break
        body.append(levels[i])
        i = j
    return struct.pack("<I", len(body)) + bytes(body)


def _strip_list(records: list) -> tuple:
    """One LIST level -> (rep_levels, def_levels, present_values):
    the inverse of the reader's Dremel assembly for the standard
    3-level layout (max_rep 1, max_def 3)."""
    reps: list[int] = []
    defs: list[int] = []
    present: list = []
    for rec in records:
        if rec is None:
            reps.append(0)
            defs.append(0)
        elif not isinstance(rec, (list, tuple)):
            raise ParquetWriteError(
                f"LIST column row is {type(rec).__name__}, not a list"
            )
        elif len(rec) == 0:
            reps.append(0)
            defs.append(1)
        else:
            for i, el in enumerate(rec):
                reps.append(0 if i == 0 else 1)
                if el is None:
                    defs.append(2)
                else:
                    defs.append(3)
                    present.append(el)
    return reps, defs, present


def write_parquet(
    columns: dict,
    types: dict,
    *,
    codec: str = "UNCOMPRESSED",
    page_rows: int | None = None,
) -> bytes:
    """{name: values} + {name: physical-or-LIST<physical> type} ->
    parquet file bytes."""
    if page_rows is not None and page_rows <= 0:
        raise ParquetWriteError(f"page_rows {page_rows} must be positive")
    if codec not in _CODEC_IDS:
        raise ParquetWriteError(
            f"codec {codec!r} is a writer seam (UNCOMPRESSED/SNAPPY)"
        )
    names = list(columns)
    if not names:
        raise ParquetWriteError("no columns")
    n_rows = len(columns[names[0]])
    if any(len(columns[c]) != n_rows for c in names):
        raise ParquetWriteError("columns disagree on row count")

    out = bytearray(MAGIC)
    chunk_meta = []
    for name in names:
        logical = types[name]
        is_list = isinstance(logical, str) and logical.startswith(
            "LIST<"
        ) and logical.endswith(">")
        if is_list:
            logical = logical[5:-1]
        ptype = _LOGICAL.get(logical, logical)
        if ptype not in _TYPE_IDS:
            raise ParquetWriteError(f"bad type {logical!r} for {name!r}")
        values = columns[name]
        nullable = any(v is None for v in values)
        chunk_offset = len(out)
        comp_total = 0
        uncomp_total = 0
        n_leaf_slots = 0
        step = page_rows or max(n_rows, 1)
        for at in range(0, n_rows, step) or [0]:
            page_vals = values[at : at + step]
            body = bytearray()
            if is_list:
                # record-aligned pages: strip THIS page's records into
                # rep/def runs + present leaf values (inverse Dremel)
                reps, defs, present = _strip_list(page_vals)
                body += _rle_levels(reps)
                body += _rle_levels(defs)
                body += _plain_encode(present, ptype)
                page_nv = len(defs)
            else:
                if nullable:
                    body += _rle_levels(
                        [0 if v is None else 1 for v in page_vals]
                    )
                body += _plain_encode(
                    [v for v in page_vals if v is not None], ptype
                )
                page_nv = len(page_vals)
            n_leaf_slots += page_nv
            raw = bytes(body)
            paged = snappy_compress(raw) if codec == "SNAPPY" else raw
            hdr = ThriftWriter()
            hdr.write_struct(
                [
                    (1, T_I32, 0),            # DATA_PAGE
                    (2, T_I32, len(raw)),     # uncompressed size
                    (3, T_I32, len(paged)),   # compressed size
                    (5, T_STRUCT, [           # DataPageHeader
                        (1, T_I32, page_nv),
                        (2, T_I32, 0),        # PLAIN
                        (3, T_I32, 3),        # RLE def levels
                        (4, T_I32, 3),        # RLE rep levels
                    ]),
                ]
            )
            hdr_bytes = hdr.getvalue()
            out += hdr_bytes
            out += paged
            comp_total += len(hdr_bytes) + len(paged)
            uncomp_total += len(hdr_bytes) + len(raw)
        chunk_meta.append(
            {
                "name": name,
                "ptype": ptype,
                "utf8": logical == "STRING",
                "nullable": nullable,
                "list": is_list,
                "num_values": n_leaf_slots,
                "offset": chunk_offset,
                "compressed": comp_total,
                "uncompressed": uncomp_total,
            }
        )

    # --- footer ------------------------------------------------------
    schema_elems = [
        [  # root
            (3, T_I32, 0),                   # repetition (ignored on root)
            (4, T_BINARY, b"schema"),
            (5, T_I32, len(names)),
        ]
    ]
    for m in chunk_meta:
        if m["list"]:
            # standard 3-level LIST: optional group (LIST) ->
            # repeated group 'list' -> optional element
            schema_elems.append([
                (3, T_I32, 1),               # OPTIONAL
                (4, T_BINARY, m["name"].encode("utf-8")),
                (5, T_I32, 1),               # one child
                (6, T_I32, 3),               # ConvertedType LIST
            ])
            schema_elems.append([
                (3, T_I32, 2),               # REPEATED
                (4, T_BINARY, b"list"),
                (5, T_I32, 1),
            ])
            fields = [
                (1, T_I32, _TYPE_IDS[m["ptype"]]),
                (3, T_I32, 1),               # OPTIONAL element
                (4, T_BINARY, b"element"),
            ]
            if m["utf8"]:
                fields.append((6, T_I32, 0))  # ConvertedType UTF8
            schema_elems.append(fields)
            continue
        fields = [
            (1, T_I32, _TYPE_IDS[m["ptype"]]),
            (3, T_I32, 1 if m["nullable"] else 0),
            (4, T_BINARY, m["name"].encode("utf-8")),
        ]
        if m["utf8"]:
            fields.append((6, T_I32, 0))  # ConvertedType UTF8
        schema_elems.append(fields)
    col_structs = []
    for m in chunk_meta:
        path = [m["name"].encode("utf-8")]
        if m["list"]:
            path += [b"list", b"element"]
        col_structs.append(
            [
                (2, T_I64, m["offset"]),     # file_offset
                (3, T_STRUCT, [              # ColumnMetaData
                    (1, T_I32, _TYPE_IDS[m["ptype"]]),
                    (2, T_LIST, (T_I32, [0, 3])),   # PLAIN, RLE
                    (3, T_LIST, (T_BINARY, path)),
                    (4, T_I32, _CODEC_IDS[codec]),
                    (5, T_I64, m["num_values"]),   # LEAF slots
                    (6, T_I64, m["uncompressed"]),
                    (7, T_I64, m["compressed"]),
                    (9, T_I64, m["offset"]),
                ]),
            ]
        )
    footer = ThriftWriter()
    footer.write_struct(
        [
            (1, T_I32, 1),                   # version
            (2, T_LIST, (T_STRUCT, schema_elems)),
            (3, T_I64, n_rows),
            (4, T_LIST, (T_STRUCT, [
                [
                    (1, T_LIST, (T_STRUCT, col_structs)),
                    (2, T_I64, sum(m["uncompressed"]
                                   for m in chunk_meta)),
                    (3, T_I64, n_rows),
                ]
            ])),
            (6, T_BINARY, b"dbps-spark parquetwrite"),
        ]
    )
    blob = footer.getvalue()
    out += blob
    out += struct.pack("<I", len(blob))
    out += MAGIC
    return bytes(out)
