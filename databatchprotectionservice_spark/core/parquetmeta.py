"""Parquet file metadata walk — footer, row groups, page headers.

Typed views over the generic compact-protocol reader
(``core/thriftcodec.py``), following the public ``parquet.thrift``
IDL (parquet-format):

* file layout: ``PAR1`` magic at both ends; the last 8 bytes before
  the trailing magic are a little-endian u32 footer length;
* ``FileMetaData``: 1 version, 2 schema (flattened pre-order list of
  ``SchemaElement``), 3 num_rows, 4 row_groups, 6 created_by;
* ``RowGroup``: 1 columns, 2 total_byte_size, 3 num_rows;
* ``ColumnChunk``: 2 file_offset, 3 meta_data (``ColumnMetaData``:
  1 type, 2 encodings, 3 path_in_schema, 4 codec, 5 num_values,
  6 total_uncompressed_size, 7 total_compressed_size,
  9 data_page_offset, 11 dictionary_page_offset);
* ``PageHeader``: 1 type, 2/3 un/compressed sizes, 5 data-page v1
  header, 7 dictionary header, 8 data-page v2 header — walked
  sequentially through a column chunk's byte range;
* page indexes (PageIndex.md, since r14): ``ColumnChunk`` fids 4-7
  locate the chunk's ``OffsetIndex`` (PageLocation list) and
  ``ColumnIndex`` (per-page null_pages/min/max/null_counts under a
  declared BoundaryOrder), parsed by :func:`parse_offset_index` /
  :func:`parse_column_index` — the page-skip half of scan planning.

This is the SCAN-PLANNING layer at 100 TB: row-group pruning, column
-chunk range assignment, and dictionary-page detection all read these
structures and nothing else — a planner touches the footer (one
ranged read of the file tail) and page headers, never the data.  It
is also the missing file-level half of the reference's own domain:
``core/pagecodec.py`` protects page payloads; this walk locates those
pages inside REAL parquet files (pinned against pyarrow-written ones
in the unit suite).

Reference anchors: page framing semantics mirror
``/root/reference/src`` page handling (see ``core/pagecodec.py``
docstrings); the byte layout here is entirely the public
parquet-format specification.
"""

from __future__ import annotations

import struct

from .errors import DBPSInvalidInputError
from .thriftcodec import ThriftFormatError, ThriftReader

MAGIC = b"PAR1"

#: parquet-format enums (public IDL)
TYPE_NAMES = {
    0: "BOOLEAN",
    1: "INT32",
    2: "INT64",
    3: "INT96",
    4: "FLOAT",
    5: "DOUBLE",
    6: "BYTE_ARRAY",
    7: "FIXED_LEN_BYTE_ARRAY",
}
CODEC_NAMES = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}
REPETITION_NAMES = {0: "REQUIRED", 1: "OPTIONAL", 2: "REPEATED"}
PAGE_DATA = 0
PAGE_INDEX = 1
PAGE_DICTIONARY = 2
PAGE_DATA_V2 = 3


class ParquetFormatError(DBPSInvalidInputError):
    """Malformed parquet container metadata."""


def _utf8(b, what: str) -> str:
    if not isinstance(b, (bytes, bytearray)):
        raise ParquetFormatError(f"{what} is not a binary field")
    try:
        return bytes(b).decode("utf-8")
    except UnicodeDecodeError as e:
        raise ParquetFormatError(f"{what} is not UTF-8: {e}") from None


def _int(v, what: str) -> int:
    if not isinstance(v, int) or isinstance(v, bool):
        raise ParquetFormatError(f"{what} is not an integer")
    return v


def _list(v, what: str) -> list:
    if not isinstance(v, list):
        raise ParquetFormatError(f"{what} is not a list")
    return v


def _struct(v, what: str) -> dict:
    if not isinstance(v, dict):
        raise ParquetFormatError(f"{what} is not a struct")
    return v


def _schema_element(raw) -> dict:
    s = _struct(raw, "SchemaElement")
    return {
        "name": _utf8(s.get(4, b""), "schema name"),
        "type": TYPE_NAMES.get(s.get(1)) if 1 in s else None,
        "type_length": s.get(2),
        "repetition": REPETITION_NAMES.get(s.get(3)) if 3 in s else None,
        "num_children": _int(s.get(5, 0), "num_children"),
        "converted_type": s.get(6),
    }


def _column_chunk(raw) -> dict:
    c = _struct(raw, "ColumnChunk")
    m = _struct(c.get(3), "ColumnMetaData")
    codec = _int(m.get(4, -1), "codec")
    ptype = _int(m.get(1, -1), "column type")
    if codec not in CODEC_NAMES:
        raise ParquetFormatError(f"unknown codec id {codec}")
    if ptype not in TYPE_NAMES:
        raise ParquetFormatError(f"unknown physical type id {ptype}")
    return {
        "file_offset": _int(c.get(2, 0), "file_offset"),
        # page-index pointers (ColumnChunk fids 4-7) — present when
        # the writer emitted OffsetIndex/ColumnIndex structures
        # between the row groups and the footer
        "offset_index_offset": (
            _int(c[4], "offset_index_offset") if 4 in c else None
        ),
        "offset_index_length": (
            _int(c[5], "offset_index_length") if 5 in c else None
        ),
        "column_index_offset": (
            _int(c[6], "column_index_offset") if 6 in c else None
        ),
        "column_index_length": (
            _int(c[7], "column_index_length") if 7 in c else None
        ),
        "path_in_schema": ".".join(
            _utf8(p, "path segment")
            for p in _list(m.get(3, []), "path_in_schema")
        ),
        "type": TYPE_NAMES[ptype],
        "codec": CODEC_NAMES[codec],
        "encodings": [
            _int(e, "encoding") for e in _list(m.get(2, []), "encodings")
        ],
        "num_values": _int(m.get(5, 0), "num_values"),
        "total_uncompressed_size": _int(
            m.get(6, 0), "total_uncompressed_size"
        ),
        "total_compressed_size": _int(
            m.get(7, 0), "total_compressed_size"
        ),
        "data_page_offset": _int(m.get(9, 0), "data_page_offset"),
        "dictionary_page_offset": (
            _int(m[11], "dictionary_page_offset") if 11 in m else None
        ),
        "statistics": _statistics(m.get(12), TYPE_NAMES[ptype]),
        # split-block Bloom filter pointers (ColumnMetaData fids
        # 14/15, BloomFilter.md) — parse_bloom_filter dereferences
        "bloom_filter_offset": (
            _int(m[14], "bloom_filter_offset") if 14 in m else None
        ),
        "bloom_filter_length": (
            _int(m[15], "bloom_filter_length") if 15 in m else None
        ),
    }


#: Statistics min/max wire form -> python value, per physical type
#: (PLAIN encoding of one value, no length prefix)
_STAT_FMT = {"INT32": "<i", "INT64": "<q", "FLOAT": "<f", "DOUBLE": "<d"}


def _stat_value(raw, ptype: str):
    if not isinstance(raw, (bytes, bytearray)):
        raise ParquetFormatError("statistics value is not binary")
    fmt = _STAT_FMT.get(ptype)
    if fmt is not None:
        if len(raw) != struct.calcsize(fmt):
            raise ParquetFormatError(
                f"statistics value of {len(raw)} bytes for {ptype}"
            )
        return struct.unpack(fmt, raw)[0]
    if ptype == "BOOLEAN":
        return bool(raw and raw[0])
    return bytes(raw)  # BYTE_ARRAY / FIXED / INT96: raw bytes


#: physical types whose DEPRECATED min/max (fids 2/1) are trustworthy:
#: their legacy sort order was unambiguous.  parquet-mr wrote legacy
#: BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY bounds with SIGNED byte ordering
#: (PARQUET-251), and INT96 bounds with undefined ordering, so major
#: readers ignore those; surfacing them as typed stats would hand a
#: planner incorrect pruning bounds (ADVICE r13).
_LEGACY_STAT_OK = {"INT32", "INT64", "FLOAT", "DOUBLE", "BOOLEAN"}


def _statistics(s, ptype: str):
    """ColumnMetaData.statistics (fid 12) -> typed dict or None.
    Prefers the modern min_value/max_value (fids 6/5); falls back to
    the deprecated min/max (fids 2/1) only when the modern pair is
    absent AND the physical type's legacy sort order was unambiguous
    (``_LEGACY_STAT_OK``) — matching how the major readers treat
    legacy files.  Legacy BYTE_ARRAY/FIXED/INT96 bounds surface as
    None: null_count/distinct_count are still returned."""
    if s is None:
        return None
    if not isinstance(s, dict):
        raise ParquetFormatError("statistics is not a struct")
    legacy_ok = ptype in _LEGACY_STAT_OK
    lo = s.get(6, s.get(2) if legacy_ok else None)
    hi = s.get(5, s.get(1) if legacy_ok else None)
    return {
        "null_count": _int(s[3], "null_count") if 3 in s else None,
        "distinct_count": _int(s[4], "distinct_count") if 4 in s else None,
        "min_value": None if lo is None else _stat_value(lo, ptype),
        "max_value": None if hi is None else _stat_value(hi, ptype),
    }


#: BoundaryOrder enum (parquet-format PageIndex.md)
BOUNDARY_ORDER_NAMES = {0: "UNORDERED", 1: "ASCENDING", 2: "DESCENDING"}


def parse_column_index(data: bytes, column: dict) -> dict | None:
    """ColumnChunk's ColumnIndex (page-level min/max/null bounds) ->
    typed dict, or None when the chunk carries no index.

    parquet-format PageIndex.md: 1 null_pages, 2 min_values,
    3 max_values, 4 boundary_order, 5 null_counts.  Entries for
    all-null pages surface min/max as None (the wire holds byte[0]).
    This is the page-PRUNING half of the scan-planning layer: a
    selective range predicate intersects these bounds, then reads
    only the surviving pages through :func:`parse_offset_index`."""
    off, ln = column.get("column_index_offset"), column.get(
        "column_index_length"
    )
    if off is None:
        return None
    if ln is None or not 0 <= off <= off + ln <= len(data):
        raise ParquetFormatError("column index range outside the file")
    try:
        s = ThriftReader(data, off).read_struct()
    except ThriftFormatError as e:
        raise ParquetFormatError(f"column index: {e}") from None
    null_pages = [bool(b) for b in _list(s.get(1, []), "null_pages")]
    mins_raw = _list(s.get(2, []), "min_values")
    maxs_raw = _list(s.get(3, []), "max_values")
    if not len(null_pages) == len(mins_raw) == len(maxs_raw):
        raise ParquetFormatError(
            "column index page lists disagree on length"
        )
    ptype = column["type"]
    mins, maxs = [], []
    for np_, lo, hi in zip(null_pages, mins_raw, maxs_raw):
        mins.append(None if np_ else _stat_value(lo, ptype))
        maxs.append(None if np_ else _stat_value(hi, ptype))
    order = _int(s.get(4, 0), "boundary_order")
    if order not in BOUNDARY_ORDER_NAMES:
        raise ParquetFormatError(f"unknown boundary order {order}")
    ncounts = (
        [_int(v, "null_count") for v in _list(s[5], "null_counts")]
        if 5 in s
        else None
    )
    if ncounts is not None and len(ncounts) != len(null_pages):
        raise ParquetFormatError("null_counts length mismatch")
    return {
        "null_pages": null_pages,
        "min_values": mins,
        "max_values": maxs,
        "boundary_order": BOUNDARY_ORDER_NAMES[order],
        "null_counts": ncounts,
    }


def parse_offset_index(data: bytes, column: dict) -> list | None:
    """ColumnChunk's OffsetIndex -> [{offset, compressed_page_size,
    first_row_index}] (data pages only, file order), or None when
    absent.  With the ColumnIndex this gives a reader the exact byte
    range and starting row of every page it chose to keep."""
    off, ln = column.get("offset_index_offset"), column.get(
        "offset_index_length"
    )
    if off is None:
        return None
    if ln is None or not 0 <= off <= off + ln <= len(data):
        raise ParquetFormatError("offset index range outside the file")
    try:
        s = ThriftReader(data, off).read_struct()
    except ThriftFormatError as e:
        raise ParquetFormatError(f"offset index: {e}") from None
    locs = []
    prev_row = -1
    for raw in _list(s.get(1, []), "page_locations"):
        loc = _struct(raw, "PageLocation")
        fri = _int(loc.get(3, 0), "first_row_index")
        if fri <= prev_row:
            raise ParquetFormatError(
                "offset index first_row_index not increasing"
            )
        prev_row = fri
        locs.append(
            {
                "offset": _int(loc.get(1, -1), "page offset"),
                "compressed_page_size": _int(
                    loc.get(2, -1), "compressed_page_size"
                ),
                "first_row_index": fri,
            }
        )
    return locs


def parse_bloom_filter(data: bytes, column: dict):
    """ColumnMetaData's split-block Bloom filter -> a queryable
    :class:`~.bloomfilter.SplitBlockBloomFilter`, or None when the
    chunk carries none.

    Layout (BloomFilter.md): ``BloomFilterHeader`` (numBytes fid 1 +
    the algorithm/hash/compression unions, fids 2-4) immediately
    followed by the raw bitset.  Only the published singleton union
    arms (SPLIT_BLOCK / XXHASH / UNCOMPRESSED — each fid 1) are
    accepted; an unknown arm is an unsupported filter, refused rather
    than mis-hashed."""
    from .bloomfilter import SplitBlockBloomFilter

    off = column.get("bloom_filter_offset")
    if off is None:
        return None
    if not 0 <= off < len(data):
        raise ParquetFormatError("bloom filter offset outside the file")
    r = ThriftReader(data, off)
    try:
        s = r.read_struct()
    except ThriftFormatError as e:
        raise ParquetFormatError(f"bloom header: {e}") from None
    num_bytes = _int(s.get(1, -1), "bloom numBytes")
    for fid, what in ((2, "algorithm"), (3, "hash"), (4, "compression")):
        union = _struct(s.get(fid, {}), f"bloom {what}")
        if list(union) != [1]:
            raise ParquetFormatError(
                f"unsupported bloom {what} arm {sorted(union)}"
            )
    if num_bytes <= 0 or r.pos + num_bytes > len(data):
        raise ParquetFormatError("bloom bitset escapes the file")
    ln = column.get("bloom_filter_length")
    if ln is not None and (r.pos - off) + num_bytes != ln:
        raise ParquetFormatError(
            "bloom_filter_length disagrees with header + bitset"
        )
    return SplitBlockBloomFilter.from_bytes(
        data[r.pos : r.pos + num_bytes]
    )


def parse_footer(data: bytes) -> dict:
    """Whole-file bytes -> typed FileMetaData.

    At 100 TB a planner feeds this the file TAIL from a ranged read
    (magic + u32 length locate the thrift blob without touching the
    data); whole-file bytes work identically.
    """
    if len(data) < 12:
        raise ParquetFormatError("file shorter than the parquet framing")
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ParquetFormatError("missing PAR1 magic")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    if flen == 0 or start < 4:
        raise ParquetFormatError(f"footer length {flen} out of range")
    try:
        meta = ThriftReader(data, start).read_struct()
    except ThriftFormatError as e:
        raise ParquetFormatError(f"footer thrift: {e}") from None

    schema = [
        _schema_element(s) for s in _list(meta.get(2, []), "schema")
    ]
    if not schema:
        raise ParquetFormatError("footer has no schema elements")
    row_groups = []
    for rg_raw in _list(meta.get(4, []), "row_groups"):
        rg = _struct(rg_raw, "RowGroup")
        row_groups.append(
            {
                "num_rows": _int(rg.get(3, 0), "row-group num_rows"),
                # SortingColumn list (fid 4): declared sort order —
                # (leaf index, descending, nulls_first) triples
                "sorting_columns": [
                    (
                        _int(_struct(sc, "SortingColumn").get(1, 0),
                             "sorting column_idx"),
                        bool(_struct(sc, "SortingColumn").get(2, False)),
                        bool(_struct(sc, "SortingColumn").get(3, False)),
                    )
                    for sc in _list(rg.get(4, []), "sorting_columns")
                ],
                "total_byte_size": _int(
                    rg.get(2, 0), "total_byte_size"
                ),
                "columns": [
                    _column_chunk(c)
                    for c in _list(rg.get(1, []), "columns")
                ],
            }
        )
    n_leaves = {len(rg["columns"]) for rg in row_groups}
    if len(n_leaves) > 1:
        raise ParquetFormatError(
            f"row groups disagree on column count: {sorted(n_leaves)}"
        )
    return {
        "version": _int(meta.get(1, 0), "version"),
        "num_rows": _int(meta.get(3, 0), "num_rows"),
        "created_by": (
            _utf8(meta[6], "created_by") if 6 in meta else None
        ),
        "schema": schema,
        "row_groups": row_groups,
    }


def walk_pages(data: bytes, column: dict) -> list:
    """Walk every page header in one column chunk's byte range.

    -> [{type, num_values, compressed_page_size,
    uncompressed_page_size}]; the walk must land EXACTLY on the end of
    ``total_compressed_size`` and the data-page value total must equal
    the chunk's ``num_values`` — both raise otherwise, so a framing
    bug cannot under-report pages silently.
    """
    start = column["data_page_offset"]
    if column["dictionary_page_offset"] is not None:
        start = min(start, column["dictionary_page_offset"])
    end = start + column["total_compressed_size"]
    if not 0 <= start <= end <= len(data):
        raise ParquetFormatError(
            f"column chunk range [{start}, {end}) outside the file"
        )
    pages = []
    pos = start
    values = 0
    while pos < end:
        page, pos = _parse_page_at(data, pos, end)
        values += page["num_values"] if page["type"] != PAGE_DICTIONARY else 0
        pages.append(page)
    if pos != end:
        raise ParquetFormatError(
            f"page walk overran the chunk by {pos - end} bytes"
        )
    if values != column["num_values"]:
        raise ParquetFormatError(
            f"data pages carry {values} values, chunk declares "
            f"{column['num_values']}"
        )
    return pages


def prune_pages(cindex: dict, lo, hi) -> list[int]:
    """Ordinals of data pages whose [min, max] intersects [lo, hi]
    (either bound None = unbounded) — the ColumnIndex pruning
    decision.  All-null pages never match a value predicate; bounds
    compare in the type's surfaced representation (ints/floats as
    numbers, BYTE_ARRAY as bytes — the same unsigned-bytewise order
    the writer's stats use)."""
    keep = []
    for i, (nullp, mn, mx) in enumerate(
        zip(
            cindex["null_pages"],
            cindex["min_values"],
            cindex["max_values"],
        )
    ):
        if nullp:
            continue
        if (lo is None or mx >= lo) and (hi is None or mn <= hi):
            keep.append(i)
    return keep


def indexed_pages(data: bytes, column: dict, keep: list[int]) -> list:
    """Pages selected through the OffsetIndex: the dictionary page
    (when the chunk has one) followed by exactly the data pages whose
    ordinals are in ``keep`` — each header parsed at its indexed
    offset.  Skipped pages' bytes are never touched; at 100 TB each
    kept page is one ranged read, which is the entire point of the
    page index.  Returns ``walk_pages``-shaped dicts plus the page's
    ``first_row_index``."""
    locs = parse_offset_index(data, column)
    if locs is None:
        raise ParquetFormatError("column chunk has no offset index")
    pages = []
    dpo = column["dictionary_page_offset"]
    if dpo is not None:
        page, _ = _parse_page_at(data, dpo, len(data))
        if page["type"] != PAGE_DICTIONARY:
            raise ParquetFormatError(
                "dictionary_page_offset does not hold a dictionary page"
            )
        page["first_row_index"] = None
        pages.append(page)
    for i in sorted(set(keep)):
        if not 0 <= i < len(locs):
            raise ParquetFormatError(
                f"page ordinal {i} outside the offset index "
                f"({len(locs)} pages)"
            )
        loc = locs[i]
        end = loc["offset"] + loc["compressed_page_size"]
        if not 0 <= loc["offset"] <= end <= len(data):
            raise ParquetFormatError(
                f"offset index page {i} outside the file"
            )
        page, nxt = _parse_page_at(data, loc["offset"], end)
        if nxt != end:
            raise ParquetFormatError(
                f"page {i} does not fill its indexed byte range"
            )
        if page["type"] not in (PAGE_DATA, PAGE_DATA_V2):
            raise ParquetFormatError(
                f"offset index page {i} is not a data page"
            )
        page["first_row_index"] = loc["first_row_index"]
        pages.append(page)
    return pages


def _parse_page_at(data: bytes, pos: int, end: int) -> tuple[dict, int]:
    """Parse ONE page header at ``pos`` (payload bounded by ``end``)
    -> (typed page dict, position after the page's payload)."""
    r = ThriftReader(data, pos)
    try:
        h = r.read_struct()
    except ThriftFormatError as e:
        raise ParquetFormatError(
            f"page header at {pos}: {e}"
        ) from None
    ptype = _int(h.get(1, -1), "page type")
    comp = _int(h.get(3, -1), "compressed_page_size")
    if comp < 0 or r.pos + comp > end:
        raise ParquetFormatError(
            f"page at {pos} overruns its column chunk"
        )
    page = {
        "type": ptype,
        "compressed_page_size": comp,
        "uncompressed_page_size": _int(
            h.get(2, -1), "uncompressed_page_size"
        ),
        # payload byte range: [data_offset, data_offset + comp)
        "data_offset": r.pos,
        # optional page CRC (PageHeader fid 4): CRC-32 over the
        # payload bytes after the header, both page versions
        "crc": _int(h[4], "page crc") & 0xFFFFFFFF if 4 in h else None,
        "encoding": None,
        "definition_level_encoding": None,
        "repetition_level_encoding": None,
        "num_nulls": None,
        "definition_levels_byte_length": None,
        "repetition_levels_byte_length": None,
        "is_compressed": True,
    }
    if ptype == PAGE_DATA:
        sub = _struct(h.get(5), "data page header")
        nv = _int(sub.get(1, 0), "page num_values")
        page["encoding"] = _int(sub.get(2, 0), "page encoding")
        page["definition_level_encoding"] = _int(
            sub.get(3, 3), "def-level encoding"
        )
        page["repetition_level_encoding"] = _int(
            sub.get(4, 3), "rep-level encoding"
        )
    elif ptype == PAGE_DATA_V2:
        sub = _struct(h.get(8), "data page v2 header")
        nv = _int(sub.get(1, 0), "page num_values")
        page["encoding"] = _int(sub.get(4, 0), "page encoding")
        page["num_nulls"] = _int(sub.get(2, 0), "num_nulls")
        page["definition_levels_byte_length"] = _int(
            sub.get(5, 0), "def-levels byte length"
        )
        page["repetition_levels_byte_length"] = _int(
            sub.get(6, 0), "rep-levels byte length"
        )
        page["is_compressed"] = bool(sub.get(7, True))
    elif ptype == PAGE_DICTIONARY:
        sub = _struct(h.get(7), "dictionary page header")
        nv = _int(sub.get(1, 0), "dictionary num_values")
        page["encoding"] = _int(sub.get(2, 0), "dict encoding")
    elif ptype == PAGE_INDEX:
        nv = 0
    else:
        raise ParquetFormatError(f"unknown page type {ptype}")
    page["num_values"] = nv
    return page, r.pos + comp
