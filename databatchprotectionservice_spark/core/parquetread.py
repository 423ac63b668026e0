"""Parquet column reader — real value decode with no black box.

Composes the from-scratch layers into the read path itself: the
footer/page walk (``core/parquetmeta.py``) locates pages, the codec
layer (``core/compression.py``) inflates them, and THIS module
decodes what is inside a flat column's pages per the public
parquet-format encodings:

* V1 data pages: ``[u32 len][definition levels]`` then values; V2
  data pages: uncompressed level runs up front (lengths from the
  header), values compressed per ``is_compressed``;
* definition levels and dictionary indices share the hybrid
  RLE/bit-packed encoding (ULEB128 run headers, LSB-first groups of
  8) — decoded here in full, not just counted;
* ``PLAIN`` values for BOOLEAN (bit-packed LSB), INT32/INT64/FLOAT/
  DOUBLE (little-endian), INT96 (12-byte), BYTE_ARRAY (u32-prefixed)
  and FIXED_LEN_BYTE_ARRAY;
* ``RLE_DICTIONARY`` / ``PLAIN_DICTIONARY`` data pages: a 1-byte
  index bit width, hybrid-run indices into the (PLAIN-decoded)
  dictionary page.

Null placement follows the decoded definition levels (flat schema:
``max_def`` 0/1); repetition levels beyond 0 (nested lists) are the
documented seam.  Every page must consume its byte budget and yield
exactly its declared value count — short pages raise rather than
truncate.  The unit suite pins decoded values against pyarrow's
reader column-for-column on real files.
"""

from __future__ import annotations

import struct

import numpy as np

from .compression import decompress as _decompress
from .errors import DBPSInvalidInputError
from .pagecodec import read_uleb128
from .parquetmeta import (
    PAGE_DATA,
    PAGE_DATA_V2,
    PAGE_DICTIONARY,
    walk_pages,
)
from .types import CompressionCodec

_PLAIN = 0
_PLAIN_DICTIONARY = 2
_RLE = 3
_RLE_DICTIONARY = 8


class ParquetReadError(DBPSInvalidInputError):
    """Out-of-subset or malformed column content."""


def _hybrid_decode(
    payload: bytes, offset: int, bit_width: int, count: int
) -> tuple:
    """Decode ``count`` values from a hybrid RLE/bit-packed stream."""
    if bit_width == 0:
        return np.zeros(count, dtype=np.int64), offset
    if bit_width > 32:
        raise ParquetReadError(f"bit width {bit_width} out of range")
    out = np.empty(count, dtype=np.int64)
    done = 0
    while done < count:
        header, offset = read_uleb128(payload, offset)
        if header & 1 == 0:  # RLE run
            run = header >> 1
            if run == 0 or run > count - done:
                raise ParquetReadError("invalid RLE run length")
            bw = (bit_width + 7) // 8
            if offset + bw > len(payload):
                raise ParquetReadError("truncated RLE run value")
            out[done : done + run] = int.from_bytes(
                payload[offset : offset + bw], "little"
            )
            offset += bw
            done += run
        else:  # bit-packed groups of 8
            groups = header >> 1
            if groups == 0:
                raise ParquetReadError("invalid bit-packed run")
            run = groups * 8
            nbytes = run * bit_width // 8
            if offset + nbytes > len(payload):
                raise ParquetReadError("truncated bit-packed run")
            packed = np.frombuffer(
                payload, dtype=np.uint8, count=nbytes, offset=offset
            )
            offset += nbytes
            todo = min(run, count - done)
            bit_idx = (
                np.arange(todo, dtype=np.int64)[:, None] * bit_width
                + np.arange(bit_width, dtype=np.int64)
            )
            bits = (packed[bit_idx >> 3] >> (bit_idx & 7)) & 1
            out[done : done + todo] = (
                bits.astype(np.int64) << np.arange(bit_width)
            ).sum(axis=1)
            done += todo
    return out, offset


def _plain_decode(raw: bytes, offset: int, n: int, ptype: str,
                  type_length) -> tuple:
    """Decode n PLAIN values of a physical type; -> (list, new_offset)."""
    if ptype == "INT32":
        end = offset + 4 * n
        if end > len(raw):
            raise ParquetReadError("PLAIN INT32 overruns the page")
        return (
            np.frombuffer(raw, "<i4", n, offset).tolist(), end,
        )
    if ptype == "INT64":
        end = offset + 8 * n
        if end > len(raw):
            raise ParquetReadError("PLAIN INT64 overruns the page")
        return np.frombuffer(raw, "<i8", n, offset).tolist(), end
    if ptype == "FLOAT":
        end = offset + 4 * n
        if end > len(raw):
            raise ParquetReadError("PLAIN FLOAT overruns the page")
        return np.frombuffer(raw, "<f4", n, offset).tolist(), end
    if ptype == "DOUBLE":
        end = offset + 8 * n
        if end > len(raw):
            raise ParquetReadError("PLAIN DOUBLE overruns the page")
        return np.frombuffer(raw, "<f8", n, offset).tolist(), end
    if ptype == "INT96":
        end = offset + 12 * n
        if end > len(raw):
            raise ParquetReadError("PLAIN INT96 overruns the page")
        return (
            [raw[offset + 12 * i : offset + 12 * i + 12] for i in range(n)],
            end,
        )
    if ptype == "BOOLEAN":
        nbytes = (n + 7) // 8
        end = offset + nbytes
        if end > len(raw):
            raise ParquetReadError("PLAIN BOOLEAN overruns the page")
        packed = np.frombuffer(raw, np.uint8, nbytes, offset)
        bits = np.unpackbits(packed, bitorder="little")[:n]
        return [bool(b) for b in bits], end
    if ptype == "BYTE_ARRAY":
        out = []
        for _ in range(n):
            if offset + 4 > len(raw):
                raise ParquetReadError("BYTE_ARRAY length overruns")
            (ln,) = struct.unpack_from("<I", raw, offset)
            offset += 4
            if offset + ln > len(raw):
                raise ParquetReadError("BYTE_ARRAY value overruns")
            out.append(raw[offset : offset + ln])
            offset += ln
        return out, offset
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        if not type_length or type_length <= 0:
            raise ParquetReadError("FLBA without a type length")
        end = offset + type_length * n
        if end > len(raw):
            raise ParquetReadError("FLBA overruns the page")
        return (
            [
                raw[offset + type_length * i : offset + type_length * (i + 1)]
                for i in range(n)
            ],
            end,
        )
    raise ParquetReadError(f"unsupported physical type {ptype}")


def leaf_elements(schema: list) -> list:
    """Pre-order flattened schema -> [(leaf_element, is_nested)] in
    column-chunk order; ``is_nested`` marks leaves under a REPEATED
    ancestor (lists/maps), which carry repetition levels this reader
    treats as the documented seam."""
    out = []

    def walk(idx: int, under_repeated: bool) -> int:
        el = schema[idx]
        rep = under_repeated or el["repetition"] == "REPEATED"
        nxt = idx + 1
        if el["num_children"] == 0:
            out.append((el, rep))
            return nxt
        for _ in range(el["num_children"]):
            nxt = walk(nxt, rep)
        return nxt

    root = schema[0]
    nxt = 1
    for _ in range(root["num_children"]):
        nxt = walk(nxt, False)
    return out


def read_column(
    data: bytes, column: dict, leaf: dict, *, nested: bool = False
) -> list:
    """Decode one flat column chunk to Python values (None = null).

    ``column`` is a ``parse_footer`` column dict; ``leaf`` its schema
    element (repetition REQUIRED/OPTIONAL — REPEATED is the nested
    seam).
    """
    if nested or leaf["repetition"] == "REPEATED":
        raise ParquetReadError("nested (REPEATED) columns are a seam")
    max_def = 1 if leaf["repetition"] == "OPTIONAL" else 0
    codec = CompressionCodec[column["codec"]]
    ptype = column["type"]
    tlen = leaf.get("type_length")

    dict_values = None
    out: list = []
    for page in walk_pages(data, column):
        body = data[
            page["data_offset"] : page["data_offset"]
            + page["compressed_page_size"]
        ]
        if page["type"] == PAGE_DICTIONARY:
            raw = _decompress(
                body, codec, page["uncompressed_page_size"]
            )
            if page["encoding"] not in (_PLAIN, _PLAIN_DICTIONARY):
                raise ParquetReadError(
                    f"dictionary page encoding {page['encoding']}"
                )
            dict_values, end = _plain_decode(
                raw, 0, page["num_values"], ptype, tlen
            )
            if end != len(raw):
                raise ParquetReadError(
                    f"dictionary page has {len(raw) - end} stray bytes"
                )
            continue
        if page["type"] not in (PAGE_DATA, PAGE_DATA_V2):
            continue

        nv = page["num_values"]
        if page["type"] == PAGE_DATA:
            raw = _decompress(
                body, codec, page["uncompressed_page_size"]
            )
            pos = 0
            if max_def > 0:
                if page["definition_level_encoding"] != _RLE:
                    raise ParquetReadError(
                        "non-RLE V1 definition levels are a seam"
                    )
                if pos + 4 > len(raw):
                    raise ParquetReadError("truncated level length")
                (lvl_len,) = struct.unpack_from("<I", raw, pos)
                pos += 4
                if pos + lvl_len > len(raw):
                    raise ParquetReadError("levels overrun the page")
                levels, used = _hybrid_decode(
                    raw[pos : pos + lvl_len], 0, max_def.bit_length(), nv
                )
                pos += lvl_len
            else:
                levels = np.zeros(nv, dtype=np.int64)
        else:  # V2: level runs live UNCOMPRESSED before the values
            dl = page["definition_levels_byte_length"] or 0
            rl = page["repetition_levels_byte_length"] or 0
            if rl:
                raise ParquetReadError("repetition levels are a seam")
            if dl > len(body):
                raise ParquetReadError("V2 levels overrun the page")
            if max_def > 0:
                levels, _ = _hybrid_decode(
                    body[:dl], 0, max_def.bit_length(), nv
                )
            else:
                levels = np.zeros(nv, dtype=np.int64)
            values_body = body[dl:]
            raw = (
                _decompress(
                    values_body,
                    codec,
                    (page["uncompressed_page_size"] or 0) - dl,
                )
                if page["is_compressed"]
                else values_body
            )
            pos = 0

        n_present = int((levels == max_def).sum()) if max_def else nv
        enc = page["encoding"]
        if enc == _PLAIN:
            values, pos = _plain_decode(raw, pos, n_present, ptype, tlen)
        elif enc == _RLE and ptype == "BOOLEAN":
            # spec: RLE-encoded booleans are a u32-length-prefixed
            # hybrid stream at bit width 1
            if pos + 4 > len(raw):
                raise ParquetReadError("truncated RLE boolean length")
            (blen,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            if pos + blen > len(raw):
                raise ParquetReadError("RLE booleans overrun the page")
            bits, _ = _hybrid_decode(
                raw[pos : pos + blen], 0, 1, n_present
            )
            pos += blen
            values = [bool(b) for b in bits]
        elif enc in (_RLE_DICTIONARY, _PLAIN_DICTIONARY):
            if dict_values is None:
                raise ParquetReadError(
                    "dictionary-encoded page without a dictionary"
                )
            if pos >= len(raw):
                raise ParquetReadError("missing index bit width")
            bw = raw[pos]
            pos += 1
            idx, pos = _hybrid_decode(raw, pos, bw, n_present)
            if n_present and (
                idx.min() < 0 or idx.max() >= len(dict_values)
            ):
                raise ParquetReadError("dictionary index out of range")
            values = [dict_values[i] for i in idx]
        else:
            raise ParquetReadError(f"value encoding {enc} is a seam")

        if max_def:
            it = iter(values)
            out.extend(
                next(it) if lv == max_def else None for lv in levels
            )
        else:
            out.extend(values)
    if len(out) != column["num_values"]:
        raise ParquetReadError(
            f"decoded {len(out)} values, chunk declares "
            f"{column['num_values']}"
        )
    return out
