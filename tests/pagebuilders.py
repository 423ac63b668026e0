"""Test-only builders for Parquet-page-shaped payloads.

The moral equivalent of the reference's test-data builders
(``parquet_testing_utils.h:35-132`` and the page builders in
``performance_test.cpp:133-225``) — they define the de-facto spec of the
required ``encoding_attributes`` keys.
"""

from __future__ import annotations

import struct

import numpy as np

from databatchprotectionservice_spark.core import compression as comp
from databatchprotectionservice_spark.core.types import CompressionCodec, PhysicalType


def plain_value_bytes(values: list[bytes], fixed: bool) -> bytes:
    """PLAIN-encode a list of raw element byte strings."""
    if fixed:
        return b"".join(values)
    return b"".join(struct.pack("<I", len(v)) + v for v in values)


def encode_values(values: list, datatype: PhysicalType, length: int | None = None):
    """Python values -> list of raw element bytes."""
    if datatype == PhysicalType.INT32:
        return [np.int32(v).tobytes() for v in values]
    if datatype == PhysicalType.INT64:
        return [np.int64(v).tobytes() for v in values]
    if datatype == PhysicalType.FLOAT:
        return [np.float32(v).tobytes() for v in values]
    if datatype == PhysicalType.DOUBLE:
        return [np.float64(v).tobytes() for v in values]
    if datatype == PhysicalType.INT96:
        return [v.ljust(12, b"\x00")[:12] for v in values]
    if datatype == PhysicalType.FIXED_LEN_BYTE_ARRAY:
        assert length is not None
        return [v.ljust(length, b"\x00")[:length] for v in values]
    if datatype == PhysicalType.BYTE_ARRAY:
        return [v.encode() if isinstance(v, str) else bytes(v) for v in values]
    raise ValueError(datatype)


def rle_def_levels(levels: list[int], max_def_level: int) -> bytes:
    """RLE-encode definition levels as consecutive runs (hybrid format,
    RLE runs only)."""
    bit_width = max_def_level.bit_length()
    byte_width = (bit_width + 7) // 8
    out = bytearray()
    i = 0
    while i < len(levels):
        j = i
        while j < len(levels) and levels[j] == levels[i]:
            j += 1
        run_len = j - i
        out += _uleb128(run_len << 1)
        out += int(levels[i]).to_bytes(byte_width, "little")
        i = j
    return bytes(out)


def bitpacked_def_levels(levels: list[int], max_def_level: int) -> bytes:
    """Bit-pack definition levels into 8-value groups (LSB-first)."""
    bit_width = max_def_level.bit_length()
    num_groups = (len(levels) + 7) // 8
    padded = levels + [0] * (num_groups * 8 - len(levels))
    total_bits = len(padded) * bit_width
    buf = bytearray((total_bits + 7) // 8)
    for i, lvl in enumerate(padded):
        for b in range(bit_width):
            if (lvl >> b) & 1:
                abs_bit = i * bit_width + b
                buf[abs_bit >> 3] |= 1 << (abs_bit & 7)
    return bytes(_uleb128((num_groups << 1) | 1)) + bytes(buf)


def _uleb128(value: int) -> bytearray:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return out


def v1_level_bytes(def_payload: bytes) -> bytes:
    """V1 level bytes with no repetition levels: [u32 len][def payload]."""
    return struct.pack("<I", len(def_payload)) + def_payload


def build_v1_page(
    values: list,
    datatype: PhysicalType,
    codec: CompressionCodec,
    nullable_mask: list[bool] | None = None,
    length: int | None = None,
    packed_levels: bool = False,
):
    """Build (payload, attrs_string_map) for a DATA_PAGE_V1.

    ``nullable_mask[i]`` True means row i is present; None -> required col.
    """
    raw_elems = encode_values(values, datatype, length)
    fixed = datatype != PhysicalType.BYTE_ARRAY
    value_bytes = plain_value_bytes(raw_elems, fixed)
    if nullable_mask is None:
        level_bytes = b""
        num_values = len(values)
        max_def = 0
    else:
        levels = [1 if present else 0 for present in nullable_mask]
        assert sum(levels) == len(values)
        payload = (
            bitpacked_def_levels(levels, 1)
            if packed_levels
            else rle_def_levels(levels, 1)
        )
        level_bytes = v1_level_bytes(payload)
        num_values = len(nullable_mask)
        max_def = 1
    page = comp.compress(level_bytes + value_bytes, codec)
    attrs = {
        "page_type": "DATA_PAGE_V1",
        "data_page_num_values": str(num_values),
        "data_page_max_definition_level": str(max_def),
        "data_page_max_repetition_level": "0",
        "page_v1_definition_level_encoding": "RLE",
        "page_v1_repetition_level_encoding": "RLE",
    }
    return page, attrs


def build_v2_page(
    values: list,
    datatype: PhysicalType,
    codec: CompressionCodec,
    nullable_mask: list[bool] | None = None,
    length: int | None = None,
    is_compressed: bool = True,
):
    raw_elems = encode_values(values, datatype, length)
    fixed = datatype != PhysicalType.BYTE_ARRAY
    value_bytes = plain_value_bytes(raw_elems, fixed)
    if nullable_mask is None:
        def_payload = b""
        num_values, num_nulls = len(values), 0
    else:
        levels = [1 if present else 0 for present in nullable_mask]
        def_payload = rle_def_levels(levels, 1)
        num_values = len(nullable_mask)
        num_nulls = num_values - sum(levels)
    body = comp.compress(value_bytes, codec) if is_compressed else value_bytes
    page = def_payload + body
    attrs = {
        "page_type": "DATA_PAGE_V2",
        "data_page_num_values": str(num_values),
        "data_page_max_definition_level": "1" if nullable_mask is not None else "0",
        "data_page_max_repetition_level": "0",
        "page_v2_definition_levels_byte_length": str(len(def_payload)),
        "page_v2_repetition_levels_byte_length": "0",
        "page_v2_num_nulls": str(num_nulls),
        "page_v2_is_compressed": "true" if is_compressed else "false",
    }
    return page, attrs


def build_dict_page(
    values: list,
    datatype: PhysicalType,
    codec: CompressionCodec,
    length: int | None = None,
):
    raw_elems = encode_values(values, datatype, length)
    fixed = datatype != PhysicalType.BYTE_ARRAY
    value_bytes = plain_value_bytes(raw_elems, fixed)
    page = comp.compress(value_bytes, codec)
    attrs = {
        "page_type": "DICTIONARY_PAGE",
        "dict_page_num_values": str(len(values)),
    }
    return page, attrs
