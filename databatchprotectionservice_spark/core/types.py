"""Type system: Parquet physical types + codec/encoding enums.

The reference's ``Type::type`` is a copy of ``parquet::Type``
(``src/common/enums.h:22-36``); ``CompressionCodec`` (``enums.h:40-53``) and
``Encoding`` (``enums.h:58-72``) mirror Parquet's. String <-> enum lookup
mirrors ``src/common/enum_utils.cpp:52-121``.
"""

from __future__ import annotations

import enum

import numpy as np


class PhysicalType(enum.IntEnum):
    """Parquet physical types (reference ``enums.h:26-35``)."""

    BOOLEAN = 0
    INT32 = 1
    INT64 = 2
    INT96 = 3
    FLOAT = 4
    DOUBLE = 5
    BYTE_ARRAY = 6
    FIXED_LEN_BYTE_ARRAY = 7

    @property
    def fixed_width(self) -> int | None:
        """Per-element byte width for fixed-size types; None for variable
        or externally-specified widths."""
        return _FIXED_WIDTHS.get(self)

    @property
    def numpy_dtype(self) -> np.dtype | None:
        """Little-endian numpy dtype for plain-decodable scalar types."""
        return _NUMPY_DTYPES.get(self)


_FIXED_WIDTHS = {
    PhysicalType.INT32: 4,
    PhysicalType.INT64: 8,
    PhysicalType.INT96: 12,
    PhysicalType.FLOAT: 4,
    PhysicalType.DOUBLE: 8,
}

_NUMPY_DTYPES = {
    PhysicalType.INT32: np.dtype("<i4"),
    PhysicalType.INT64: np.dtype("<i8"),
    PhysicalType.FLOAT: np.dtype("<f4"),
    PhysicalType.DOUBLE: np.dtype("<f8"),
}


class CompressionCodec(enum.IntEnum):
    """Compression codecs named after Parquet's set (reference
    ``enums.h:40-53``).

    CAUTION: the INTEGER VALUES here are NOT parquet.thrift's codec
    ids (Parquet has BROTLI=4/ZSTD=6/LZO=3/LZ4_RAW=7) — conversion is
    name-based only (``to_compression_codec``); never construct this
    enum from a raw Parquet footer/page-header integer.

    The reference implements only UNCOMPRESSED and SNAPPY
    (``compression_utils.cpp:26-82``); we additionally support GZIP, ZSTD,
    LZ4_RAW and BROTLI via pyarrow, and keep the rest as unsupported to
    exercise the same fallback path.
    """

    UNCOMPRESSED = 0
    SNAPPY = 1
    GZIP = 2
    BROTLI = 3
    ZSTD = 4
    LZ4 = 5
    LZ4_FRAME = 6
    LZO = 7
    BZ2 = 8
    LZ4_HADOOP = 9
    # not in the reference enum; pyarrow's raw-block LZ4 used internally
    LZ4_RAW = 10


class Encoding(enum.IntEnum):
    """Parquet encodings (reference ``enums.h:58-72``). Only PLAIN is
    per-value decodable; RLE_DICTIONARY pages fall back to per-block
    (``parquet_utils.cpp:427-431``)."""

    PLAIN = 0
    PLAIN_DICTIONARY = 2
    RLE = 3
    BIT_PACKED = 4
    DELTA_BINARY_PACKED = 5
    DELTA_LENGTH_BYTE_ARRAY = 6
    DELTA_BYTE_ARRAY = 7
    RLE_DICTIONARY = 8
    BYTE_STREAM_SPLIT = 9
    UNDEFINED = 10
    UNKNOWN = 11


_TYPE_NAMES = {t.name: t for t in PhysicalType}
_CODEC_NAMES = {c.name: c for c in CompressionCodec}
_ENCODING_NAMES = {e.name: e for e in Encoding}


def to_physical_type(name: str) -> PhysicalType:
    try:
        return _TYPE_NAMES[name.upper()]
    except KeyError:
        raise ValueError(f"unknown physical type: {name!r}") from None


def to_compression_codec(name: str) -> CompressionCodec:
    try:
        return _CODEC_NAMES[name.upper()]
    except KeyError:
        raise ValueError(f"unknown compression codec: {name!r}") from None


def to_encoding(name: str) -> Encoding:
    try:
        return _ENCODING_NAMES[name.upper()]
    except KeyError:
        raise ValueError(f"unknown encoding: {name!r}") from None
