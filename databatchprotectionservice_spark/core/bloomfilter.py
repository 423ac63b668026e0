"""Parquet split-block Bloom filters (SBBF), from scratch.

The reference engine's scan path (``src/processing/page_utils.cpp``
decode seam) never needed probabilistic skipping because pages arrive
pre-split; at 100 TB the parquet layer DOES — a point lookup that
touches every row group of every file is a full scan in disguise.
parquet-format's BloomFilter.md defines the structure the major
writers emit for exactly this: one split-block Bloom filter per
column chunk, XXH64 over the value's PLAIN encoding, a 32-byte block
per hash with one bit set in each of its eight 32-bit lanes.

Everything here follows the two public specs, not a library:

* **XXH64** (Collet's published algorithm): the four lane
  accumulators over 32-byte stripes, the prime-multiply avalanche,
  verified against the reference test vectors in the unit tests.
* **SBBF** (parquet-format BloomFilter.md): ``block_index =
  ((h >> 32) * num_blocks) >> 32`` (fastrange over the TOP half),
  the eight published odd SALT constants each selecting one bit of
  one lane from the LOW half, check = all eight bits set.

The bitset is a power-of-two number of 32-byte blocks (what
parquet-mr emits), sized from an expected distinct count at ~1% false
positives.  ``core/parquetwrite.py`` serializes the
``BloomFilterHeader`` (numBytes + the three singleton unions) ahead
of the raw bitset and points ``ColumnMetaData`` fids 14/15 at it;
``parse_bloom_filter`` walks that layout back.  pyarrow 16 / DuckDB
1.0 neither write nor read parquet Bloom filters, so interop is
pinned the same way as the Gorilla codec: spec-vector unit tests plus
the oracle-gated pruning query whose in-UDF asserts forbid false
negatives against a full scan.
"""

from __future__ import annotations

import struct

from .errors import DBPSInvalidInputError

_MASK64 = (1 << 64) - 1
_MASK32 = (1 << 32) - 1

# XXH64 primes (public reference constants)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK64
    return (_rotl(acc, 31) * _P1) & _MASK64


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the published algorithm, stripe by stripe."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed & _MASK64
        v4 = (seed - _P1) & _MASK64
        for pos in range(0, n - 31, 32):
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = _round(v1, l1)
            v2 = _round(v2, l2)
            v3 = _round(v3, l3)
            v4 = _round(v4, l4)
        pos += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _MASK64
        h = (_rotl(h, 11) * _P1) & _MASK64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


# SBBF salt constants (parquet-format BloomFilter.md, verbatim)
_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)

#: smallest / largest legal bitsets (spec: 32 bytes .. 128 MiB)
MIN_BYTES = 32
MAX_BYTES = 128 * 1024 * 1024


def plain_bytes(value, ptype: str) -> bytes:
    """A value's hash input: its PLAIN encoding with no length prefix
    (BloomFilter.md's hashing contract)."""
    if ptype == "INT32":
        return struct.pack("<i", int(value))
    if ptype == "INT64":
        return struct.pack("<q", int(value))
    if ptype == "FLOAT":
        return struct.pack("<f", float(value) + 0.0)
    if ptype == "DOUBLE":
        # +0.0 folds -0.0 into +0.0 so the two equal floats hash alike
        return struct.pack("<d", float(value) + 0.0)
    if ptype in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        return value.encode("utf-8") if isinstance(value, str) else bytes(value)
    raise DBPSInvalidInputError(f"no bloom hashing for type {ptype}")


class SplitBlockBloomFilter:
    """One chunk's SBBF: ``num_blocks`` 32-byte blocks, each 8 u32
    lanes; one bit per lane per key."""

    def __init__(self, num_bytes: int):
        if num_bytes < MIN_BYTES or num_bytes > MAX_BYTES:
            raise DBPSInvalidInputError(
                f"bloom bitset {num_bytes} outside [{MIN_BYTES}, "
                f"{MAX_BYTES}]"
            )
        if num_bytes % 32:
            raise DBPSInvalidInputError(
                f"bloom bitset {num_bytes} not a whole number of "
                "32-byte blocks"
            )
        self.num_blocks = num_bytes // 32
        self._lanes = [0] * (self.num_blocks * 8)

    @classmethod
    def for_ndv(cls, ndv: int, bits_per_value: float = 10.0):
        """Size for an expected distinct count: ~10 bits/value keeps
        the false-positive rate near 1%; blocks round up to a power
        of two (the parquet-mr convention)."""
        bits = max(256, int(ndv * bits_per_value))
        blocks = 1
        while blocks * 256 < bits and blocks * 32 < MAX_BYTES:
            blocks <<= 1
        return cls(blocks * 32)

    def _mask_at(self, h: int) -> tuple[int, list[int]]:
        block = ((h >> 32) * self.num_blocks) >> 32
        lo = h & _MASK32
        bits = [1 << (((lo * s) & _MASK32) >> 27) for s in _SALT]
        return block, bits

    def insert_hash(self, h: int) -> None:
        block, bits = self._mask_at(h)
        base = block * 8
        for i, b in enumerate(bits):
            self._lanes[base + i] |= b

    def check_hash(self, h: int) -> bool:
        block, bits = self._mask_at(h)
        base = block * 8
        return all(self._lanes[base + i] & b for i, b in enumerate(bits))

    def insert(self, value, ptype: str) -> None:
        # parquet-mr/arrow writers SKIP NaN when populating blooms
        # (NaN equality probes are meaningless and the bit pattern is
        # not canonical); mirror that, like the min/max stats' NaN
        # exclusion, so filters built here agree with other writers'
        if ptype in ("FLOAT", "DOUBLE") and float(value) != float(value):
            return
        self.insert_hash(xxh64(plain_bytes(value, ptype)))

    def might_contain(self, value, ptype: str) -> bool:
        return self.check_hash(xxh64(plain_bytes(value, ptype)))

    def to_bytes(self) -> bytes:
        return struct.pack(f"<{len(self._lanes)}I", *self._lanes)

    @classmethod
    def from_bytes(cls, raw: bytes):
        f = cls(len(raw))
        f._lanes = list(
            struct.unpack(f"<{len(raw) // 4}I", raw)
        )
        return f
