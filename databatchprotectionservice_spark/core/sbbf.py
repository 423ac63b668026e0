"""Split-block Bloom filter — parquet's bloom-filter page structure.

Public spec (parquet-format ``BloomFilter.md``): values hash with
XXH64 seed 0 over their PLAIN encoding; the upper 32 hash bits pick a
32-byte block via the unbiased multiply-shift mapping
``((h >> 32) * nblocks) >> 32``; the lower 32 bits generate one bit
in each of the block's eight 32-bit lanes through the published salt
multipliers.  Inserts OR the mask in, lookups require every lane bit
— one cache line per operation, which is why the format chose it.

The XXH64 primitive comes from ``core/zstdmeta.py`` (pinned there by
the published vectors AND Spark's JVM implementation).  pyarrow 16
cannot write parquet bloom pages, so there is no external referee for
the page framing itself; this module therefore implements and pins
the STRUCTURE (salts, block mapping, serialized layout) and the
no-false-negative contract, and the txnlog point-lookup operator uses
it the way parquet readers do: probe, then verify — false positives
die in verification, so end results stay exact.
"""

from __future__ import annotations

import numpy as np

from .errors import DBPSInvalidInputError
from .zstdmeta import xxh64

#: the eight salt multipliers from the parquet specification
SALTS = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)
_M32 = 0xFFFFFFFF


class SbbfError(DBPSInvalidInputError):
    """Invalid split-block bloom parameters or serialized bytes."""


def _mask(x: int) -> np.ndarray:
    """Lower-32-bit hash -> one set bit per lane (vectorized)."""
    salts = np.array(SALTS, dtype=np.uint64)
    shifts = ((np.uint64(x) * salts) & np.uint64(_M32)) >> np.uint64(27)
    return (np.uint32(1) << shifts.astype(np.uint32)).astype(np.uint32)


class SplitBlockBloom:
    """A fixed-size SBBF; size must be a power-of-two byte count >= 32."""

    def __init__(self, nbytes: int = 1024):
        if nbytes < 32 or nbytes & (nbytes - 1):
            raise SbbfError(f"size {nbytes} not a power-of-two >= 32")
        self.nblocks = nbytes // 32
        self.blocks = np.zeros((self.nblocks, 8), dtype=np.uint32)

    # -- hashing ------------------------------------------------------

    @staticmethod
    def hash_int64(v: int) -> int:
        """XXH64 of the PLAIN encoding (8-byte little-endian)."""
        return xxh64(int(v).to_bytes(8, "little", signed=True), 0)

    @staticmethod
    def hash_bytes(v: bytes) -> int:
        """XXH64 of a BYTE_ARRAY's raw bytes (PLAIN minus the length
        prefix, per the spec)."""
        return xxh64(bytes(v), 0)

    # -- core ops -----------------------------------------------------

    def _block_of(self, h: int) -> int:
        return ((h >> 32) * self.nblocks) >> 32

    def insert_hash(self, h: int) -> None:
        self.blocks[self._block_of(h)] |= _mask(h & _M32)

    def check_hash(self, h: int) -> bool:
        m = _mask(h & _M32)
        return bool((self.blocks[self._block_of(h)] & m == m).all())

    def insert_int64(self, v: int) -> None:
        self.insert_hash(self.hash_int64(v))

    def might_contain_int64(self, v: int) -> bool:
        return self.check_hash(self.hash_int64(v))

    # -- wire ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Little-endian lane words, blocks in order — the bitset
        layout of a parquet bloom-filter page body."""
        return self.blocks.astype("<u4").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "SplitBlockBloom":
        if len(data) < 32 or len(data) % 32 or (
            len(data) & (len(data) - 1)
        ):
            raise SbbfError(
                f"serialized size {len(data)} not a power-of-two "
                "multiple of 32"
            )
        out = cls(len(data))
        out.blocks = (
            np.frombuffer(data, dtype="<u4")
            .reshape(out.nblocks, 8)
            .astype(np.uint32)
        )
        return out
