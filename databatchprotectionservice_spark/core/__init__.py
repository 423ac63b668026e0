"""Pure-Python core codec/crypto library (no Spark dependency).

Mirrors the data plane of the reference service — typed column batches,
per-value encryption with a seeded keystream, a self-describing ciphertext
wire format, block compression, and the per-value -> per-block fallback
sequencer — re-expressed over numpy arrays instead of C++ byte buffers.
"""

from .errors import DBPSError, DBPSInvalidInputError, DBPSUnsupportedError
from .types import CompressionCodec, Encoding, PhysicalType

__all__ = [
    "DBPSError",
    "DBPSInvalidInputError",
    "DBPSUnsupportedError",
    "CompressionCodec",
    "Encoding",
    "PhysicalType",
]
