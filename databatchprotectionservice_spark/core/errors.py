"""Error taxonomy.

Mirrors the reference's two-way split between "this combination is valid but
not supported -> may fall back to per-block mode" and "this input is broken
-> reject" (reference: ``src/common/exceptions.h:39-50``; fallback decision
``src/processing/encryption_sequencer.cpp:128-195``).
"""


class DBPSError(Exception):
    """Base class for all engine errors."""


class DBPSUnsupportedError(DBPSError):
    """A valid but unsupported (datatype, encoding, compression) combination.

    Raising this from the per-value path triggers the sequencer's per-block
    fallback, exactly like ``DBPSUnsupportedException`` in the reference
    (``encryption_sequencer.cpp:160-176``).
    """


class DBPSInvalidInputError(DBPSError):
    """Malformed input (bad lengths, truncated buffers, failed validation).

    Never triggers fallback; surfaces as a structured error from the agent
    API (``dbpa_interface.h:45-53``: no exceptions escape Encrypt/Decrypt).
    """
