"""Gorilla time-series codec (core/gorillacodec.py).

Randomized + hypothesis roundtrips pin both halves (timestamps
integer-exact, values IEEE-bit-exact including NaN payloads and
signed zeros), hand vectors pin the prefix ladder byte-for-byte, and
the bits arithmetic that makes the SQL oracle possible is asserted
against the encoder's own accounting.
"""

import math
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.gorillacodec import (
    CLASS_BITS,
    BitReader,
    BitWriter,
    GorillaFormatError,
    decode_timestamps,
    decode_values,
    dod_class,
    encode_timestamps,
    encode_values,
)


def test_bit_primitives_roundtrip():
    w = BitWriter()
    fields = [(0b1, 1), (0b10110, 5), (0xDEADBEEF, 32), (0, 7), (1, 64)]
    for v, n in fields:
        w.write(v, n)
    r = BitReader(w.getvalue())
    for v, n in fields:
        assert r.read(n) == v
    with pytest.raises(GorillaFormatError):
        r.read(64)  # past the end
    with pytest.raises(GorillaFormatError):
        BitWriter().write(4, 2)  # does not fit


def test_dod_ladder_vectors():
    """The prefix ladder byte-for-byte: dods 0 / +1 / -200 / +2000 /
    huge land in the five classes with the documented bit costs."""
    assert [dod_class(d) for d in (0, 1, -63, 64, -64, 256, -2047,
                                   2048, 2049, -(10 ** 12))] == [
        0, 1, 1, 1, 2, 2, 3, 3, 4, 4,
    ]
    base = [10_000, 10_100]  # delta 100
    for dod, cls in ((0, 0), (7, 1), (-200, 2), (2000, 3), (10**10, 4)):
        ts = base + [base[1] + 100 + dod]
        blob, hist = encode_timestamps(ts)
        assert hist[cls] == 1 and sum(hist) == 1
        assert decode_timestamps(blob) == ts
        want_bits = 32 + 128 + CLASS_BITS[cls]
        assert len(blob) == (want_bits + 7) // 8


def test_randomized_roundtrips_and_bits_accounting():
    rng = random.Random(42)
    for _ in range(200):
        n = rng.randint(0, 200)
        ts, t, d = [], rng.randint(-(10**15), 10**15), rng.randint(
            -(10**9), 10**9
        )
        for _i in range(n):
            ts.append(t)
            d += rng.choice(
                [0, 0, 0, 1, -1, rng.randint(-5000, 5000),
                 rng.randint(-(10**12), 10**12)]
            )
            t += d
        blob, hist = encode_timestamps(ts)
        assert decode_timestamps(blob) == ts
        want_bits = 32 + min(n, 2) * 64 + sum(
            CLASS_BITS[c] * hist[c] for c in range(5)
        )
        assert len(blob) == (want_bits + 7) // 8
        vals = [
            rng.choice(
                [0.0, -0.0, 1.5, math.nan, math.inf,
                 rng.uniform(-1e9, 1e9), rng.random()]
            )
            for _ in range(n)
        ]
        got = decode_values(encode_values(vals))
        pack = lambda x: struct.pack("<d", x)  # noqa: E731
        assert [pack(x) for x in got] == [pack(x) for x in vals]


@settings(max_examples=80, deadline=None)
@given(
    deltas=st.lists(st.integers(-(10**13), 10**13), max_size=60),
    start=st.integers(-(10**15), 10**15),
)
def test_hypothesis_timestamp_totality(deltas, start):
    ts, t = [], start
    for d in deltas:
        ts.append(t)
        t += d
    blob, _ = encode_timestamps(ts)
    assert decode_timestamps(blob) == ts


@settings(max_examples=80, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=60))
def test_hypothesis_value_bit_exactness(vals):
    got = decode_values(encode_values(vals))
    pack = lambda x: struct.pack("<d", x)  # noqa: E731
    assert [pack(x) for x in got] == [pack(x) for x in vals]


def test_truncated_streams_raise():
    blob, _ = encode_timestamps([1, 2, 3, 4, 5])
    with pytest.raises(GorillaFormatError):
        decode_timestamps(blob[: len(blob) - 1])
    vb = encode_values([1.0, 2.0, 3.0])
    with pytest.raises(GorillaFormatError):
        decode_values(vb[:5])
    assert issubclass(GorillaFormatError, DBPSInvalidInputError)
