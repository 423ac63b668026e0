"""CBOR codec vs RFC 8949's OWN test vectors (Appendix A).

The spec publishes the byte encoding of several dozen data items;
those are the independent referee here (no third-party CBOR library
ships in this environment — by design the vectors are stronger, they
pin the wire format itself).  Encode direction asserts byte-exact
preferred serialization; decode covers the indefinite-length and
half-float forms the encoder never emits.  A 3000-mutation battery
proves every escape from hostile bytes is the domain error.
"""

import math
import random

import pytest

from databatchprotectionservice_spark.core.cborcodec import (
    MAX_DEPTH,
    UNDEFINED,
    CborFormatError,
    CborTag,
    dumps,
    loads,
)
from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)

# (value, hex) pairs straight from RFC 8949 Appendix A where the
# encoder's preferred serialization matches the listed bytes
_RFC_TWO_WAY = [
    (0, "00"),
    (1, "01"),
    (10, "0a"),
    (23, "17"),
    (24, "1818"),
    (25, "1819"),
    (100, "1864"),
    (1000, "1903e8"),
    (1000000, "1a000f4240"),
    (1000000000000, "1b000000e8d4a51000"),
    (18446744073709551615, "1bffffffffffffffff"),
    (-1, "20"),
    (-10, "29"),
    (-100, "3863"),
    (-1000, "3903e7"),
    (False, "f4"),
    (True, "f5"),
    (None, "f6"),
    (UNDEFINED, "f7"),
    ("", "60"),
    ("a", "6161"),
    ("IETF", "6449455446"),
    ('"\\', "62225c"),
    ("ü", "62c3bc"),
    ("水", "63e6b0b4"),
    (b"", "40"),
    (b"\x01\x02\x03\x04", "4401020304"),
    ([], "80"),
    ([1, 2, 3], "83010203"),
    ([1, [2, 3], [4, 5]], "8301820203820405"),
    (list(range(1, 26)),
     "98190102030405060708090a0b0c0d0e0f101112131415161718181819"),
    ({}, "a0"),
    ({1: 2, 3: 4}, "a201020304"),
    ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
    (["a", {"b": "c"}], "826161a161626163"),
    (0.0, "f90000"),
    (1.5, "f93e00"),
    (65504.0, "f97bff"),
    (100000.0, "fa47c35000"),
    (3.4028234663852886e38, "fa7f7fffff"),
    (1.1, "fb3ff199999999999a"),
    (1.0e300, "fb7e37e43c8800759c"),
    (5.960464477539063e-8, "f90001"),
    (0.00006103515625, "f90400"),
    (-4.0, "f9c400"),
    (-4.1, "fbc010666666666666"),
    (math.inf, "f97c00"),
    (-math.inf, "f9fc00"),
    (CborTag(0, "2013-03-21T20:04:00Z"),
     "c074323031332d30332d32315432303a30343a30305a"),
    (CborTag(1, 1363896240), "c11a514b67b0"),
    (CborTag(1, 1363896240.5), "c1fb41d452d9ec200000"),
    (CborTag(23, b"\x01\x02\x03\x04"), "d74401020304"),
    (CborTag(24, b"\x64\x49\x45\x54\x46"), "d818456449455446"),
    (CborTag(32, "http://www.example.com"),
     "d82076687474703a2f2f7777772e6578616d706c652e636f6d"),
]

# decode-only forms (indefinite lengths, NaN, 25-element map key)
_RFC_DECODE_ONLY = [
    ("f97e00", math.nan),
    ("5f42010243030405ff", b"\x01\x02\x03\x04\x05"),
    ("7f657374726561646d696e67ff", "streaming"),
    ("9fff", []),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("9f01820203820405ff", [1, [2, 3], [4, 5]]),
    ("83018202039f0405ff", [1, [2, 3], [4, 5]]),
    ("83019f0203ff820405", [1, [2, 3], [4, 5]]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    ("826161bf61626163ff", ["a", {"b": "c"}]),
    ("bf6346756ef563416d7421ff", {"Fun": True, "Amt": -2}),
    ("fb7ff0000000000000", math.inf),  # double infinity decodes too
]


def test_rfc_vectors_encode_exact():
    for value, hexs in _RFC_TWO_WAY:
        assert dumps(value).hex() == hexs, value


def test_rfc_vectors_decode_exact():
    for value, hexs in _RFC_TWO_WAY:
        got = loads(bytes.fromhex(hexs))
        assert got == value and type(got) is type(value), value


def test_rfc_decode_only_forms():
    for hexs, want in _RFC_DECODE_ONLY:
        got = loads(bytes.fromhex(hexs))
        if isinstance(want, float) and math.isnan(want):
            assert math.isnan(got)
        else:
            assert got == want, hexs


def test_roundtrip_structures():
    cases = [
        {"event": "click", "ids": [1, -2, 3], "meta": {"ok": True},
         "blob": b"\x00\xff", "score": 2.5, "none": None},
        [[[[1]]]],
        CborTag(4, [-6, 1363896240123456]),  # decimal fraction: us
        {b"bytes-key": 1, 7: "int-key", True: "bool-key"},
        "\U0001f600 astral",
        [float("inf"), -0.0, 1e-300],
    ]
    for v in cases:
        assert loads(dumps(v)) == v, v


def test_guards():
    assert issubclass(CborFormatError, DBPSInvalidInputError)
    with pytest.raises(CborFormatError, match="trailing"):
        loads(bytes.fromhex("0000"))
    with pytest.raises(CborFormatError, match="empty"):
        loads(b"")
    with pytest.raises(CborFormatError, match="break"):
        loads(bytes.fromhex("ff"))
    with pytest.raises(CborFormatError, match="duplicate"):
        loads(bytes.fromhex("a201020104"))  # {1:2, 1:4}
    with pytest.raises(CborFormatError, match="unhashable"):
        loads(bytes.fromhex("a18001"))  # {[]: 1}
    with pytest.raises(CborFormatError, match="reserved"):
        loads(bytes.fromhex("1c"))  # additional info 28
    with pytest.raises(CborFormatError, match="below 32"):
        loads(bytes.fromhex("f818"))  # two-byte simple 24
    with pytest.raises(CborFormatError, match="indefinite"):
        loads(bytes.fromhex("1f"))  # indefinite uint
    with pytest.raises(CborFormatError, match="wrong type"):
        loads(bytes.fromhex("5f6161ff"))  # text chunk in byte string
    with pytest.raises(CborFormatError, match="not UTF-8"):
        loads(bytes.fromhex("61ff"))
    deep = bytes([0x81]) * (MAX_DEPTH + 2) + b"\x00"
    with pytest.raises(CborFormatError, match="nesting"):
        loads(deep)
    with pytest.raises(CborFormatError, match="cannot encode"):
        dumps(object())


def test_truncation_matrix():
    for value, hexs in _RFC_TWO_WAY:
        raw = bytes.fromhex(hexs)
        for cut in range(len(raw)):
            with pytest.raises(CborFormatError):
                loads(raw[:cut])


def test_mutation_battery():
    bases = [
        bytearray(dumps({"event": "click", "ids": list(range(30)),
                         "blob": b"\x01" * 40, "f": 1.25,
                         "tag": CborTag(1, 1363896240)})),
        bytearray(dumps([list(range(100)), "x" * 200, None, True])),
        bytearray(bytes.fromhex("9f018202039f0405ffff")),
    ]
    random.seed(43)
    for _ in range(3000):
        b = bytearray(random.choice(bases))
        for _ in range(random.randint(1, 8)):
            op = random.random()
            if op < 0.5 and b:
                b[random.randrange(len(b))] = random.randrange(256)
            elif op < 0.75 and len(b) > 2:
                cut = random.randrange(len(b) - 1)
                del b[cut : cut + random.randint(1, 16)]
            else:
                i = random.randrange(len(b) + 1)
                b[i:i] = bytes(
                    random.randrange(256)
                    for _ in range(random.randint(1, 8))
                )
        try:
            loads(bytes(b))
        except CborFormatError:
            pass
