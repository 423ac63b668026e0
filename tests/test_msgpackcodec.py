"""MessagePack (core/msgpackcodec.py).

Wire pins come straight from the spec's own format table (every
integer width boundary, fixstr/str8, bin, fixarray/fixmap, float64,
and the three timestamp layouts), assembled as literal bytes; a
randomized deep-structure roundtrip and the mutation battery close
the contract.
"""

import random
import struct

import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.msgpackcodec import (
    MsgpackFormatError,
    Timestamp,
    packb,
    unpackb,
)

SPEC_VECTORS = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (128, b"\xcc\x80"),
    (255, b"\xcc\xff"),
    (256, b"\xcd\x01\x00"),
    (65535, b"\xcd\xff\xff"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (2**32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (-33, b"\xd0\xdf"),
    (-128, b"\xd0\x80"),
    (-129, b"\xd1\xff\x7f"),
    (-32769, b"\xd2\xff\xff\x7f\xff"),
    (-(2**31) - 1, b"\xd3\xff\xff\xff\xff\x7f\xff\xff\xff"),
    (1.5, b"\xcb" + struct.pack(">d", 1.5)),
    ("abc", b"\xa3abc"),
    ("", b"\xa0"),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([1, 2], b"\x92\x01\x02"),
    ({"a": 1}, b"\x81\xa1a\x01"),
    ([], b"\x90"),
    ({}, b"\x80"),
]


@pytest.mark.parametrize(
    "value,wire", SPEC_VECTORS, ids=[repr(v)[:20] for v, _ in SPEC_VECTORS]
)
def test_spec_vectors(value, wire):
    assert packb(value) == wire
    assert unpackb(wire) == value


def test_timestamp_layouts():
    # timestamp32: seconds only, fits u32
    assert packb(Timestamp(1)) == b"\xd6\xff\x00\x00\x00\x01"
    assert unpackb(b"\xd6\xff\x00\x00\x00\x01") == Timestamp(1)
    # timestamp64: nanos<<34 | seconds
    t = Timestamp(3, 5)
    wire = b"\xd7\xff" + struct.pack(">Q", (5 << 34) | 3)
    assert packb(t) == wire and unpackb(wire) == t
    # timestamp96: negative seconds force the 12-byte layout
    t = Timestamp(-2, 7)
    wire = b"\xc7\x0c\xff" + struct.pack(">Iq", 7, -2)
    assert packb(t) == wire and unpackb(wire) == t
    with pytest.raises(MsgpackFormatError, match="nanos"):
        Timestamp(0, 10**9)


def test_str8_and_longer_containers():
    s = "x" * 40
    assert packb(s) == b"\xd9\x28" + b"x" * 40
    arr = list(range(20))
    wire = packb(arr)
    assert wire[:3] == b"\xdc\x00\x14"
    assert unpackb(wire) == arr
    m = {f"k{i}": i for i in range(20)}
    assert unpackb(packb(m)) == m


def test_float32_accepted_on_decode():
    assert unpackb(b"\xca" + struct.pack(">f", 0.5)) == 0.5


def test_unknown_ext_preserved():
    assert unpackb(b"\xd4\x05\x42") == (5, b"\x42")


def test_deep_structure_roundtrip():
    rng = random.Random(3)

    def gen(depth):
        kind = rng.randrange(8 if depth < 4 else 6)
        if kind == 0:
            return rng.randrange(-(2**40), 2**40)
        if kind == 1:
            return rng.random() * 1e6
        if kind == 2:
            return "s" * rng.randrange(0, 50) + "é汉"
        if kind == 3:
            return bytes(rng.randrange(256) for _ in range(rng.randrange(9)))
        if kind == 4:
            return rng.choice([None, True, False])
        if kind == 5:
            return Timestamp(rng.randrange(2**33), rng.randrange(10**9))
        if kind == 6:
            return [gen(depth + 1) for _ in range(rng.randrange(5))]
        return {f"k{i}": gen(depth + 1) for i in range(rng.randrange(5))}

    for _ in range(200):
        v = gen(0)
        assert unpackb(packb(v)) == v


def test_trailing_bytes_and_truncation_raise():
    with pytest.raises(MsgpackFormatError, match="trailing"):
        unpackb(b"\x01\x02")
    for wire in [b"\xcc", b"\xa3ab", b"\x92\x01", b"\xd6\xff\x00"]:
        with pytest.raises(MsgpackFormatError):
            unpackb(wire)


def test_reserved_byte_raises():
    with pytest.raises(MsgpackFormatError, match="reserved"):
        unpackb(b"\xc1")


def test_mutation_battery():
    rng = random.Random(83)
    value = {
        "id": 123456,
        "tags": ["a", None, True, -7],
        "blob": bytes(range(40)),
        "ts": Timestamp(1_700_000_000, 123),
        "nested": {"x": [1.5, "é"], "y": {"z": -1}},
    }
    wire = packb(value)
    for _ in range(3000):
        b = bytearray(wire)
        for _ in range(rng.randint(1, 4)):
            op = rng.randrange(3)
            if op == 0 and b:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1 and len(b) > 1:
                del b[rng.randrange(len(b) - 1):]
            else:
                b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
        try:
            unpackb(bytes(b))
        except DBPSInvalidInputError:
            continue
        except RecursionError:
            pytest.fail("depth guard failed")
        except (UnicodeDecodeError, struct.error, MemoryError,
                KeyError, OverflowError) as e:
            pytest.fail(f"non-domain error escaped: {type(e).__name__} {e}")
