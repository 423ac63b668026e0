"""tf.train.Example on miniproto (core/tfexample.py).

The wire pin assembles an Example BYTE BY HAND from the protobuf wire
rules (tags, nested length-delimited framing, little-endian fixed32
floats) — independent of the runtime under test; both directions must
agree with it.  The battery proves the domain-error contract.
"""

import random
import struct

import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.tfexample import (
    TfExampleError,
    make_example,
    parse_example,
)


def _ld(tag_field: int, payload: bytes) -> bytes:
    """length-delimited field: tag = (field << 3) | 2, varint length."""
    assert len(payload) < 128
    return bytes([(tag_field << 3) | 2, len(payload)]) + payload


def test_hand_assembled_example():
    # Example{ features{ feature{ key:"id" value{ int64_list{ value:[7] }}}}}
    int64_list = bytes([0x08, 0x07])          # field 1 varint 7
    feature = _ld(3, int64_list)              # Feature.int64_list = 3
    entry = _ld(1, b"id") + _ld(2, feature)   # key=1, value=2
    features = _ld(1, entry)                  # Features.feature = 1
    wire = _ld(1, features)                   # Example.features = 1
    assert parse_example(wire) == {"id": [7]}
    assert make_example({"id": [7]}) == wire


def test_hand_assembled_bytes_and_float():
    bytes_list = _ld(1, b"ab")
    f_bytes = _ld(1, bytes_list)              # Feature.bytes_list = 1
    float_list = bytes([0x0D]) + struct.pack("<f", 1.5)
    f_float = _ld(2, float_list)              # Feature.float_list = 2
    wire = _ld(
        1,
        _ld(1, _ld(1, b"b") + _ld(2, f_bytes))
        + _ld(1, _ld(1, b"f") + _ld(2, f_float)),
    )
    assert parse_example(wire) == {"b": [b"ab"], "f": [1.5]}
    assert make_example({"b": [b"ab"], "f": [1.5]}) == wire


def test_roundtrip_negative_and_large_ints():
    feats = {"v": [-1, 0, 2**62, -(2**62)]}
    assert parse_example(make_example(feats)) == feats


def test_packed_int64_list_is_accepted():
    # a writer may pack repeated int64s; field 1, wire type 2
    packed = _ld(1, bytes([0x01, 0x02, 0x03]))
    feature = _ld(3, packed)
    wire = _ld(1, _ld(1, _ld(1, b"p") + _ld(2, feature)))
    assert parse_example(wire) == {"p": [1, 2, 3]}


def test_type_errors():
    with pytest.raises(TfExampleError, match="non-empty"):
        make_example({"x": []})
    with pytest.raises(TfExampleError, match="mixes"):
        make_example({"x": [1, "s"]})
    with pytest.raises(TfExampleError, match="non-empty"):
        make_example({"x": 3})


def test_mutation_battery():
    rng = random.Random(53)
    wire = make_example(
        {
            "text": [b"alpha", b"beta"],
            "ids": [1, -5, 1 << 40],
            "w": [0.25, -8.0],
        }
    )
    for _ in range(2000):
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
            out = parse_example(bytes(b))
        except DBPSInvalidInputError:
            continue
        assert isinstance(out, dict)  # parsed mutants stay well-typed
        for v in out.values():
            assert isinstance(v, list)
