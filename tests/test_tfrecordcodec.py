"""TFRecord framing (core/tfrecordcodec.py).

CRC-32C is pinned by the RFC 3720 §B.4 public vectors and by a
bit-by-bit reference implementation written HERE (independent of the
codec's slice-by-8 tables); a whole record is hand-assembled
field-by-field from that reference so the masking rule and layout are
pinned without circularity.  The mutation battery proves the
no-corrupt-payload contract: every mutated stream either raises the
domain error or still parses to the original payloads.
"""

import random
import struct

import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.tfrecordcodec import (
    TfrecordFormatError,
    crc32c,
    encode_tfrecord,
    mask_crc,
    parse_tfrecord,
    unmask_crc,
)


def _crc32c_ref(data: bytes) -> int:
    """Bit-by-bit reference (no tables) — the independence anchor."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def test_rfc3720_vectors():
    # RFC 3720 B.4: 32 zero bytes, 32 0xFF bytes, ascending, descending
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(bytes(range(31, -1, -1))) == 0x113FDB5C
    # the classic check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_slice_by_8_agrees_with_bitwise_reference():
    rng = random.Random(11)
    for n in [0, 1, 7, 8, 9, 63, 64, 65, 1000]:
        blob = bytes(rng.randrange(256) for _ in range(n))
        assert crc32c(blob) == _crc32c_ref(blob)


def test_mask_unmask_roundtrip():
    for crc in [0, 1, 0xDEADBEEF, 0xFFFFFFFF, 0xE3069283]:
        assert unmask_crc(mask_crc(crc)) == crc


def test_hand_assembled_record_parses():
    """Single record built field-by-field from the bitwise reference."""
    payload = b"abc"
    header = struct.pack("<Q", 3)
    mask = lambda c: (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    wire = (
        header
        + struct.pack("<I", mask(_crc32c_ref(header)))
        + payload
        + struct.pack("<I", mask(_crc32c_ref(payload)))
    )
    assert parse_tfrecord(wire) == [payload]
    assert encode_tfrecord([payload]) == wire


def test_roundtrip_many_records():
    rng = random.Random(12)
    payloads = [
        bytes(rng.randrange(256) for _ in range(rng.choice([0, 1, 13, 700])))
        for _ in range(40)
    ]
    assert parse_tfrecord(encode_tfrecord(payloads)) == payloads


def test_empty_stream_is_empty_list():
    assert parse_tfrecord(b"") == []


def test_truncation_and_overrun_raise():
    wire = encode_tfrecord([b"hello", b"world"])
    for cut in [1, 5, 11, 12, 15, len(wire) - 1]:
        with pytest.raises(TfrecordFormatError):
            parse_tfrecord(wire[:cut])
    # absurd length guarded before allocation
    bad_header = struct.pack("<Q", 1 << 40)
    bad = bad_header + struct.pack(
        "<I", mask_crc(crc32c(bad_header))
    ) + bytes(16)
    with pytest.raises(TfrecordFormatError, match="over the guard"):
        parse_tfrecord(bad)


def test_mutation_battery():
    rng = random.Random(13)
    payloads = [b"alpha", b"", b"x" * 300, bytes(range(100))]
    wire = encode_tfrecord(payloads)
    for _ in range(3000):
        b = bytearray(wire)
        for _ in range(rng.randint(1, 4)):
            op = rng.randrange(3)
            if op == 0 and b:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1 and len(b) > 1:
                cut = rng.randrange(len(b) - 1)
                del b[cut:]
            else:
                b.insert(
                    rng.randrange(len(b) + 1), rng.randrange(256)
                )
        try:
            got = parse_tfrecord(bytes(b))
        except DBPSInvalidInputError:
            continue
        # TFRecord has NO stream terminator — a cut exactly on a record
        # boundary is a valid shorter file (every prefix of records is
        # well-formed), so the strongest possible contract is: any
        # successful parse is a clean PREFIX of the originals, never
        # corrupt or reordered data.
        assert got == payloads[: len(got)]
