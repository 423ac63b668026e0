"""Avro OCF (core/avrocodec.py).

The zigzag/varint layer is pinned by the Avro specification's own
published example table; a whole container is hand-assembled
byte-by-byte for a one-field schema so header layout, map framing,
block framing, and the sync rule are pinned without circularity; all
three codecs roundtrip (snappy's 4-byte big-endian CRC-32 suffix is
checked both ways); the mutation battery proves the domain-error
contract.
"""

import json
import random
import struct
import zlib

import pytest

from databatchprotectionservice_spark.core.avrocodec import (
    AvroFormatError,
    encode_avro_ocf,
    parse_avro_ocf,
    read_long,
    write_long,
    zigzag_decode,
    zigzag_encode,
)
from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)

_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "keep", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
    ],
}


def _rows(n, seed=7):
    rng = random.Random(seed)
    return [
        {
            "doc_id": rng.randrange(-(10**12), 10**12),
            "text": None if i % 5 == 4 else f"t{i} café 汉",
            "score": rng.random() * 100 - 50,
            "keep": bool(i % 2),
            "payload": bytes(rng.randrange(256) for _ in range(i % 7)),
        }
        for i in range(n)
    ]


def test_spec_zigzag_table():
    # the example table printed in the Avro spec's binary-encoding section
    for n, u in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (-64, 127), (64, 128)]:
        assert zigzag_encode(n) == u
        assert zigzag_decode(u) == n
    # and the varint layer: 64 -> 0x80 0x01
    assert write_long(64) == b"\x80\x01"
    assert read_long(b"\x80\x01", 0) == (64, 2)


def test_hand_assembled_container_parses():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }
    sj = json.dumps(schema, separators=(",", ":")).encode()
    sync = bytes(range(16))
    body = write_long(3) + write_long(-1)  # two rows: v=3, v=-1
    wire = (
        b"Obj\x01"
        + write_long(2)  # two metadata entries
        + write_long(10) + b"avro.codec" + write_long(4) + b"null"
        + write_long(11) + b"avro.schema" + write_long(len(sj)) + sj
        + write_long(0)  # map terminator
        + sync
        + write_long(2)  # block: two objects
        + write_long(len(body))
        + body
        + sync
    )
    info = parse_avro_ocf(wire)
    assert info["codec"] == "null"
    assert info["n_blocks"] == 1
    assert info["records"] == [{"v": 3}, {"v": -1}]
    # and our encoder emits the identical bytes (sorted map keys)
    assert encode_avro_ocf(
        [{"v": 3}, {"v": -1}], schema, sync=sync
    ) == wire


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_roundtrip_all_codecs(codec):
    rows = _rows(137)
    wire = encode_avro_ocf(
        rows, _SCHEMA, codec=codec, sync=b"S" * 16, block_records=50
    )
    info = parse_avro_ocf(wire)
    assert info["records"] == rows
    assert info["n_blocks"] == 3  # 50 + 50 + 37
    assert info["codec"] == codec


def test_snappy_crc_is_checked():
    wire = bytearray(
        encode_avro_ocf(_rows(20), _SCHEMA, codec="snappy", sync=b"S" * 16)
    )
    # flip a byte of the trailing CRC (last 4 bytes before final sync)
    wire[-17] ^= 0xFF
    with pytest.raises(AvroFormatError, match="CRC|snappy"):
        parse_avro_ocf(bytes(wire))


def test_sync_marker_mismatch_raises():
    wire = bytearray(encode_avro_ocf(_rows(5), _SCHEMA, sync=b"S" * 16))
    wire[-1] ^= 1
    with pytest.raises(AvroFormatError, match="sync"):
        parse_avro_ocf(bytes(wire))


def test_out_of_subset_schema_raises():
    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(AvroFormatError, match="subset"):
        encode_avro_ocf([{"a": [1]}], bad)


def test_non_nullable_none_raises():
    with pytest.raises(AvroFormatError, match="not nullable"):
        encode_avro_ocf([{"doc_id": None}], {
            "type": "record", "name": "r",
            "fields": [{"name": "doc_id", "type": "long"}],
        })


def test_trailing_block_bytes_raise():
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }
    wire = bytearray(encode_avro_ocf([{"v": 1}], schema, sync=b"S" * 16))
    # widen the block: claim the same object count over body+1 bytes
    # (rebuild by hand: body 'v=1' is 1 byte -> declare 2, append junk)
    head = bytes(wire).split(b"S" * 16)[0] + b"S" * 16
    tampered = head + write_long(1) + write_long(2) + write_long(1) + b"J" + b"S" * 16
    with pytest.raises(AvroFormatError, match="trailing"):
        parse_avro_ocf(tampered)


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_mutation_battery(codec):
    rng = random.Random(29)
    rows = _rows(25, seed=31)
    wire = encode_avro_ocf(
        rows, _SCHEMA, codec=codec, sync=b"Y" * 16, block_records=10
    )
    for _ in range(1000):
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
            info = parse_avro_ocf(bytes(b))
        except DBPSInvalidInputError:
            continue
        except (OverflowError, struct.error):
            pytest.fail("non-domain error escaped the parser")
        # survivable mutations may only damage values INSIDE rows
        # (strings/doubles have no checksum in avro) — framing facts
        # must hold
        assert info["n_blocks"] <= 3
        assert len(info["records"]) <= len(rows)
