"""Snappy raw blocks (core/snappycodec.py).

Referees: real C++ snappy via pyarrow in both directions,
hand-assembled elements from the format description (every literal
length escape, all three copy tags, overlap replication), randomized
roundtrips, and the mutation battery.  Cross-validated against
``core/compression.py``'s pyarrow path — the page-protection codec
and this spec twin must be interchangeable on real page payloads.
"""

import random

import pyarrow as pa
import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.snappycodec import (
    SnappyFormatError,
    snappy_compress,
    snappy_decompress,
)


def test_hand_assembled_elements():
    # preamble 5; literal "ab"; copy-1 len 4 offset 2; final literal "Z"
    wire = bytes([7]) + bytes([1 << 2]) + b"ab" + bytes(
        [1 | (0 << 2) | (0 << 5), 2]
    ) + bytes([0 << 2]) + b"Z"
    assert snappy_decompress(wire) == b"ab" + b"abab" + b"Z"
    # copy-2: len 5, offset 3 after 3 literals -> overlap replication
    wire = bytes([8]) + bytes([2 << 2]) + b"xyz" + bytes(
        [2 | (4 << 2)]
    ) + (3).to_bytes(2, "little")
    assert snappy_decompress(wire) == b"xyz" + b"xyzxy"
    # copy-4 decodes too
    wire = bytes([8]) + bytes([2 << 2]) + b"xyz" + bytes(
        [3 | (4 << 2)]
    ) + (3).to_bytes(4, "little")
    assert snappy_decompress(wire) == b"xyz" + b"xyzxy"


def test_literal_length_escapes():
    for lit in [59, 60, 61, 255, 256, 70000]:
        body = bytes((i * 3) & 0xFF for i in range(lit))
        wire = snappy_compress(body)
        assert snappy_decompress(wire) == body
        assert pa.decompress(
            wire, decompressed_size=lit, codec="snappy", asbytes=True
        ) == body


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"ab" * 1000,
        b"the quick brown fox " * 200,
        bytes(range(256)) * 8,
        bytes(2000),
    ],
    ids=["empty", "one", "rle", "text", "spread", "zeros"],
)
def test_interop_both_directions(data):
    ours = snappy_compress(data)
    assert snappy_decompress(ours) == data
    assert pa.decompress(
        ours, decompressed_size=len(data), codec="snappy", asbytes=True
    ) == data
    assert snappy_decompress(
        pa.compress(data, codec="snappy", asbytes=True)
    ) == data


def test_randomized_roundtrip():
    rng = random.Random(19)
    words = [b"alpha", b"beta", b"gamma", b"pages", b"snappy"]
    for _ in range(150):
        data = b"-".join(
            rng.choice(words) for _ in range(rng.randrange(0, 250))
        )
        assert snappy_decompress(snappy_compress(data)) == data


def test_compression_module_cross_validation():
    """The pyarrow page path and this spec twin are interchangeable
    on a real page payload (documents column bytes)."""
    import pyarrow.parquet as pq

    from databatchprotectionservice_spark.core.compression import (
        compress,
        decompress,
    )
    from databatchprotectionservice_spark.core.types import (
        CompressionCodec,
    )

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    payload = b"".join(
        (v or "").encode() for v in t["text"].to_pylist()[:2000]
    )
    via_module = compress(payload, CompressionCodec.SNAPPY)
    assert snappy_decompress(via_module) == payload
    ours = snappy_compress(payload)
    assert decompress(ours, CompressionCodec.SNAPPY) == payload


def test_length_contract_and_errors():
    with pytest.raises(SnappyFormatError, match="declares"):
        snappy_decompress(bytes([9]) + bytes([1 << 2]) + b"ab")
    with pytest.raises(SnappyFormatError, match="exceeds"):
        snappy_decompress(bytes([1]) + bytes([2 << 2]) + b"abc")
    with pytest.raises(SnappyFormatError, match="offset"):
        snappy_decompress(
            bytes([5]) + bytes([0 << 2]) + b"a"
            + bytes([2 | (3 << 2)]) + (9).to_bytes(2, "little")
        )
    with pytest.raises(SnappyFormatError, match="truncated"):
        snappy_decompress(b"")


def test_mutation_battery():
    rng = random.Random(113)
    wire = snappy_compress((b"mutate me " * 80) + bytes(range(200)))
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
            snappy_decompress(bytes(b))
        except DBPSInvalidInputError:
            continue
        except (MemoryError, OverflowError, IndexError, KeyError) as e:
            pytest.fail(f"non-domain error escaped: {type(e).__name__} {e}")
