"""LZ4 (core/lz4codec.py).

Referees: the published XXH32 check values, hand-assembled block
sequences from the block-format spec, real liblz4 via pyarrow in
BOTH directions at BOTH layers (raw block and frame), randomized
roundtrips including overlapping-copy territory, and the mutation
battery.
"""

import random

import pyarrow as pa
import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.lz4codec import (
    Lz4FormatError,
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_published_vectors():
    assert xxh32(b"", 0) == 0x02CC5D05
    assert xxh32(b"", 1) == 0x0B2CB792
    for blob in [b"a", b"abcd", b"0123456789abcdef", bytes(range(100))]:
        assert 0 <= xxh32(blob, 0) < 1 << 32


def test_hand_assembled_block():
    # token 0x54: 5 literals, match len 4+4=8; offset 5 -> overlap copy
    wire = bytes([0x54]) + b"abcde" + (5).to_bytes(2, "little") + bytes(
        [0x10]
    ) + b"X"
    # 5 literals, copy 8 from offset 5: abcdeabc -> then final seq:
    # token 0x10 = 1 literal "X"
    assert lz4_block_decompress(wire) == b"abcde" + b"abcdeabc" + b"X"


def test_overlap_rle_semantics():
    # offset 1 replicates the previous byte — the RLE idiom; the spec
    # requires the block to END on a literals-only sequence, so a
    # final 1-literal sequence closes it
    wire = (
        bytes([0x1F]) + b"z" + (1).to_bytes(2, "little") + bytes([200])
        + bytes([0x10]) + b"!"
    )
    out = lz4_block_decompress(wire)
    assert out == b"z" * (1 + 4 + 15 + 200) + b"!"
    # and a block ending on a match raises (the strict contract)
    with pytest.raises(Lz4FormatError, match="inside a sequence"):
        lz4_block_decompress(wire[:-2])


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"short",
        b"ab" * 1000,                      # overlap-copy heavy
        b"the quick brown fox " * 200,
        bytes(range(256)) * 8,             # incompressible-ish
        bytes(1000),                       # zero run
    ],
    ids=["empty", "short", "rle", "text", "spread", "zeros"],
)
def test_block_interop_both_directions(data):
    ours = lz4_block_compress(data)
    assert lz4_block_decompress(ours) == data
    assert pa.decompress(
        ours, decompressed_size=len(data), codec="lz4_raw", asbytes=True
    ) == data
    theirs = pa.compress(data, codec="lz4_raw", asbytes=True)
    assert lz4_block_decompress(theirs) == data


def test_randomized_block_roundtrip():
    rng = random.Random(7)
    words = [b"alpha", b"beta", b"gamma", b"x", b"repetition"]
    for _ in range(100):
        data = b" ".join(
            rng.choice(words) for _ in range(rng.randrange(0, 300))
        )
        ours = lz4_block_compress(data)
        assert lz4_block_decompress(ours) == data
        assert pa.decompress(
            ours, decompressed_size=len(data), codec="lz4_raw",
            asbytes=True,
        ) == data


@pytest.mark.parametrize("bc,store", [(False, False), (True, False),
                                      (False, True), (True, True)])
def test_frame_roundtrip_variants(bc, store):
    data = b"framed payload " * 300
    fr = lz4_frame_compress(
        data, block_checksum=bc, store_uncompressed=store
    )
    got = lz4_frame_decompress(fr)
    assert got["content"] == data
    assert got["content_size"] == len(data)
    assert got["block_checksum"] is bc
    # real liblz4 must accept every variant
    assert pa.decompress(
        fr, decompressed_size=len(data), codec="lz4", asbytes=True
    ) == data


def test_multiblock_frame():
    data = bytes((i * 13) & 0xFF for i in range(200_000))
    fr = lz4_frame_compress(data, block_size_id=4)  # 64 KiB blocks
    got = lz4_frame_decompress(fr)
    assert got["content"] == data
    assert len(got["blocks"]) == 4  # 200000 / 65536 -> 4 blocks
    assert pa.decompress(
        fr, decompressed_size=len(data), codec="lz4", asbytes=True
    ) == data


def test_we_read_liblz4_frames():
    data = b"liblz4 wrote this frame " * 500
    fr = pa.compress(data, codec="lz4", asbytes=True)
    assert lz4_frame_decompress(fr)["content"] == data


def test_frame_errors():
    data = b"payload " * 50
    fr = bytearray(lz4_frame_compress(data))
    fr[-1] ^= 0xFF
    with pytest.raises(Lz4FormatError, match="content checksum"):
        lz4_frame_decompress(bytes(fr))
    fr = bytearray(lz4_frame_compress(data))
    fr[6] ^= 0x01  # corrupt the header (content size byte)
    with pytest.raises(Lz4FormatError, match="header checksum"):
        lz4_frame_decompress(bytes(fr))
    with pytest.raises(Lz4FormatError, match="offset"):
        lz4_block_decompress(
            bytes([0x04]) + (9).to_bytes(2, "little")
        )


def test_mutation_battery():
    rng = random.Random(107)
    data = (b"mutation target " * 60) + bytes(range(128))
    wire = lz4_frame_compress(data, block_checksum=True)
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
            got = lz4_frame_decompress(bytes(b))
        except DBPSInvalidInputError:
            continue
        except (MemoryError, OverflowError, KeyError, IndexError) as e:
            pytest.fail(f"non-domain error escaped: {type(e).__name__} {e}")
        # with block AND content checksums, a surviving mutant must
        # still carry the exact content (XXH32 collisions aside)
        assert got["content"] == data
