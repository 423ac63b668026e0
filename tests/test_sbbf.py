"""Split-block Bloom (core/sbbf.py).

The block mapping and lane masks are pinned by hand-computed vectors
straight from the spec arithmetic (independent of the vectorized
implementation); the no-false-negative contract is exhaustively
checked; serialization roundtrips; false-positive rates stay sane at
the spec's design load.
"""

import random

import pytest

from databatchprotectionservice_spark.core.sbbf import (
    SALTS,
    SbbfError,
    SplitBlockBloom,
)
from databatchprotectionservice_spark.core.zstdmeta import xxh64


def _mask_ref(x):
    """Scalar reference for the lane masks, from the spec text."""
    return [
        1 << (((x * SALTS[i]) & 0xFFFFFFFF) >> 27) for i in range(8)
    ]


def test_hand_computed_block_and_mask():
    f = SplitBlockBloom(64)  # 2 blocks
    h = xxh64((12345).to_bytes(8, "little", signed=True), 0)
    want_block = ((h >> 32) * 2) >> 32
    f.insert_int64(12345)
    assert f.blocks[1 - want_block].sum() == 0  # only one block touched
    got = f.blocks[want_block]
    for lane, want in enumerate(_mask_ref(h & 0xFFFFFFFF)):
        assert int(got[lane]) == want


def test_no_false_negatives():
    rng = random.Random(3)
    f = SplitBlockBloom(1024)
    values = [rng.randrange(-(2**62), 2**62) for _ in range(300)]
    for v in values:
        f.insert_int64(v)
    assert all(f.might_contain_int64(v) for v in values)


def test_false_positive_rate_sane():
    rng = random.Random(5)
    f = SplitBlockBloom(1024)  # 256 slots' worth of lanes for 100 keys
    inserted = set(range(100))
    for v in inserted:
        f.insert_int64(v)
    probes = [rng.randrange(10**6, 10**9) for _ in range(5000)]
    fp = sum(f.might_contain_int64(p) for p in probes)
    assert fp / 5000 < 0.02  # far under the spec's 1% design point


def test_bytes_roundtrip():
    f = SplitBlockBloom(256)
    for v in [0, -1, 2**40, -(2**40)]:
        f.insert_int64(v)
    g = SplitBlockBloom.from_bytes(f.to_bytes())
    assert (g.blocks == f.blocks).all()
    assert all(g.might_contain_int64(v) for v in [0, -1, 2**40, -(2**40)])
    assert len(f.to_bytes()) == 256


def test_byte_array_hashing():
    f = SplitBlockBloom(64)
    f.insert_hash(SplitBlockBloom.hash_bytes(b"hello"))
    assert f.check_hash(SplitBlockBloom.hash_bytes(b"hello"))
    assert not f.check_hash(SplitBlockBloom.hash_bytes(b"other"))


def test_size_validation():
    for bad in [0, 16, 33, 48, 96]:
        with pytest.raises(SbbfError):
            SplitBlockBloom(bad)
    with pytest.raises(SbbfError):
        SplitBlockBloom.from_bytes(bytes(48))
