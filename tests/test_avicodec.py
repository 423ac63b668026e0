"""AVI/Motion-JPEG container codec (core/avicodec.py).

MJPEG frames are complete baseline JPEGs, so a constant-tile fixture
decodes BIT-EXACTLY (see the exactness note in core/jpegcodec.py) —
every assertion here is equality, no tolerance.
"""

import numpy as np
import pytest

from databatchprotectionservice_spark.core.avicodec import (
    AviFormatError,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from databatchprotectionservice_spark.core.jpegcodec import (
    encode_jpeg_gray_tiles,
)


def _fixture(n_frames=4, rows=3, cols=5, seed=0):
    jpegs, rasters = [], []
    for f in range(n_frames):
        tiles = (
            (np.arange(rows * cols).reshape(rows, cols) * 11 + f * 29 + seed)
            % 256
        ).astype(np.uint8)
        jpegs.append(encode_jpeg_gray_tiles(tiles))
        rasters.append(np.repeat(np.repeat(tiles, 8, 0), 8, 1))
    return jpegs, np.stack(rasters), cols * 8, rows * 8


def test_roundtrip_bit_exact():
    jpegs, rasters, w, h = _fixture()
    (rate, scale), dec = decode_avi_mjpeg(
        encode_avi_mjpeg(jpegs, w, h, fps=(30, 1))
    )
    assert (rate, scale) == (30, 1)
    assert dec.shape == rasters.shape
    assert np.array_equal(dec, rasters)


def test_single_frame_and_odd_chunk_padding():
    # a JPEG of odd length exercises the word-alignment pad byte
    jpegs, rasters, w, h = _fixture(n_frames=1, rows=1, cols=1, seed=7)
    if len(jpegs[0]) % 2 == 0:
        jpegs2, rasters, w, h = _fixture(n_frames=1, rows=1, cols=2, seed=7)
        jpegs = jpegs2
    _, dec = decode_avi_mjpeg(encode_avi_mjpeg(jpegs, w, h))
    assert np.array_equal(dec, rasters)


def test_container_cross_checks():
    import struct

    jpegs, _, w, h = _fixture()
    good = encode_avi_mjpeg(jpegs, w, h)

    # wrong magic
    with pytest.raises(AviFormatError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"RIFF" + good[4:8] + b"WAVE" + good[12:])

    # frame-count lie in avih (dwTotalFrames is the 5th u32 of avih)
    bad = bytearray(good)
    at = bad.index(b"avih") + 8 + 16
    struct.pack_into("<I", bad, at, 99)
    with pytest.raises(AviFormatError, match="dwTotalFrames"):
        decode_avi_mjpeg(bytes(bad))

    # handler lie in strh
    bad = bytearray(good)
    at = bad.index(b"strh") + 8 + 4
    bad[at : at + 4] = b"H264"
    with pytest.raises(AviFormatError, match="MJPEG"):
        decode_avi_mjpeg(bytes(bad))

    # idx1 offset lie
    bad = bytearray(good)
    at = bad.index(b"idx1") + 8 + 8
    struct.pack_into("<I", bad, at, 12345)
    with pytest.raises(AviFormatError, match="idx1"):
        decode_avi_mjpeg(bytes(bad))

    # dimension mismatch between container and frames (avih dwWidth
    # is the 9th u32 of avih)
    bad = bytearray(good)
    at = bad.index(b"avih") + 8 + 32
    struct.pack_into("<I", bad, at, w + 8)
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg(bytes(bad))


def test_corrupt_frame_is_a_domain_error():
    jpegs, _, w, h = _fixture()
    good = encode_avi_mjpeg(jpegs, w, h)
    bad = bytearray(good)
    at = bad.index(b"00dc") + 8 + 2  # clobber the first frame's body
    bad[at] ^= 0xFF
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg(bytes(bad))


def test_encoder_input_validation():
    with pytest.raises(AviFormatError, match="at least one frame"):
        encode_avi_mjpeg([], 8, 8)
    with pytest.raises(AviFormatError, match="positive"):
        encode_avi_mjpeg([b"x"], 0, 8)
    with pytest.raises(AviFormatError, match="fps"):
        encode_avi_mjpeg([b"x"], 8, 8, fps=(0, 1))
