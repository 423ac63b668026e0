"""YUV4MPEG2 codec: round-trips, header-tag tolerance, error paths."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.videocodec import (
    VideoFormatError,
    decode_y4m,
    encode_y4m,
)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 8),
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 99),
)
def test_y4m_roundtrip(n, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, 3, h, w), dtype=np.uint8)
    got_w, got_h, fps, got = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (got_w, got_h, fps) == (w, h, (30, 1))
    assert np.array_equal(got, frames)


def test_y4m_header_tag_order_and_extras():
    """Tags may come in any order with extras (X metadata); FRAME lines
    may carry parameters after the marker."""
    raster = bytes(range(12))  # 2x2 C444 = 12 bytes
    data = (
        b"YUV4MPEG2 F25:1 C444 H2 W2 Ip A1:1 Xcustom\n"
        + b"FRAME Ixyz\n"
        + raster
    )
    w, h, fps, frames = decode_y4m(data)
    assert (w, h, fps) == (2, 2, (25, 1))
    assert frames.tobytes() == raster


def test_y4m_errors():
    good = encode_y4m(np.zeros((2, 3, 2, 2), dtype=np.uint8))
    with pytest.raises(VideoFormatError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF" + good)
    with pytest.raises(VideoFormatError, match="truncated frame"):
        decode_y4m(good[:-5])
    with pytest.raises(VideoFormatError, match="colorspace C420"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420\n" + b"FRAME\n" + bytes(6))
    # the C tag DEFAULTS to 420 when absent, per spec — must also raise
    with pytest.raises(VideoFormatError, match="colorspace C420"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1\n" + b"FRAME\n" + bytes(6))
    with pytest.raises(VideoFormatError, match="missing W/H"):
        decode_y4m(b"YUV4MPEG2 F25:1 C444\n" + b"FRAME\n")
    with pytest.raises(VideoFormatError, match="bad FRAME marker"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\n" + b"BOGUS\n" + bytes(12))
    with pytest.raises(VideoFormatError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\n")
