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
    # C420 now decodes (r7): a 2x2 C420 frame is 4 Y + 1 U + 1 V bytes,
    # and an absent C tag defaults to C420 per spec
    for hdr in (b"YUV4MPEG2 W2 H2 F25:1 C420\n", b"YUV4MPEG2 W2 H2 F25:1\n"):
        _, _, _, fr = decode_y4m(hdr + b"FRAME\n" + bytes(range(6)))
        assert fr.shape == (1, 3, 2, 2)
        assert np.array_equal(fr[0, 0], np.array([[0, 1], [2, 3]]))
        assert np.all(fr[0, 1] == 4) and np.all(fr[0, 2] == 5)
    with pytest.raises(VideoFormatError, match="colorspace C410"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C410\n" + b"FRAME\n" + bytes(6))
    with pytest.raises(VideoFormatError, match="missing W/H"):
        decode_y4m(b"YUV4MPEG2 F25:1 C444\n" + b"FRAME\n")
    with pytest.raises(VideoFormatError, match="bad FRAME marker"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\n" + b"BOGUS\n" + bytes(12))
    with pytest.raises(VideoFormatError, match="no frames"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\n")


def test_c420_roundtrip_replication_upsample():
    from databatchprotectionservice_spark.core.videocodec import (
        decode_y4m,
        encode_y4m_planar,
    )

    rng = np.random.RandomState(21)
    y = rng.randint(0, 256, size=(3, 6, 8), dtype=np.uint8)
    u = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    v = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    data = encode_y4m_planar(y, u, v, "C420")
    w, h, fps, frames = decode_y4m(data)
    assert (w, h) == (8, 6)
    assert frames.shape == (3, 3, 6, 8)
    assert np.array_equal(frames[:, 0], y)
    # chroma = exact 2x2 replication of the stream planes
    assert np.array_equal(
        frames[:, 1], np.repeat(np.repeat(u, 2, axis=1), 2, axis=2)
    )
    assert np.array_equal(
        frames[:, 2], np.repeat(np.repeat(v, 2, axis=1), 2, axis=2)
    )


def test_c420_aliases_share_layout():
    from databatchprotectionservice_spark.core.videocodec import (
        decode_y4m,
        encode_y4m_planar,
    )

    y = (np.arange(8, dtype=np.uint8) * 3).reshape(1, 2, 4)
    u = np.array([[[7, 9]]], dtype=np.uint8)
    v = np.array([[[250, 1]]], dtype=np.uint8)
    rasters = []
    for cs in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        _, _, _, frames = decode_y4m(encode_y4m_planar(y, u, v, cs))
        rasters.append(frames)
    for r in rasters[1:]:
        assert np.array_equal(r, rasters[0])


def test_c422_half_width_chroma():
    from databatchprotectionservice_spark.core.videocodec import (
        decode_y4m,
        encode_y4m_planar,
    )

    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, size=(2, 4, 6), dtype=np.uint8)
    u = rng.randint(0, 256, size=(2, 4, 3), dtype=np.uint8)
    v = rng.randint(0, 256, size=(2, 4, 3), dtype=np.uint8)
    w, h, fps, frames = decode_y4m(encode_y4m_planar(y, u, v, "C422"))
    assert (w, h) == (6, 4)
    assert np.array_equal(frames[:, 1], np.repeat(u, 2, axis=2))


def test_c420_odd_dimensions_rejected():
    from databatchprotectionservice_spark.core.videocodec import (
        VideoFormatError,
        decode_y4m,
    )

    bad = b"YUV4MPEG2 W5 H2 F25:1 C420\nFRAME\n" + bytes(15)
    with pytest.raises(VideoFormatError, match="even"):
        decode_y4m(bad)


def test_bit_depth_variants_hit_the_seam_not_a_misparse():
    """C420p10 / C444alpha change bytes-per-sample / plane count; a
    prefix match would misparse them as 8-bit layouts. They must raise
    the unsupported-colorspace seam error."""
    from databatchprotectionservice_spark.core.videocodec import (
        VideoFormatError,
        decode_y4m,
    )

    for cs in ("C420p10", "C420p12", "C444alpha", "C422p10"):
        data = (
            b"YUV4MPEG2 W4 H2 F25:1 " + cs.encode() + b"\nFRAME\n" + bytes(48)
        )
        with pytest.raises(VideoFormatError, match="unsupported Y4M"):
            decode_y4m(data)
