"""RIFF/WAVE PCM codec: round-trips, chunk-walk tolerance, error paths.

Mirrors test_imagecodec.py's discipline: hypothesis round-trips through
the real encoder, a hand-assembled WAV with extra chunks (LIST before
data, odd-length chunk padding) that the decoder must walk over, and
precise failures for non-PCM, wrong bit depth, truncation, and layout
inconsistencies.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.audiocodec import (
    AudioFormatError,
    decode_wav,
    encode_wav,
)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 99),
)
def test_wav_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    got_rate, got_ch, got = decode_wav(encode_wav(s, rate=rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(got, s)


def test_wav_mono_1d_input():
    s = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    rate, ch, got = decode_wav(encode_wav(s))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got[:, 0], s)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def test_wav_decoder_skips_unknown_chunks():
    """LIST (odd length, exercising word-alignment padding) and fact
    chunks before data must be walked over, per the RIFF spec."""
    s = np.array([[1], [-2], [3]], dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + _chunk(b"fmt ", fmt)
        + _chunk(b"LIST", b"INFOxyz")  # 7 bytes: odd, needs pad byte
        + _chunk(b"fact", struct.pack("<I", 3))
        + _chunk(b"data", s.astype("<i2").tobytes())
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, got = decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got, s)


def test_wav_errors():
    good = encode_wav(np.zeros(4, dtype=np.int16))
    with pytest.raises(AudioFormatError, match="not a RIFF"):
        decode_wav(b"OggS" + good[4:])
    with pytest.raises(AudioFormatError, match="truncated"):
        decode_wav(good[:-3])

    def mk(audio_format=1, bits=16, block_align=2, channels=1):
        fmt = struct.pack(
            "<HHIIHH", audio_format, channels, 8000, 16000, block_align, bits
        )
        body = (
            b"WAVE"
            + _chunk(b"fmt ", fmt)
            + _chunk(b"data", b"\x00\x00\x00\x00")
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(AudioFormatError, match="format tag 85"):
        decode_wav(mk(audio_format=85))  # MP3-in-WAV
    with pytest.raises(AudioFormatError, match="bit depth 8"):
        decode_wav(mk(bits=8))
    with pytest.raises(AudioFormatError, match="inconsistent"):
        decode_wav(mk(block_align=3))
    with pytest.raises(AudioFormatError, match="missing data"):
        body = b"WAVE" + _chunk(
            b"fmt ", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        )
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(AudioFormatError, match="whole number of frames"):
        body = b"WAVE" + _chunk(
            b"fmt ", struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        ) + _chunk(b"data", b"\x00\x00")  # 2 bytes, frame needs 4
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
