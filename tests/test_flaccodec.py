"""FLAC codec tests.

Roundtrips cover what the fixture encoder emits (CONSTANT, FIXED
orders, Rice incl. k=0).  Decoder-only machinery — LPC subframes,
escape partitions, multi-partition residuals, wasted bits, stereo
decorrelation — is exercised by HAND-BUILT bitstreams with
expectations derived from the public spec (RFC 9639), not
round-tripped; CRCs and the coded-number format are pinned by
known-answer vectors."""

import struct

import numpy as np
import pytest

from databatchprotectionservice_spark.core import flaccodec as FC
from databatchprotectionservice_spark.core.flaccodec import (
    FlacFormatError,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_known_answer_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS (poly 0x8005, init 0, no
    # reflection) of the classic "123456789" check string
    assert crc8(b"") == 0
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"") == 0
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize(
    "val,expected",
    [
        (0, b"\x00"),
        (0x7F, b"\x7f"),
        (0x80, b"\xc2\x80"),
        (0x7FF, b"\xdf\xbf"),
        (0x800, b"\xe0\xa0\x80"),
        (0xFFFF, b"\xef\xbf\xbf"),
        (0x10000, b"\xf0\x90\x80\x80"),
    ],
)
def test_coded_number_utf8_vectors(val, expected):
    # identical to UTF-8 in the BMP range — the spec's own framing
    assert FC._encode_coded_number(val) == expected


def test_roundtrip_matrix():
    rng = np.random.RandomState(7)
    cases = [
        rng.randint(-32768, 32768, size=9000).astype(np.int16),
        ((np.arange(5000) * 17 + 31) % 65536 - 32768).astype(np.int16),
        np.full(300, -123, dtype=np.int16),
        np.array([5], dtype=np.int16),
        np.arange(-2000, 2000, dtype=np.int16),
        np.zeros(17, dtype=np.int16),
        np.array([-32768, 32767] * 200, dtype=np.int16),
    ]
    for s in cases:
        rate, ch, out = decode_flac(encode_flac(s, rate=44100))
        assert (rate, ch) == (44100, 1)
        assert np.array_equal(out[:, 0], s)


def test_linear_signal_compresses():
    s = ((np.arange(20000) * 17) % 65536 - 32768).astype(np.int16)
    data = encode_flac(s)
    assert len(data) < len(s) * 2 / 2  # at least 2x on the sawtooth
    assert np.array_equal(decode_flac(data)[2][:, 0], s)


# ---------------------------------------------------------------------------
# hand-built bitstreams
# ---------------------------------------------------------------------------


class _W:
    """Test-local MSB-first bit accumulator (independent of the
    module's encoder)."""

    def __init__(self):
        self.bits = ""

    def w(self, val, n):
        self.bits += format(val & ((1 << n) - 1), f"0{n}b")
        return self

    def bytes(self):
        b = self.bits + "0" * (-len(self.bits) % 8)
        return bytes(int(b[i : i + 8], 2) for i in range(0, len(b), 8))


def _streaminfo(rate, channels, bps, total):
    si = struct.pack(">HH", 16, 65535) + b"\x00" * 6
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big") + b"\x00" * 16  # md5 0 = unchecked
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + si


def _frame_header(bs, ch_code, fi=0):
    w = _W()
    w.w(0b11111111111110, 14).w(0, 1).w(0, 1)
    w.w(0b0110, 4)  # blocksize: 8-bit at end of header
    w.w(0b0000, 4)  # rate from STREAMINFO
    w.w(ch_code, 4)
    w.w(0b100, 3)  # 16 bps
    w.w(0, 1)
    w.w(fi, 8)  # coded number, single byte
    w.w(bs - 1, 8)
    hdr = w.bytes()
    return hdr + bytes([crc8(hdr)])


def _finish_frame(hdr, body_bits):
    body_bits += "0" * (-len(body_bits) % 8)
    frame = hdr + bytes(
        int(body_bits[i : i + 8], 2) for i in range(0, len(body_bits), 8)
    )
    return frame + struct.pack(">H", crc16(frame))


def _constant_sub(val, bps):
    return _W().w(0, 1).w(0, 6).w(0, 1).w(val, bps).bits


def test_hand_built_left_side_stereo():
    """ch 0b1000 (left-side): right = left - side; the SIDE subframe
    carries bps+1 bits.  CONSTANT left=5, side=3 -> every frame is
    (5, 2)."""
    hdr = _frame_header(4, 0b1000)
    body = _constant_sub(5, 16) + _constant_sub(3, 17)
    data = _streaminfo(8000, 2, 16, 4) + _finish_frame(hdr, body)
    rate, ch, out = decode_flac(data)
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(out, np.array([[5, 2]] * 4, dtype=np.int16))


def test_hand_built_right_side_stereo():
    """ch 0b1001 (right-side): left = right + side; side FIRST with
    bps+1 bits.  side=-4, right=7 -> (3, 7)."""
    hdr = _frame_header(3, 0b1001)
    body = _constant_sub(-4, 17) + _constant_sub(7, 16)
    data = _streaminfo(8000, 2, 16, 3) + _finish_frame(hdr, body)
    assert np.array_equal(
        decode_flac(data)[2], np.array([[3, 7]] * 3, dtype=np.int16)
    )


def test_hand_built_mid_side_stereo():
    """ch 0b1010 (mid-side): mid = (l+r)>>1, side = l-r.  For l=4, r=3:
    mid=3, side=1; reconstruction must recover the odd sum exactly."""
    hdr = _frame_header(2, 0b1010)
    body = _constant_sub(3, 16) + _constant_sub(1, 17)
    data = _streaminfo(8000, 2, 16, 2) + _finish_frame(hdr, body)
    assert np.array_equal(
        decode_flac(data)[2], np.array([[4, 3]] * 2, dtype=np.int16)
    )


def test_hand_built_lpc_subframe():
    """LPC order 1, precision 4, shift 1, coef [2]: prediction is
    (2*prev)>>1 = prev, so samples = warmup + cumulative residuals.
    Residuals +1, -2, +3 from warmup 10 -> 10, 11, 9, 12."""
    hdr = _frame_header(4, 0b0000)
    w = _W()
    w.w(0, 1).w(32 + 0, 6).w(0, 1)  # LPC order 1 (type 0b100000)
    w.w(10, 16)  # warmup
    w.w(3, 4)  # precision-1 = 3 -> 4 bits
    w.w(1, 5)  # shift 1
    w.w(2, 4)  # coef = 2
    w.w(0b00, 2).w(0, 4).w(0, 4)  # rice, po=0, k=0
    for v in (1, -2, 3):
        u = (abs(v) << 1) - (1 if v < 0 else 0)
        w.bits += "0" * u + "1"
    data = _streaminfo(8000, 1, 16, 4) + _finish_frame(hdr, w.bits)
    assert list(decode_flac(data)[2][:, 0]) == [10, 11, 9, 12]


def test_hand_built_escape_partition_and_two_partitions():
    """Partition order 1 over a FIXED order-0 subframe of 4 samples:
    partition 1 rice k=2, partition 2 escaped raw 5-bit values."""
    hdr = _frame_header(4, 0b0000)
    # partition 1 bits by hand: v=3 -> u=6 -> q=1, rem=2; v=-1 -> u=1
    # -> q=0, rem=1
    w2 = _W()
    w2.w(0, 1).w(8, 6).w(0, 1)  # FIXED order 0
    w2.w(0b00, 2).w(1, 4)  # rice, po=1 -> 2 partitions of 2
    w2.w(2, 4)  # partition 1: k=2
    w2.bits += "0" + "1" + "10"  # u=6: q=1, rem=2
    w2.bits += "1" + "01"  # u=1: q=0, rem=1
    w2.w(0b1111, 4)  # partition 2: escape
    w2.w(5, 5)  # raw width 5
    w2.w(-7, 5).w(9, 5)  # raw signed residuals
    data = _streaminfo(8000, 1, 16, 4) + _finish_frame(hdr, w2.bits)
    assert list(decode_flac(data)[2][:, 0]) == [3, -1, -7, 9]


def test_hand_built_wasted_bits():
    """CONSTANT subframe with 2 wasted bits: value coded in bps-2 bits
    and shifted left by 2 on output."""
    hdr = _frame_header(3, 0b0000)
    w = _W()
    w.w(0, 1).w(0, 6).w(1, 1)  # wasted flag
    w.bits += "01"  # unary 1 -> wasted = 2
    w.w(11, 14)  # value in 16-2 bits
    data = _streaminfo(8000, 1, 16, 3) + _finish_frame(hdr, w.bits)
    assert list(decode_flac(data)[2][:, 0]) == [44, 44, 44]


def test_header_and_frame_crcs_are_enforced():
    s = np.arange(100, dtype=np.int16)
    data = bytearray(encode_flac(s))
    # flip a bit inside the first frame body (after 42-byte metadata +
    # header); CRC-16 must catch it
    data[60] ^= 0x01
    with pytest.raises(FlacFormatError):
        decode_flac(bytes(data))


def test_streaminfo_md5_is_enforced():
    s = np.arange(50, dtype=np.int16)
    data = bytearray(encode_flac(s))
    data[4 + 4 + 18] ^= 0xFF  # corrupt the MD5 field only
    with pytest.raises(FlacFormatError, match="MD5"):
        decode_flac(bytes(data))


def test_container_errors():
    with pytest.raises(FlacFormatError):
        decode_flac(b"OggS" + b"\x00" * 60)
    with pytest.raises(FlacFormatError):
        decode_flac(b"fLaC")  # no metadata
    s = np.arange(10, dtype=np.int16)
    with pytest.raises(FlacFormatError):
        encode_flac(s.astype(np.int32))
    with pytest.raises(FlacFormatError):
        encode_flac(s, blocksize=4)


def test_lpc_encoder_roundtrips_and_wins_on_correlated_signal():
    """The quantized order-2 LPC path: a decaying two-tone signal must
    round-trip bit-exactly THROUGH an LPC subframe (the encoder picks
    it by residual cost) and compress at least as well as FIXED-only;
    uncorrelated and linear signals must be unaffected by the flag."""
    rng = np.random.RandomState(11)
    n = 20000
    t = np.arange(n)
    sig = (
        8000 * np.sin(t * 0.03)
        + 3000 * np.sin(t * 0.011)
        + rng.normal(0, 60, n)
    ).astype(np.int16)
    d_lpc = encode_flac(sig, use_lpc=True)
    d_fix = encode_flac(sig, use_lpc=False)
    assert np.array_equal(decode_flac(d_lpc)[2][:, 0], sig)
    assert np.array_equal(decode_flac(d_fix)[2][:, 0], sig)
    assert len(d_lpc) < len(d_fix)  # LPC actually engaged and won
    # linear signal: FIXED order-2 residuals are zero, LPC cannot win,
    # so the flag changes nothing
    s = ((np.arange(9000) * 17 + 3) % 65536 - 32768).astype(np.int16)
    assert encode_flac(s, use_lpc=True) == encode_flac(s, use_lpc=False)
