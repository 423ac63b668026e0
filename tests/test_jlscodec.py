"""JPEG-LS / LOCO-I codec (core/jlscodec.py).

Same discipline as the sibling codec batteries: TWO fully hand-traced
T.87 bitstreams pin the wire layout bit-for-bit (run mode with the
EOL partial-block rule, and a run-interruption Golomb code including
the adaptive k derivation), hypothesis round-trips sweep raster
regimes (constant / gradient / noise / text-like / edge shapes) so
run mode, regular mode, bias cancellation, and the RESET halving all
execute, the FF bit-stuffing rule is provoked deliberately, and a
mutation battery proves every escape is the domain error.
"""

import random
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.imagecodec import ImageFormatError
from databatchprotectionservice_spark.core.jlscodec import (
    JlsFormatError,
    decode_jls,
    encode_jls,
)


def _headers(w: int, h: int) -> bytes:
    """The SOI/SOF55/SOS prefix the encoder must emit (T.87 annex C
    subset: 8-bit, one component, default thresholds)."""
    sof = struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = struct.pack(">HB", 8, 1) + bytes([1, 0, 0, 0, 0])
    return b"\xff\xd8\xff\xf7" + sof + b"\xff\xda" + sos


def test_hand_traced_all_run_stream():
    """2x1 raster [0, 0]: col 0 enters run mode (flat zero context),
    the run covers the whole line as two order-0/order-1 full blocks
    -> bits '11', padded to 0xC0.  Row 2 trace for [[0,0],[0,0]]:
    run_index has climbed to 2 (J=0 still), so blocks of 1 again."""
    img = np.zeros((1, 2), dtype=np.uint8)
    enc = encode_jls(img)
    assert enc == _headers(2, 1) + b"\xc0" + b"\xff\xd9"
    w, h, out = decode_jls(enc)
    assert (w, h) == (2, 1) and np.array_equal(out, img)


def test_hand_traced_run_interruption_golomb():
    """1x1 raster [42], traced through A.7.2 by hand:

    - flat zero context -> run mode, run length 0 -> bit 0 (J[0]=0,
      no remainder bits)
    - interruption: Ra==Rb==0 -> RItype=1, Px=0, Errval=42
    - k: A[366]=4, N[366]=1, temp=4+(1>>1)=4; 1<<2 >= 4 -> k=2
    - map=0 (k!=0, Errval>0) -> EMErrval = 2*42 - 1 - 0 = 83
    - limit = 32 - J[0] - 1 = 31; high = 83>>2 = 20 < 31-8-1=22
      -> 20 zeros, a 1, then '11' (83 & 3)
    - total bits: 0, 0*20, 1, 1, 1 = 24 bits = 00 00 07
    """
    img = np.array([[42]], dtype=np.uint8)
    enc = encode_jls(img)
    assert enc == _headers(1, 1) + b"\x00\x00\x07" + b"\xff\xd9"
    w, h, out = decode_jls(enc)
    assert (w, h) == (1, 1) and out[0, 0] == 42


def test_single_zero_pixel_eol_partial_block():
    """1x1 raster [0]: run of 1 hits EOL with cnt>0 -> the single
    EOL '1' bit, no interruption sample (A.7.1.2)."""
    img = np.zeros((1, 1), dtype=np.uint8)
    enc = encode_jls(img)
    assert enc == _headers(1, 1) + b"\x80" + b"\xff\xd9"
    assert decode_jls(enc)[2][0, 0] == 0


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    regime=st.sampled_from(
        ["constant", "gradient", "noise", "binary", "stripes", "sparse"]
    ),
    seed=st.integers(0, 999),
)
def test_roundtrip_all_regimes(h, w, regime, seed):
    rng = np.random.default_rng(seed)
    if regime == "constant":
        img = np.full((h, w), rng.integers(0, 256), dtype=np.uint8)
    elif regime == "gradient":
        img = (
            (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3) % 256
        ).astype(np.uint8)
    elif regime == "noise":
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    elif regime == "binary":
        img = (rng.random((h, w)) < 0.5).astype(np.uint8) * 255
    elif regime == "stripes":
        img = np.where(
            (np.arange(w)[None, :] // max(1, w // 3)) % 2 == 0, 17, 240
        ).astype(np.uint8) * np.ones((h, 1), dtype=np.uint8)
    else:  # sparse: mostly flat with a few hot pixels -> long runs
        img = np.full((h, w), 128, dtype=np.uint8)
        for _ in range(min(4, h * w)):
            img[rng.integers(0, h), rng.integers(0, w)] = rng.integers(
                0, 256
            )
    w2, h2, out = decode_jls(encode_jls(img))
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, img)


def test_roundtrip_large_exercises_reset_halving():
    """4096+ samples per context guarantee N reaches RESET=64 many
    times, so the A/B/N halving path runs in BOTH directions."""
    rng = np.random.default_rng(7)
    base = (
        np.arange(96)[:, None] + np.arange(96)[None, :]
    ).astype(np.uint8)
    img = (base + rng.integers(-2, 3, size=(96, 96))).astype(np.uint8)
    assert np.array_equal(decode_jls(encode_jls(img))[2], img)


def test_ff_stuffing_provoked_and_validated():
    """A raster tuned to emit long all-ones bit spans forces 0xFF
    bytes into the entropy data; T.87's stuffing rule means no byte
    following an 0xFF may have its MSB set, and the decoder rejects
    a stream that violates it."""
    # alternating extreme values in regular mode produce dense unary
    # 1-terminators and escape codes -> 0xFF bytes appear
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 0
    enc = encode_jls(img)
    body = enc[len(_headers(48, 48)) : -2]
    ffs = [i for i, b in enumerate(body) if b == 0xFF]
    assert ffs, "fixture failed to provoke an 0xFF in entropy data"
    for i in ffs:
        if i + 1 < len(body):
            assert body[i + 1] & 0x80 == 0, "stuffing rule violated"
    assert np.array_equal(decode_jls(enc)[2], img)
    # and the decoder enforces it: set the MSB after the first
    # mid-body 0xFF -> marker inside entropy data
    mid = [i for i in ffs if i + 1 < len(body)]
    bad = bytearray(enc)
    pos = len(_headers(48, 48)) + mid[0] + 1
    bad[pos] |= 0x80
    with pytest.raises(JlsFormatError):
        decode_jls(bytes(bad))


def test_compression_beats_raw_on_flat_content():
    img = np.full((64, 64), 200, dtype=np.uint8)
    enc = encode_jls(img)
    assert len(enc) < 64 * 64 // 8  # runs collapse ~two orders


def test_column_and_row_vectors():
    for shape in [(1, 17), (17, 1), (2, 2), (1, 256), (256, 1)]:
        img = (np.arange(shape[0] * shape[1]) % 251).astype(
            np.uint8
        ).reshape(shape)
        w, h, out = decode_jls(encode_jls(img))
        assert (h, w) == shape and np.array_equal(out, img)


def test_encoder_input_validation():
    with pytest.raises(JlsFormatError, match="2-D uint8"):
        encode_jls(np.zeros((2, 2), dtype=np.int32))
    with pytest.raises(JlsFormatError, match="2-D uint8"):
        encode_jls(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(JlsFormatError, match="outside the 16-bit"):
        encode_jls(np.zeros((0x10000, 1), dtype=np.uint8))


def test_decoder_error_paths():
    enc = encode_jls(np.arange(16, dtype=np.uint8).reshape(4, 4))
    with pytest.raises(JlsFormatError, match="SOI"):
        decode_jls(b"\x00" + enc)
    with pytest.raises(JlsFormatError, match="truncated"):
        decode_jls(enc[:10])
    with pytest.raises(JlsFormatError):
        decode_jls(enc[:-4])  # entropy data / EOI cut off
    # NEAR != 0 -> documented seam
    bad = bytearray(enc)
    sos_off = enc.find(b"\xff\xda")
    bad[sos_off + 2 + 5] = 2  # NEAR byte inside SOS
    with pytest.raises(JlsFormatError, match="near-lossless"):
        decode_jls(bytes(bad))
    # precision != 8
    bad = bytearray(enc)
    bad[6] = 12  # P byte of SOF55
    with pytest.raises(JlsFormatError, match="precision"):
        decode_jls(bytes(bad))
    # multi-component
    bad = bytearray(enc)
    bad[11] = 3  # Nf byte
    with pytest.raises(JlsFormatError, match="component count"):
        decode_jls(bytes(bad))
    # LSE preset marker before SOS
    with_lse = (
        enc[:2]
        + b"\xff\xf8" + struct.pack(">H", 13) + bytes(11)
        + enc[2:]
    )
    with pytest.raises(JlsFormatError, match="LSE"):
        decode_jls(with_lse)
    # EOI with no scan
    with pytest.raises(JlsFormatError, match="EOI before"):
        decode_jls(b"\xff\xd8\xff\xd9")
    # baseline-JPEG SOF belongs to jpegcodec
    bad = bytearray(enc)
    bad[3] = 0xC0
    with pytest.raises(JlsFormatError, match="jpegcodec"):
        decode_jls(bytes(bad))
    # the domain error is a subclass of the family root
    assert issubclass(JlsFormatError, ImageFormatError)


def test_mutation_battery():
    """3000 random mutations over three fixture streams: every
    failure is JlsFormatError (or a clean decode when the mutation
    misses the validated surface) — no non-domain escapes."""
    rng = np.random.default_rng(13)
    bases = [
        bytearray(encode_jls(np.zeros((3, 3), dtype=np.uint8))),
        bytearray(
            encode_jls(
                rng.integers(0, 256, size=(12, 9), dtype=np.uint8)
            )
        ),
        bytearray(
            encode_jls(
                ((np.arange(20)[:, None] * np.arange(15)[None, :]) % 256)
                .astype(np.uint8)
            )
        ),
    ]
    random.seed(13)
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
            decode_jls(bytes(b))
        except JlsFormatError:
            pass
