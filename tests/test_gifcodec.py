"""GIF codec: roundtrips, a hand-assembled known-answer LZW stream,
interlace, local palettes, extension skipping, and corrupt-input
rejection.

The hand-assembled stream exists because encoder and decoder share an
author: a symmetric misunderstanding of the LZW width-growth rule would
pass any roundtrip test, so the bit-exact expected stream for a known
pixel sequence is derived BY HAND from the GIF89a spec (Appendix F) in
the comments below and pinned both directions.
"""

import struct

import numpy as np
import pytest

from databatchprotectionservice_spark.core.gifcodec import (
    GRAY_PALETTE,
    GifFormatError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# hand-assembled known-answer stream
# ---------------------------------------------------------------------------


def test_lzw_known_answer_stream():
    """pixels [1,1,1,1,1], min_code_size=2 (clear=4, end=5, width=3).

    Encoder trace: CLEAR(4); emit 1, add 6=(1,1); run grows to (1,1),
    emit 6, add 7=(1,1,1); run grows to (1,1), emit 6; END(5).
    Codes, all width 3, LSB-first: 4,1,6,6,5 ->
    bits 001|100|011|011|101 packed low-bit-first = bytes 0x8C 0x5D."""
    enc = _lzw_encode(bytes([1, 1, 1, 1, 1]), 2)
    assert enc == bytes([0x8C, 0x5D])
    dec = _lzw_decode(bytes([0x8C, 0x5D]), 2, 5)
    assert list(dec) == [1, 1, 1, 1, 1]


def test_lzw_kwkwk_case():
    """[1,1,1,1] emits code 6 immediately after defining it (KwKwK)."""
    enc = _lzw_encode(bytes([1, 1, 1, 1]), 2)
    assert list(_lzw_decode(enc, 2, 4)) == [1, 1, 1, 1]


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    data = _rng(mcs).integers(0, 1 << mcs, size=5000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, mcs), mcs, len(data)).tobytes() == data


def test_lzw_width_growth_and_table_full_clear():
    """128x128 random 8-bit pixels force the dictionary through every
    width 9..12 and past 4096 entries, exercising the encoder's
    CLEAR-and-rebuild path and the decoder's reset."""
    data = _rng(1).integers(0, 256, size=128 * 128, dtype=np.uint8).tobytes()
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)).tobytes() == data


def test_lzw_rejects_code_beyond_table():
    # width-3 stream: CLEAR(4) then code 7 with an empty dictionary
    # (> len(table) == 6) must raise, not KwKwK
    # bits: 100 111 -> byte 0b00111100 = 0x3C
    with pytest.raises(GifFormatError, match="beyond table|out of table"):
        _lzw_decode(bytes([0x3C]), 2, 4)


# ---------------------------------------------------------------------------
# container roundtrips
# ---------------------------------------------------------------------------


def test_gif_roundtrip_gray_palette():
    idx = _rng(2).integers(0, 256, size=(40, 31), dtype=np.uint8)
    blob = encode_gif(idx, GRAY_PALETTE)
    w, h, pix = decode_gif(blob)
    assert (w, h) == (31, 40)
    assert np.array_equal(pix, GRAY_PALETTE[idx])


def test_gif_roundtrip_interlaced():
    idx = _rng(3).integers(0, 256, size=(13, 7), dtype=np.uint8)
    blob = encode_gif(idx, GRAY_PALETTE, interlace=True)
    plain = encode_gif(idx, GRAY_PALETTE, interlace=False)
    assert blob != plain  # genuinely interleaved rows on the wire
    w, h, pix = decode_gif(blob)
    assert np.array_equal(pix, GRAY_PALETTE[idx])


def test_gif_small_palette():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = _rng(4).integers(0, 4, size=(9, 9), dtype=np.uint8)
    w, h, pix = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(pix, pal[idx])


def test_gif_extensions_skipped_and_local_palette_wins():
    """Hand-splice a graphic-control extension and a local color table
    into an encoded stream; decode must skip the extension and use the
    LOCAL palette."""
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    global_pal = np.array([[9, 9, 9], [7, 7, 7]], np.uint8)
    local_pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    base = encode_gif(idx, global_pal)
    # base layout: 6 sig + 7 LSD + 6 GCT + image block
    img_at = 13 + 6
    assert base[img_at] == 0x2C
    desc = bytearray(base[img_at : img_at + 10])
    desc[9] |= 0x80  # local color table flag, size bits already 0 (2 entries)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = (
        base[:img_at]
        + gce
        + bytes(desc[:10])
        + local_pal.tobytes()
        + base[img_at + 10 :]
    )
    w, h, pix = decode_gif(spliced)
    assert np.array_equal(pix, local_pal[idx])


def test_gif_87a_signature_accepted():
    blob = bytearray(encode_gif(np.zeros((2, 2), np.uint8), GRAY_PALETTE))
    blob[:6] = b"GIF87a"
    w, h, _ = decode_gif(bytes(blob))
    assert (w, h) == (2, 2)


# ---------------------------------------------------------------------------
# corrupt input
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b[:5], "truncated GIF header"),
        (lambda b: b"JIF89a" + b[6:], "not a GIF"),
        (lambda b: b[:13], "truncated global color table"),
        (lambda b: b"GIF89a" + b[6:12] + bytes([0]) + b"\x3b", "no image"),
    ],
)
def test_gif_corrupt_headers(mutate, msg):
    blob = encode_gif(np.zeros((3, 3), np.uint8), GRAY_PALETTE)
    with pytest.raises(GifFormatError):
        decode_gif(mutate(blob))


def test_gif_truncated_pixel_data():
    blob = encode_gif(
        _rng(5).integers(0, 256, size=(20, 20), dtype=np.uint8), GRAY_PALETTE
    )
    with pytest.raises(GifFormatError):
        decode_gif(blob[: len(blob) - 8])


def test_gif_oversize_rejected():
    hdr = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)
    gct = bytes(6)
    desc = struct.pack("<BHHHHB", 0x2C, 0, 0, 60000, 60000, 0)
    with pytest.raises(GifFormatError, match="too large"):
        decode_gif(hdr + gct + desc + bytes([8, 0]) + b"\x3b")


def test_gif_index_outside_palette_rejected():
    pal = np.array([[0, 0, 0], [1, 1, 1]], np.uint8)
    idx = np.zeros((2, 2), np.uint8)
    blob = bytearray(encode_gif(idx, pal))
    # rewrite the pixel stream to emit index 3 (still a valid root for
    # min_code_size 2, but beyond the 2-entry palette)
    raw = _lzw_encode(bytes([3, 3, 3, 3]), 2)
    tail = bytes([2, len(raw)]) + raw + bytes([0, 0x3B])
    img_at = 13 + 6
    blob = bytes(blob[: img_at + 10]) + tail
    with pytest.raises(GifFormatError, match="outside"):
        decode_gif(blob)


def test_gif_fuzz_mutations_never_escape():
    blob = encode_gif(
        _rng(6).integers(0, 256, size=(16, 16), dtype=np.uint8), GRAY_PALETTE
    )
    rng = _rng(7)
    for _ in range(300):
        b = bytearray(blob)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            decode_gif(bytes(b))
        except GifFormatError:
            pass  # the contract: decode or domain error, never an escape
