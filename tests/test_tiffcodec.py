"""TIFF 6.0 codec tests.

Same independence strategy as the JPEG/GIF suites: roundtrips prove
encoder/decoder consistency; HAND-ASSEMBLED streams (derivations in
comments — spec section references, byte-level layout) prove the
DECODER against inputs the encoder never produced, including the
TIFF-LZW early-change rule that a symmetric encoder/decoder bug could
otherwise hide."""

import struct

import numpy as np
import pytest

from databatchprotectionservice_spark.core.tiffcodec import (
    TiffFormatError,
    decode_tiff,
    encode_tiff,
)


def test_roundtrip_matrix():
    rng = np.random.RandomState(5)
    for shape in [(1, 1), (3, 7), (13, 21)]:
        for color in (False, True):
            img = rng.randint(
                0, 256, size=shape + ((3,) if color else ()), dtype=np.uint8
            )
            want = (
                img if color else np.repeat(img[:, :, None], 3, axis=2)
            )
            for comp in ("none", "packbits", "lzw"):
                for bo in ("II", "MM"):
                    for rps in (None, 2):
                        for pred in (False, True):
                            if pred and comp == "none":
                                continue
                            w, h, rgb = decode_tiff(
                                encode_tiff(
                                    img,
                                    compression=comp,
                                    byte_order=bo,
                                    rows_per_strip=rps,
                                    predictor=pred,
                                )
                            )
                            assert (w, h) == (shape[1], shape[0])
                            assert np.array_equal(rgb, want), (
                                shape, color, comp, bo, rps, pred,
                            )


def test_lzw_hits_width_growth_and_clear():
    """72 KB of random bytes forces the 10/11/12-bit code widths and a
    mid-stream table Clear at 4094 — decode must stay exact."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(120, 200, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(img, compression="lzw"))[2], img
    )


def _ifd(bo, entries, next_off=0):
    out = struct.pack(bo + "H", len(entries))
    for tag, typ, count, vf in sorted(entries):
        out += struct.pack(bo + "HHI", tag, typ, count) + vf
    return out + struct.pack(bo + "I", next_off)


def _short_vf(bo, v):
    return struct.pack(bo + "H", v) + b"\x00\x00"


def _long_vf(bo, v):
    return struct.pack(bo + "I", v)


def _hand_tiff(bo_tag, strip, extra=(), photometric=1):
    """Minimal 4x2 grayscale TIFF with the given strip bytes at a
    hand-computed offset: header(8) + IFD(2 + 9*12 + 4 = 114) -> strip
    at 122."""
    bo = "<" if bo_tag == b"II*\x00" else ">"
    entries = [
        (256, 3, 1, _short_vf(bo, 4)),   # ImageWidth
        (257, 3, 1, _short_vf(bo, 2)),   # ImageLength
        (258, 3, 1, _short_vf(bo, 8)),   # BitsPerSample
        (259, 3, 1, _short_vf(bo, extra[0] if extra else 1)),  # Compression
        (262, 3, 1, _short_vf(bo, photometric)),
        (273, 4, 1, _long_vf(bo, 122)),  # StripOffsets
        (277, 3, 1, _short_vf(bo, 1)),   # SamplesPerPixel
        (278, 3, 1, _short_vf(bo, 2)),   # RowsPerStrip
        (279, 4, 1, _long_vf(bo, len(strip))),  # StripByteCounts
    ]
    return bo_tag + struct.pack(bo + "I", 8) + _ifd(bo, entries) + strip


def test_hand_assembled_uncompressed_both_endiannesses():
    strip = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    for bo_tag in (b"II*\x00", b"MM\x00*"):
        w, h, rgb = decode_tiff(_hand_tiff(bo_tag, strip))
        assert (w, h) == (4, 2)
        assert np.array_equal(
            rgb[:, :, 0],
            np.frombuffer(strip, dtype=np.uint8).reshape(2, 4),
        )
        assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])


def test_hand_assembled_white_is_zero_inverts():
    strip = bytes([0, 255, 10, 245, 1, 2, 3, 4])
    w, h, rgb = decode_tiff(
        _hand_tiff(b"II*\x00", strip, photometric=0)
    )
    assert np.array_equal(
        rgb[:, :, 0].reshape(-1), 255 - np.array(list(strip))
    )


def test_hand_assembled_packbits_vector():
    """PackBits per spec section 9 worked example style:
    [0xFE 0xAA] -> AA AA AA (257-254=3 repeats);
    [0x02 0x80 0x00 0x2A] -> literal 80 00 2A;
    [0xFD 0x2A] -> 2A x4  => total 10... trimmed to the 8 expected."""
    strip = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0x2A])
    w, h, rgb = decode_tiff(_hand_tiff(b"II*\x00", strip, extra=(32773,)))
    assert list(rgb[:, :, 0].reshape(-1)) == [
        0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0x2A, 0x2A,
    ]


def test_hand_assembled_lzw_early_change_vector():
    """Hand-packed TIFF-LZW stream (section 13), MSB-first 9-bit codes:
    Clear(256)=100000000, 'A'(65)=001000001, 'B'(66)=001000010,
    258(=AB, the first table entry)=100000010, EOI(257)=100000001.
    Bit-concatenation:
      100000000 001000001 001000010 100000010 100000001
    -> bytes 0x80 0x10 0x44 0x85 0x02 0x81 (+ pad 0s) decoding to
    'A','B','A','B' == 65 66 65 66, proving table construction order
    (entry 258 = prev+cur[0] created right after 'B')."""
    bits = "100000000" + "001000001" + "001000010" + "100000010" + "100000001"
    bits += "0" * ((8 - len(bits) % 8) % 8)
    strip = int(bits, 2).to_bytes(len(bits) // 8, "big")
    # 4 expected bytes -> width 4 x height 1 variant of the hand frame
    bo = "<"
    entries = [
        (256, 3, 1, _short_vf(bo, 4)),
        (257, 3, 1, _short_vf(bo, 1)),
        (258, 3, 1, _short_vf(bo, 8)),
        (259, 3, 1, _short_vf(bo, 5)),  # LZW
        (262, 3, 1, _short_vf(bo, 1)),
        (273, 4, 1, _long_vf(bo, 122)),
        (277, 3, 1, _short_vf(bo, 1)),
        (278, 3, 1, _short_vf(bo, 1)),
        (279, 4, 1, _long_vf(bo, len(strip))),
    ]
    data = b"II*\x00" + struct.pack(bo + "I", 8) + _ifd(bo, entries) + strip
    w, h, rgb = decode_tiff(data)
    assert list(rgb[0, :, 0]) == [65, 66, 65, 66]


def test_unsupported_modes_raise_domain_errors():
    img = np.zeros((4, 4), np.uint8)
    data = bytearray(encode_tiff(img))
    with pytest.raises(TiffFormatError, match="magic"):
        decode_tiff(b"ZZZZ" + bytes(data[4:]))
    # unknown compression id patched into the hand frame
    bad = _hand_tiff(b"II*\x00", b"\x00" * 8, extra=(7,))  # 7 = JPEG-in-TIFF (old)
    with pytest.raises(TiffFormatError, match="compression"):
        decode_tiff(bad)


def test_decoder_never_crashes_on_mutations():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(8, 12, 3), dtype=np.uint8)
    base = bytearray(
        encode_tiff(img, compression="lzw", predictor=True, rows_per_strip=3)
    )
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            w, h, rgb = decode_tiff(bytes(data))
            assert rgb.dtype == np.uint8 and rgb.shape[2] == 3
        except TiffFormatError:
            pass
        except (ValueError, IndexError, struct.error, OverflowError) as exc:
            raise AssertionError(
                f"trial {trial}: non-domain exception "
                f"{type(exc).__name__}: {exc}"
            ) from exc


def test_decoder_never_crashes_on_truncations():
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, size=(6, 9), dtype=np.uint8)
    base = encode_tiff(img, compression="packbits")
    for cut in range(0, len(base), 3):
        try:
            decode_tiff(base[:cut])
        except TiffFormatError:
            pass


def test_allocation_guard():
    # 65535 x 65535 header must raise, not allocate
    strip = b"\x00" * 8
    bo = "<"
    entries = [
        (256, 3, 1, _short_vf(bo, 65535)),
        (257, 3, 1, _short_vf(bo, 65535)),
        (258, 3, 1, _short_vf(bo, 8)),
        (259, 3, 1, _short_vf(bo, 1)),
        (262, 3, 1, _short_vf(bo, 1)),
        (273, 4, 1, _long_vf(bo, 122)),
        (277, 3, 1, _short_vf(bo, 1)),
        (278, 3, 1, _short_vf(bo, 65535)),
        (279, 4, 1, _long_vf(bo, len(strip))),
    ]
    data = b"II*\x00" + struct.pack(bo + "I", 8) + _ifd(bo, entries) + strip
    with pytest.raises(TiffFormatError, match="range"):
        decode_tiff(data)


def test_zero_rows_per_strip_is_a_domain_error():
    """A corrupt RowsPerStrip of 0 must raise TiffFormatError, not
    ZeroDivisionError (found by the extended fuzz campaign — a
    non-domain exception escaping a mapInPandas decode kills the whole
    task set with an undiagnosable traceback)."""
    import struct

    import numpy as np

    from databatchprotectionservice_spark.core.tiffcodec import (
        TiffFormatError,
        decode_tiff,
        encode_tiff,
    )

    img = np.zeros((4, 5, 3), dtype=np.uint8)
    data = bytearray(encode_tiff(img))
    # locate the RowsPerStrip (tag 278) entry and zero its value
    pos = data.find(struct.pack("<H", 278))
    assert pos != -1
    struct.pack_into("<I", data, pos + 8, 0)
    with pytest.raises(TiffFormatError, match="RowsPerStrip"):
        decode_tiff(bytes(data))
