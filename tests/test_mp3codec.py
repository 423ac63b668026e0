"""MPEG audio frame-header walker (core/mp3codec.py).

Same discipline as test_mp4codec/test_oggcodec: a hand-assembled
frame pins the header bit layout and the spec frame-length formula
byte-for-byte against an INDEPENDENT table in this file, hypothesis
round-trips sweep the version x layer x bitrate x rate matrix, the
Xing/VBRI/ID3 structures are built and re-read both by the codec and
by hand, and a mutation battery proves every escape is the domain
error.
"""

import random
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.audiocodec import AudioFormatError
from databatchprotectionservice_spark.core.mp3codec import (
    Mp3FormatError,
    encode_id3v1,
    encode_id3v2,
    encode_mp3,
    parse_mp3,
)

# independent frame-length model: spec constants re-derived here, not
# imported from the codec
_IND_RATES = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
              "2.5": (11025, 12000, 8000)}


def _ind_frame_size(version, layer, kbps, rate, padding=0):
    if layer == 1:
        return (12 * kbps * 1000 // rate + padding) * 4
    if layer == 3 and version != "1":
        return 72 * kbps * 1000 // rate + padding
    return 144 * kbps * 1000 // rate + padding


def test_hand_assembled_single_frame():
    """MPEG1 Layer III, 128 kbps, 44100 Hz, mono, no CRC:
    header bits AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
    = FF FB (1111 1111 111 11 01 1) 90 (1001 00 0 0) C0 (11 ...).
    Frame length = 144*128000//44100 = 417 bytes."""
    size = 144 * 128000 // 44100
    assert size == 417
    frame = bytes([0xFF, 0xFB, 0x90, 0xC0]) + bytes(size - 4)
    info = parse_mp3(frame)
    assert info["mpeg_version"] == "1" and info["layer"] == 3
    assert info["sample_rate"] == 44100 and info["channels"] == 1
    assert info["n_frames"] == 1 and info["samples_per_frame"] == 1152
    assert info["total_samples"] == 1152
    assert info["duration_ms"] == 1152 * 1000 // 44100
    assert info["stream_bytes"] == 417
    assert info["bitrate_kbps_min"] == info["bitrate_kbps_max"] == 128
    assert not info["is_vbr"] and not info["has_crc"]
    # padding bit adds exactly one byte
    padded = bytes([0xFF, 0xFB, 0x92, 0xC0]) + bytes(size - 3)
    assert parse_mp3(padded)["stream_bytes"] == 418
    # and the encoder reproduces the unpadded frame header verbatim
    enc = encode_mp3(b"", bitrate_kbps=128, rate=44100, channels=1)
    assert enc[:4] == frame[:4] and len(enc) == size


@settings(max_examples=80, deadline=None)
@given(
    version=st.sampled_from(["1", "2", "2.5"]),
    layer=st.sampled_from([1, 2, 3]),
    rate_idx=st.integers(0, 2),
    kb_pick=st.integers(0, 13),
    channels=st.sampled_from([1, 2]),
    nbytes=st.integers(0, 5000),
    seed=st.integers(0, 99),
)
def test_roundtrip_matrix(version, layer, rate_idx, kb_pick, channels,
                          nbytes, seed):
    from databatchprotectionservice_spark.core.mp3codec import _BITRATE

    rate = _IND_RATES[version][rate_idx]
    table = _BITRATE[(1 if version == "1" else 2, layer)]
    kb = table[kb_pick]
    if _ind_frame_size(version, layer, kb, rate) <= 4:
        return  # degenerate combos are rejected by the encoder
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
    enc = encode_mp3(payload, version=version, layer=layer,
                     bitrate_kbps=kb, rate=rate, channels=channels)
    info = parse_mp3(enc)
    assert info["mpeg_version"] == version and info["layer"] == layer
    assert info["sample_rate"] == rate and info["channels"] == channels
    assert info["bitrate_kbps_min"] == kb and not info["is_vbr"]
    fsize = _ind_frame_size(version, layer, kb, rate)
    assert info["stream_bytes"] == info["n_frames"] * fsize == len(enc)
    assert info["n_frames"] == max(
        1, -(-len(payload) // (fsize - 4))
    )
    # exact sample accounting: layer x version dependent
    spf = {1: 384, 2: 1152}.get(layer, 1152 if version == "1" else 576)
    assert info["total_samples"] == info["n_frames"] * spf


def test_vbr_stream_and_xing_counts():
    payload = bytes(range(256)) * 40
    enc = encode_mp3(payload, bitrate_kbps=[96, 160, 128], xing=True)
    info = parse_mp3(enc)
    assert info["is_vbr"]
    assert info["bitrate_kbps_min"] == 96
    assert info["bitrate_kbps_max"] == 160
    assert info["xing"]["tag"] == "Xing"
    # the Xing counters must equal the walker's ground truth
    assert info["xing"]["frames"] == info["n_frames"]
    assert info["xing"]["bytes"] == info["stream_bytes"] == len(enc)


def test_xing_offset_depends_on_version_and_channels():
    """Side-info lengths 32/17/17/9 position the Xing magic."""
    for version, channels, side in [
        ("1", 2, 32), ("1", 1, 17), ("2", 2, 17), ("2", 1, 9),
    ]:
        enc = encode_mp3(b"x", version=version, channels=channels,
                         bitrate_kbps=64, rate=_IND_RATES[version][2],
                         xing=True)
        assert enc[4 + side : 4 + side + 4] == b"Xing"
        assert parse_mp3(enc)["xing"]["tag"] == "Xing"


def test_id3v2_and_id3v1_roundtrip():
    tags = {"title": "Träumerei ☃", "artist": "pëg", "album": "A"}
    enc = encode_mp3(b"abc", id3v2=tags,
                     id3v1={"title": "T1", "artist": "A1", "year": "1999",
                            "genre": 17})
    info = parse_mp3(enc)
    assert info["id3v2"] == tags  # UTF-8 text frames, byte-exact
    assert info["id3v1"]["title"] == "T1"
    assert info["id3v1"]["year"] == "1999"
    assert info["id3v1"]["genre"] == 17
    # hand-read the v2.4 tag: syncsafe sizes, TIT2 first
    assert enc[:3] == b"ID3" and enc[3] == 4
    body_size = ((enc[6] << 21) | (enc[7] << 14) | (enc[8] << 7) | enc[9])
    assert enc[10:14] == b"TIT2"
    tit2_len = ((enc[14] << 21) | (enc[15] << 14) | (enc[16] << 7) | enc[17])
    assert enc[20] == 3  # UTF-8 encoding byte
    assert enc[21 : 20 + tit2_len] == tags["title"].encode("utf-8")
    assert 10 + body_size < len(enc)


def test_id3v23_plain_u32_frames_parse_too():
    """A hand-built v2.3 tag (non-syncsafe frame sizes)."""
    payload = b"\x00Hello"
    frame = b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    tag = b"ID3" + bytes([3, 0, 0]) + bytes(
        [(len(frame) >> 21) & 0x7F, (len(frame) >> 14) & 0x7F,
         (len(frame) >> 7) & 0x7F, len(frame) & 0x7F]
    ) + frame
    enc = tag + encode_mp3(b"q")
    assert parse_mp3(enc)["id3v2"] == {"title": "Hello"}


def test_vbri_header_detected():
    """VBRI sits at a FIXED 32-byte offset after the header."""
    size = _ind_frame_size("1", 3, 128, 44100)
    vbri = b"VBRI" + struct.pack(">HHHII", 1, 0, 80, size, 1)
    frame = bytearray(bytes([0xFF, 0xFB, 0x90, 0xC0]) + bytes(size - 4))
    frame[36 : 36 + len(vbri)] = vbri
    info = parse_mp3(bytes(frame))
    assert info["vbri"] == {"version": 1, "delay": 0, "quality": 80,
                            "bytes": size, "frames": 1}


def test_error_paths():
    enc = encode_mp3(bytes(1000))
    with pytest.raises(Mp3FormatError, match="sync"):
        parse_mp3(b"\x00" * 100)
    with pytest.raises(Mp3FormatError, match="overruns"):
        parse_mp3(enc[:-10])
    with pytest.raises(Mp3FormatError, match="trailing"):
        parse_mp3(enc + b"\x01\x02")
    # free-format bitrate -> documented seam
    bad = bytearray(enc)
    bad[2] &= 0x0F
    with pytest.raises(Mp3FormatError, match="free-format"):
        parse_mp3(bytes(bad))
    # reserved version bits
    bad = bytearray(enc)
    bad[1] = (bad[1] & ~0x18) | 0x08
    with pytest.raises(Mp3FormatError, match="reserved MPEG version"):
        parse_mp3(bytes(bad))
    # reserved layer
    bad = bytearray(enc)
    bad[1] &= ~0x06
    with pytest.raises(Mp3FormatError, match="reserved layer"):
        parse_mp3(bytes(bad))
    # reserved sample-rate index
    bad = bytearray(enc)
    bad[2] |= 0x0C
    with pytest.raises(Mp3FormatError, match="sample-rate"):
        parse_mp3(bytes(bad))
    # cross-frame inconsistency: flip frame 2's channel mode
    size = _ind_frame_size("1", 3, 128, 44100)
    bad = bytearray(enc)
    bad[size + 3] ^= 0xC0
    with pytest.raises(Mp3FormatError, match="inconsistent"):
        parse_mp3(bytes(bad))
    # encoder-side validation
    with pytest.raises(Mp3FormatError, match="invalid for MPEG"):
        encode_mp3(b"", bitrate_kbps=447)
    with pytest.raises(Mp3FormatError, match="rate"):
        encode_mp3(b"", rate=22050)  # MPEG1 has no 22050
    with pytest.raises(Mp3FormatError, match="version"):
        encode_mp3(b"", version="3")
    # ID3v2 overrun
    with pytest.raises(Mp3FormatError, match="overruns"):
        parse_mp3(b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0x7F, 0x7F]))
    # domain error inherits the audio family root
    assert issubclass(Mp3FormatError, AudioFormatError)


def test_mutation_battery():
    """3000 random mutations: every failure is Mp3FormatError — no
    non-domain escapes."""
    rng = np.random.default_rng(29)
    bases = [
        bytearray(encode_mp3(bytes(200), channels=1)),
        bytearray(encode_mp3(
            rng.integers(0, 256, 4000, dtype=np.uint8).tobytes(),
            version="2.5", layer=2, bitrate_kbps=[48, 64], rate=8000,
            xing=True,
        )),
        bytearray(encode_mp3(b"tagged", id3v2={"title": "t"},
                             id3v1={"artist": "a"})),
    ]
    random.seed(29)
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
            parse_mp3(bytes(b))
        except Mp3FormatError:
            pass
