"""EBML / Matroska / WebM walker (core/mkvcodec.py).

A hand-assembled minimal WebM pins the vint and SimpleBlock layouts
byte-for-byte (including 1/2/4-byte size edge cases and the reserved
all-ones pattern), the Matroska CRC-32 rule is cross-checked against
zlib on both the emit and verify sides, hypothesis round-trips sweep
track/cluster shapes, and a mutation battery proves every escape is
the domain error.
"""

import random
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.mkvcodec import (
    MkvFormatError,
    encode_mkv,
    parse_mkv,
)


def _vint_size(n: int) -> bytes:
    """Independent shortest-definite-size vint model."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise AssertionError


def _el(eid: bytes, payload: bytes) -> bytes:
    return eid + _vint_size(len(payload)) + payload


def test_hand_assembled_minimal_webm():
    """EBML header + Segment(Info, Tracks(1 video), Cluster(1
    SimpleBlock)) built byte-by-byte without the encoder."""
    header = _el(
        b"\x1a\x45\xdf\xa3",
        _el(b"\x42\x82", b"webm") + _el(b"\x42\x87", b"\x04"),
    )
    info = _el(
        b"\x15\x49\xa9\x66",
        _el(b"\x2a\xd7\xb1", b"\x0f\x42\x40")  # 1_000_000
        + _el(b"\x57\x41", "wrîter".encode("utf-8")),
    )
    tracks = _el(
        b"\x16\x54\xae\x6b",
        _el(
            b"\xae",
            _el(b"\xd7", b"\x01")  # TrackNumber 1
            + _el(b"\x83", b"\x01")  # video
            + _el(b"\x86", b"V_VP9")
            + _el(b"\xe0", _el(b"\xb0", b"\x02\x80")  # 640
                  + _el(b"\xba", b"\x01\xe0")),  # 480
        ),
    )
    block = bytes([0x81]) + struct.pack(">h", -3) + b"\x80" + b"payload!"
    cluster = _el(
        b"\x1f\x43\xb6\x75",
        _el(b"\xe7", b"\x64") + _el(b"\xa3", block),  # ts 100
    )
    data = header + _el(
        b"\x18\x53\x80\x67", info + tracks + cluster
    )
    out = parse_mkv(data)
    assert out["container"] == "webm" and out["doctype_version"] == 4
    assert out["timestamp_scale"] == 1000000
    assert out["writing_app"] == "wrîter"
    (t,) = out["tracks"]
    assert t["number"] == 1 and t["type"] == "video"
    assert t["codec_id"] == "V_VP9"
    assert t["width"] == 640 and t["height"] == 480
    assert t["n_blocks"] == 1 and t["payload_bytes"] == 8
    assert out["n_clusters"] == 1 and out["n_blocks"] == 1
    assert out["max_timestamp"] == 97  # 100 + (-3)
    assert out["media_bytes"] == 8


def test_vint_edges_and_reserved_all_ones():
    """127 must take a 2-byte size; the all-ones 1-byte size 0xFF is
    the reserved unknown-size pattern — allowed ONLY on
    Segment/Cluster (RFC 9559), so it raises wherever else it
    appears."""
    assert _vint_size(126) == b"\xfe"
    assert _vint_size(127) == b"\x40\x7f"
    assert _vint_size(16382) == b"\x7f\xfe"
    enc = encode_mkv(
        [{"number": 1, "type": "video", "codec_id": "V_VP8",
          "width": 2, "height": 2}],
        [(0, [(1, 0, bytes(126))])],
    )
    assert parse_mkv(enc)["media_bytes"] == 126
    # the marker on an element without unknownsizeallowed (Info)
    # still raises the named error
    info_at = enc.find(b"\x15\x49\xa9\x66")
    assert info_at != -1
    bad = bytearray(enc)
    assert bad[info_at + 4] & 0x80  # 1-byte definite size today
    bad[info_at + 4] = 0xFF
    with pytest.raises(MkvFormatError, match="unknown-size"):
        parse_mkv(bytes(bad))


def _all_ones_same_length(data: bytearray, at: int) -> None:
    """Rewrite the definite-size vint at ``at`` into the SAME-LENGTH
    unknown-size (all value bits 1) marker, keeping every offset."""
    b0 = data[at]
    length = 1
    mask = 0x80
    while not b0 & mask:
        mask >>= 1
        length += 1
    data[at] = b0 | (mask - 1)
    for i in range(1, length):
        data[at + i] = 0xFF


def test_unknown_size_segment_and_cluster_parse():
    """r12: streaming-muxed shapes — an unknown-size Segment runs to
    EOF and an unknown-size Cluster terminates at the next
    non-Cluster-child ID (here: the next Cluster) — with metadata
    identical to the definite-size original."""
    tracks = [
        {"number": 1, "type": "video", "codec_id": "V_VP8",
         "width": 4, "height": 2},
        {"number": 2, "type": "audio", "codec_id": "A_OPUS",
         "sampling_hz": 48000, "channels": 2},
    ]
    clusters = [
        (0, [(1, 0, b"abc"), (2, 1, b"de")]),
        (100, [(1, 5, b"fgh" * 7)]),
        (200, [(2, 0, b"x")]),
    ]
    enc = encode_mkv(tracks, clusters, crc=True)
    want = parse_mkv(enc)

    # Segment size -> unknown (same-length marker keeps offsets)
    seg_at = enc.find(b"\x18\x53\x80\x67")
    streaming = bytearray(enc)
    _all_ones_same_length(streaming, seg_at + 4)
    assert parse_mkv(bytes(streaming)) == want

    # every Cluster size -> unknown, one at a time and all at once
    cl_at = [
        i for i in range(len(enc))
        if enc[i : i + 4] == b"\x1f\x43\xb6\x75"
    ]
    assert len(cl_at) == 3
    for at in cl_at:
        one = bytearray(enc)
        _all_ones_same_length(one, at + 4)
        assert parse_mkv(bytes(one)) == want, at
    both = bytearray(streaming)
    for at in cl_at:
        _all_ones_same_length(both, at + 4)
    assert parse_mkv(bytes(both)) == want


def test_crc32_emitted_and_verified():
    enc = encode_mkv(
        [{"number": 1, "type": "audio", "codec_id": "A_OPUS",
          "sampling_hz": 48000, "channels": 2}],
        [(0, [(1, 0, b"opus")])],
        crc=True,
    )
    out = parse_mkv(enc)
    assert out["tracks"][0]["sampling_hz"] == 48000
    # the CRC element is really there (ID 0xBF, 4-byte payload)...
    crc_at = enc.find(b"\xbf\x84")
    assert crc_at != -1
    # ...computed with the zlib polynomial over the REST of Info
    info_at = enc.find(b"\x15\x49\xa9\x66")
    assert crc_at > info_at
    stated = int.from_bytes(enc[crc_at + 2 : crc_at + 6], "little")
    # flipping one covered byte must be rejected
    bad = bytearray(enc)
    bad[crc_at + 8] ^= 0x01
    with pytest.raises(MkvFormatError, match="CRC-32 mismatch"):
        parse_mkv(bytes(bad))
    # and zlib agrees with the stated value on the pristine bytes
    covered_start = crc_at + 6
    # Info payload ends where Tracks begins
    tracks_at = enc.find(b"\x16\x54\xae\x6b")
    assert stated == (zlib.crc32(enc[covered_start:tracks_at]) & 0xFFFFFFFF)


@settings(max_examples=60, deadline=None)
@given(
    n_video=st.integers(0, 2),
    n_audio=st.integers(0, 2),
    n_clusters=st.integers(0, 4),
    blocks_per=st.integers(1, 5),
    seed=st.integers(0, 99),
    crc=st.booleans(),
    doctype=st.sampled_from(["webm", "matroska"]),
)
def test_roundtrip_shapes(n_video, n_audio, n_clusters, blocks_per,
                          seed, crc, doctype):
    rng = np.random.default_rng(seed)
    tracks = []
    for i in range(n_video):
        tracks.append({"number": i + 1, "type": "video",
                       "codec_id": "V_AV1", "width": int(rng.integers(1, 4096)),
                       "height": int(rng.integers(1, 4096))})
    for i in range(n_audio):
        tracks.append({"number": n_video + i + 1, "type": "audio",
                       "codec_id": "A_VORBIS",
                       "sampling_hz": int(rng.choice([8000, 44100, 48000])),
                       "channels": int(rng.integers(1, 8))})
    if not tracks:
        tracks = [{"number": 1, "type": "subtitle", "codec_id": "S_TEXT/UTF8"}]
    nums = [t["number"] for t in tracks]
    clusters = []
    total = 0
    n_blocks = 0
    max_ts = None
    for c in range(n_clusters):
        cts = int(rng.integers(0, 1 << 30))
        blocks = []
        for _ in range(blocks_per):
            num = int(rng.choice(nums))
            rel = int(rng.integers(-32768, 32767))
            payload = rng.integers(0, 256, size=int(rng.integers(0, 300)),
                                   dtype=np.uint8).tobytes()
            blocks.append((num, rel, payload))
            total += len(payload)
            n_blocks += 1
            ts = cts + rel
            max_ts = ts if max_ts is None else max(max_ts, ts)
        clusters.append((cts, blocks))
    enc = encode_mkv(tracks, clusters, doctype=doctype, crc=crc,
                     duration_ticks=123456)
    out = parse_mkv(enc)
    assert out["container"] == doctype
    assert out["duration_ticks"] == 123456
    assert len(out["tracks"]) == len(tracks)
    assert out["n_clusters"] == n_clusters
    assert out["n_blocks"] == n_blocks
    assert out["media_bytes"] == total
    assert out["max_timestamp"] == max_ts
    per_track = {t["number"]: t for t in out["tracks"]}
    for num in nums:
        want = sum(len(p) for c in clusters for (n, _, p) in c[1]
                   if n == num)
        assert per_track[num]["payload_bytes"] == want


def test_error_paths():
    enc = encode_mkv(
        [{"number": 1, "type": "video", "codec_id": "V_VP8",
          "width": 4, "height": 4}],
        [(10, [(1, 5, b"abcdef")])],
    )
    with pytest.raises(MkvFormatError, match="magic"):
        parse_mkv(b"\x00" + enc)
    with pytest.raises(MkvFormatError, match="overruns|truncated|span"):
        parse_mkv(enc[:-3])
    with pytest.raises(MkvFormatError, match="span"):
        parse_mkv(enc + b"junk")
    # non-Matroska doctype
    bad = bytearray(enc)
    at = bad.find(b"webm")
    bad[at : at + 4] = b"ebml"
    with pytest.raises(MkvFormatError, match="family"):
        parse_mkv(bytes(bad))
    with pytest.raises(MkvFormatError, match="refusing"):
        encode_mkv([], [], doctype="avi")
    # hostile lacing: flipping the Xiph flag on a plain block makes
    # the first payload byte a frame count whose size table overruns
    # — must raise, never mis-slice (block layout is [track vint]
    # [ts:2][flags] directly before the known payload)
    payload_at = enc.find(b"abcdef")
    bad = bytearray(enc)
    bad[payload_at - 1] |= 0x02  # flags byte
    with pytest.raises(MkvFormatError, match="lace|lacing"):
        parse_mkv(bytes(bad))
    # block for a track with no TrackEntry
    bad = bytearray(enc)
    bad[payload_at - 4] = 0x85  # track vint -> track 5
    with pytest.raises(MkvFormatError, match="no TrackEntry"):
        parse_mkv(bytes(bad))
    # the domain error inherits the engine's invalid-input root
    assert issubclass(MkvFormatError, DBPSInvalidInputError)


def test_non_integral_float_surfaces_as_none():
    enc = encode_mkv(
        [{"number": 1, "type": "audio", "codec_id": "A_OPUS",
          "sampling_hz": 48000, "channels": 1}],
        [],
    )
    # overwrite the 8-byte SamplingFrequency with 44100.5
    at = enc.find(struct.pack(">d", 48000.0))
    bad = enc[:at] + struct.pack(">d", 44100.5) + enc[at + 8 :]
    out = parse_mkv(bad)
    assert out["tracks"][0]["sampling_hz"] is None  # never a float


def test_mutation_battery():
    """3000 random mutations: every failure is MkvFormatError — no
    non-domain escapes."""
    rng = np.random.default_rng(31)
    bases = [
        bytearray(encode_mkv(
            [{"number": 1, "type": "video", "codec_id": "V_VP8",
              "width": 8, "height": 8}],
            [(0, [(1, 0, bytes(64))])],
        )),
        bytearray(encode_mkv(
            [{"number": 1, "type": "video", "codec_id": "V_AV1",
              "width": 1920, "height": 1080},
             {"number": 2, "type": "audio", "codec_id": "A_OPUS",
              "sampling_hz": 48000, "channels": 2}],
            [(i * 1000, [(1, 7, rng.integers(0, 256, 200,
                                             dtype=np.uint8).tobytes()),
                         (2, -7, b"aud")]) for i in range(3)],
            crc=True, duration_ticks=3000,
        )),
    ]
    random.seed(31)
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
            parse_mkv(bytes(b))
        except MkvFormatError:
            pass


def test_block_lacing_all_three_modes():
    """Xiph / fixed-size / EBML lacing (r11): hand-assembled size
    tables per the Matroska spec, last frame taking the remainder,
    payload_bytes counting frame bytes only."""
    from databatchprotectionservice_spark.core.mkvcodec import (
        _parse_block,
    )

    def block(flags, tail):
        return b"\x81" + b"\x00\x00" + bytes([flags]) + tail

    # Xiph: sizes 3 and 300 (255+45), last frame = remainder
    tail = bytes([2]) + b"\x03" + b"\xff\x2d" + (
        b"a" * 3 + b"b" * 300 + b"cc"
    )
    data = block(0x82, tail)
    track, rel_ts, nbytes, nframes = _parse_block(data, 0, len(data))
    assert (track, rel_ts, nframes) == (1, 0, 3)
    assert nbytes == 3 + 300 + 2
    # fixed-size: 3 frames over 12 bytes
    data = block(0x84, bytes([2]) + b"x" * 12)
    _, _, nbytes, nframes = _parse_block(data, 0, len(data))
    assert (nbytes, nframes) == (12, 3)
    with pytest.raises(MkvFormatError, match="divide"):
        bad = block(0x84, bytes([2]) + b"x" * 11)
        _parse_block(bad, 0, len(bad))
    # EBML: first size 500 (2-byte vint 0x41F4), then signed delta
    # -200 (raw = -200 + 2^13 - 1 = 7991 -> 0x5F37), frames 500/300/7
    tail = (
        bytes([2]) + b"\x41\xf4" + b"\x5f\x37"
        + b"a" * 500 + b"b" * 300 + b"c" * 7
    )
    data = block(0x86, tail)
    _, _, nbytes, nframes = _parse_block(data, 0, len(data))
    assert (nbytes, nframes) == (807, 3)
    # lace totals overrunning the payload raise
    tail = bytes([1]) + b"\xff\xff\x10" + b"z" * 8  # size 526 > 8
    data = block(0x82, tail)
    with pytest.raises(MkvFormatError, match="overrun"):
        _parse_block(data, 0, len(data))
