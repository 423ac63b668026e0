"""ISO-BMFF container codec tests: roundtrips plus HAND-ASSEMBLED box
streams (spec-derived byte layouts in comments) the encoder never
produced — 64-bit largesize boxes, version-1 full boxes, uniform-size
stsz — and the mutation battery."""

import struct

import numpy as np
import pytest

from databatchprotectionservice_spark.core.mp4codec import (
    Mp4FormatError,
    encode_mp4,
    iter_boxes,
    parse_mp4,
)


def test_roundtrip_sample_tables():
    sizes = [5, 1, 256, 7, 7, 7]
    durs = [100, 100, 120, 120, 120, 90]
    info = parse_mp4(encode_mp4(sizes, durs, timescale=1000, width=320, height=240))
    t = info.tracks[0]
    assert (info.brand, info.movie_timescale) == ("isom", 1000)
    assert (t.width, t.height, t.handler, t.codec) == (320, 240, "vide", "opqe")
    assert t.n_samples == 6
    assert t.total_sample_bytes == sum(sizes)
    assert t.sample_durations_sum == sum(durs) == t.duration
    assert t.stts_entries == 3  # RLE runs: 2x100, 3x120, 1x90
    assert info.mdat_bytes == sum(sizes)


def test_empty_track_is_valid():
    info = parse_mp4(encode_mp4([], []))
    t = info.tracks[0]
    assert t.n_samples == 0 and t.stts_entries == 0
    assert t.sample_durations_sum == 0 and info.mdat_bytes == 0


def _full(fourcc, version, payload):
    body = bytes([version, 0, 0, 0]) + payload
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _box(fourcc, payload):
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def test_hand_assembled_largesize_and_v1_boxes():
    """A stream the encoder never emits: the mdat uses a 64-bit
    largesize header (size field = 1, 8-byte size after the fourcc),
    mvhd/mdhd/tkhd are VERSION 1 (64-bit times), stsz uses the
    uniform-size shortcut (sample_size != 0, no table)."""
    mvhd = _full(
        b"mvhd", 1,
        struct.pack(">QQIQ", 0, 0, 90000, 5400)  # 64-bit times, ts, dur
        + b"\x00" * 80,
    )
    tkhd = _full(
        b"tkhd", 1,
        struct.pack(">QQIIQ", 0, 0, 7, 0, 5400)
        + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
        + struct.pack(">II", 1280 << 16, 720 << 16),
    )
    mdhd = _full(
        b"mdhd", 1,
        struct.pack(">QQIQ", 0, 0, 90000, 5400) + b"\x00" * 4,
    )
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"soun" + b"\x00" * 13)
    stsd = _full(
        b"stsd", 0,
        struct.pack(">I", 1) + _box(b"mp4a", b"\x00" * 8),
    )
    stts = _full(b"stts", 0, struct.pack(">III", 1, 9, 600))
    stsz = _full(b"stsz", 0, struct.pack(">II", 128, 9))  # uniform 128
    stco = _full(b"stco", 0, struct.pack(">II", 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    payload = b"\xab" * 32
    mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload))
        + payload
    )
    info = parse_mp4(ftyp + moov + mdat)
    t = info.tracks[0]
    assert info.brand == "mp42"
    assert (info.movie_timescale, info.movie_duration) == (90000, 5400)
    assert (t.track_id, t.width, t.height) == (7, 1280, 720)
    assert (t.handler, t.codec) == ("soun", "mp4a")
    assert (t.timescale, t.duration) == (90000, 5400)
    assert t.n_samples == 9 and t.total_sample_bytes == 9 * 128
    assert t.sample_durations_sum == 9 * 600 and t.stts_entries == 1
    assert info.mdat_bytes == len(payload)


def test_box_walk_rejects_overruns():
    data = encode_mp4([3], [100])
    # inflate the moov size field so it overruns the file
    i = data.find(b"moov") - 4
    bad = bytearray(data)
    struct.pack_into(">I", bad, i, len(data) * 2)
    with pytest.raises(Mp4FormatError, match="overruns"):
        parse_mp4(bytes(bad))
    with pytest.raises(Mp4FormatError, match="ftyp"):
        parse_mp4(_box(b"free", b""))
    with pytest.raises(Mp4FormatError):
        list(iter_boxes(b"\x00\x00\x00\x04xxxx"))  # size < header


def test_stts_expansion_guard():
    """A corrupt stts claiming 2^31 samples must raise, not loop."""
    data = bytearray(encode_mp4([1, 2], [100, 100]))
    p = data.find(b"stts") + 4 + 4  # fourcc + fullbox
    struct.pack_into(">I", data, p, 1)  # one run
    struct.pack_into(">I", data, p + 4, 1 << 31)  # absurd count
    with pytest.raises(Mp4FormatError, match="range"):
        parse_mp4(bytes(data))


def test_stts_entry_count_bounded_by_box_end():
    """A malformed stts entry COUNT that would read past the box end
    must raise instead of silently consuming sibling boxes (stsz/stco
    bytes) as duration runs (ADVICE r8).  The claimed count here is
    small enough to stay inside the FILE, so only a box-end bound
    catches it."""
    data = bytearray(encode_mp4([1, 2], [100, 100]))
    p = data.find(b"stts") + 4 + 4  # fourcc + fullbox
    # the real table has 1 run (both durations equal); claim 4 runs --
    # 24 extra bytes that overrun stts but not the file
    struct.pack_into(">I", data, p, 4)
    with pytest.raises(Mp4FormatError, match="overruns box"):
        parse_mp4(bytes(data))


def test_encoded_stco_offset_points_at_mdat_payload():
    """The stco patch position is computed arithmetically; fourccs that
    CONTAIN the bytes 'stco' (a legal, if unlucky, codec name) must not
    derail it the way a find()-based patch could."""
    payload = b"stco-lookalike-payload"
    data = encode_mp4(
        [len(payload)], [10], codec=b"stco", payload=payload
    )
    info = parse_mp4(data)
    assert info.tracks[0].codec == "stco"
    off = data.find(b"mdat") + 4
    assert data[off : off + len(payload)] == payload
    # the one chunk offset equals the mdat payload position
    stbl_stco = data.rfind(b"stco", 0, data.find(b"mdat"))
    claimed = struct.unpack_from(">I", data, stbl_stco + 12)[0]
    assert claimed == off


def test_parser_never_crashes_on_mutations():
    rng = np.random.RandomState(41)
    base = bytearray(
        encode_mp4(list(range(1, 40)), [100 + i % 7 for i in range(39)])
    )
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            parse_mp4(bytes(data))
        except Mp4FormatError:
            pass
        except (ValueError, IndexError, struct.error, OverflowError) as exc:
            raise AssertionError(
                f"trial {trial}: non-domain exception "
                f"{type(exc).__name__}: {exc}"
            ) from exc


def test_parser_never_crashes_on_truncations():
    base = encode_mp4([4, 4, 4], [100, 200, 200])
    for cut in range(0, len(base), 3):
        try:
            parse_mp4(base[:cut])
        except Mp4FormatError:
            pass
