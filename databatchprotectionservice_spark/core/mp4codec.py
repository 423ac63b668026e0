"""Dependency-free ISO-BMFF (MP4/ISO 14496-12) container codec.

The container layer of the dominant video format, implemented from the
public ISO base-media spec: a size-validated box-tree walk (32-bit and
64-bit ``largesize`` boxes, nested containers, unknown boxes skipped),
full-box version/flags handling, and the sample-table machinery a
metadata pipeline actually reads — ``mvhd``/``mdhd`` timescales and
durations, ``tkhd`` dimensions, ``hdlr`` handler type, ``stsd`` codec
fourcc, ``stts`` run-length sample durations, ``stsz`` sample sizes,
``stsc`` sample-to-chunk runs, ``stco``/``co64`` chunk offsets.

What this is NOT: a video decoder.  Codec payloads (H.264/VP9/AV1
inside ``mdat``) are opaque — exactly the shape a 100 TB ingest
pipeline has, where container metadata (frame counts, durations,
dimensions, codec ids, byte budgets) is extracted at scan time and
actual decode happens in a downstream GPU stage.  The fixture encoder
builds REAL spec-compliant box trees around opaque payload bytes so
the parser is exercised end-to-end from streams it did not produce.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import DBPSInvalidInputError


class Mp4FormatError(DBPSInvalidInputError):
    """Raised for malformed or unsupported ISO-BMFF bytes."""


#: container boxes whose payload is a sequence of child boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"mvex", b"udta",
}

#: guard against absurd RLE expansion from corrupt sample tables
MAX_SAMPLES = 1 << 24


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) with full size
    validation; 64-bit largesize supported, size 0 (= to end) per
    spec."""
    pos = start
    n = len(data) if end is None else end
    while pos < n:
        if pos + 8 > n:
            raise Mp4FormatError("truncated box header")
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > n:
                raise Mp4FormatError("truncated largesize box")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
            if size < 16:
                raise Mp4FormatError("largesize smaller than its header")
        elif size == 0:  # to end of enclosing scope
            size = n - pos
        elif size < 8:
            raise Mp4FormatError(f"box size {size} smaller than header")
        if pos + size > n:
            raise Mp4FormatError(
                f"box {fourcc!r} overruns its container"
            )
        yield fourcc, body, pos + size
        pos += size


def _fullbox(data: bytes, start: int) -> tuple[int, int, int]:
    """(version, flags, payload_start_after_fullbox_header)."""
    if start + 4 > len(data):
        raise Mp4FormatError("truncated full box")
    version = data[start]
    flags = int.from_bytes(data[start + 1 : start + 4], "big")
    return version, flags, start + 4


@dataclass
class TrackInfo:
    track_id: int = 0
    width: int = 0
    height: int = 0
    handler: str = ""
    codec: str = ""
    timescale: int = 0
    duration: int = 0
    n_samples: int = 0
    total_sample_bytes: int = 0
    sample_durations_sum: int = 0
    stts_entries: int = 0
    n_chunks: int = 0


@dataclass
class Mp4Info:
    brand: str = ""
    movie_timescale: int = 0
    movie_duration: int = 0
    tracks: list[TrackInfo] = field(default_factory=list)
    mdat_bytes: int = 0


def _u(data: bytes, pos: int, width: int) -> int:
    if pos + width > len(data):
        raise Mp4FormatError("field overruns box")
    return int.from_bytes(data[pos : pos + width], "big")


def _parse_stbl(data: bytes, start: int, end: int, tr: TrackInfo) -> None:
    for cc, b, e in iter_boxes(data, start, end):
        if cc == b"stsd":
            _v, _f, p = _fullbox(data, b)
            if p + 4 > e:
                raise Mp4FormatError("stsd count overruns box")
            count = _u(data, p, 4)
            if count >= 1:
                # first sample entry: size(4) fourcc(4)
                if p + 12 > e:
                    raise Mp4FormatError("stsd entry overruns box")
                tr.codec = data[p + 8 : p + 12].decode("latin1")
        elif cc == b"stts":
            _v, _f, p = _fullbox(data, b)
            count = _u(data, p, 4)
            p += 4
            tr.stts_entries = count
            total_n = 0
            total_dur = 0
            for _ in range(count):
                # bound by the box END, not the file end: a malformed
                # entry count must raise instead of silently consuming
                # sibling boxes as duration runs
                if p + 8 > e:
                    raise Mp4FormatError("stts table overruns box")
                sample_count = _u(data, p, 4)
                delta = _u(data, p + 4, 4)
                p += 8
                total_n += sample_count
                if total_n > MAX_SAMPLES:
                    raise Mp4FormatError("stts sample count out of range")
                total_dur += sample_count * delta
            tr.sample_durations_sum = total_dur
        elif cc == b"stsz":
            _v, _f, p = _fullbox(data, b)
            uniform = _u(data, p, 4)
            count = _u(data, p + 4, 4)
            if count > MAX_SAMPLES:
                raise Mp4FormatError("stsz sample count out of range")
            tr.n_samples = count
            if uniform:
                tr.total_sample_bytes = uniform * count
            else:
                p += 8
                if p + 4 * count > e:
                    raise Mp4FormatError("stsz table truncated")
                # one C call: the bounds check above guarantees the
                # span, and a hostile count near MAX_SAMPLES would
                # otherwise spend seconds in a per-element Python loop
                tr.total_sample_bytes = int(
                    sum(struct.unpack_from(f">{count}I", data, p))
                )
        elif cc in (b"stco", b"co64"):
            _v, _f, p = _fullbox(data, b)
            if p + 4 > e:
                raise Mp4FormatError("stco count overruns box")
            tr.n_chunks = _u(data, p, 4)


def _parse_trak(data: bytes, start: int, end: int) -> TrackInfo:
    tr = TrackInfo()
    for cc, b, e in iter_boxes(data, start, end):
        if cc == b"tkhd":
            v, _f, p = _fullbox(data, b)
            # bound by the box END, not the file end (the stts rule):
            # v0 tkhd is 4+80 body bytes, v1 is 4+92; a shorter box
            # would read its own header (or a sibling) as dimensions
            if e - b < (96 if v else 84):
                raise Mp4FormatError("tkhd box too short")
            # v0: ctime(4) mtime(4) id(4) rsvd(4) dur(4); v1: 8/8/4/4/8
            tr.track_id = _u(data, p + (16 if v else 8), 4)
            # width/height are the LAST 8 bytes (16.16 fixed point)
            tr.width = _u(data, e - 8, 4) >> 16
            tr.height = _u(data, e - 4, 4) >> 16
        elif cc == b"mdia":
            for cc2, b2, e2 in iter_boxes(data, b, e):
                if cc2 == b"mdhd":
                    v, _f, p = _fullbox(data, b2)
                    if v == 1:
                        tr.timescale = _u(data, p + 16, 4)
                        tr.duration = _u(data, p + 20, 8)
                    else:
                        tr.timescale = _u(data, p + 8, 4)
                        tr.duration = _u(data, p + 12, 4)
                elif cc2 == b"hdlr":
                    _v, _f, p = _fullbox(data, b2)
                    tr.handler = data[p + 4 : p + 8].decode("latin1")
                elif cc2 == b"minf":
                    for cc3, b3, e3 in iter_boxes(data, b2, e2):
                        if cc3 == b"stbl":
                            _parse_stbl(data, b3, e3, tr)
    return tr


def parse_mp4(data: bytes) -> Mp4Info:
    """ISO-BMFF bytes -> container metadata (no codec decode)."""
    info = Mp4Info()
    saw_ftyp = False
    for cc, b, e in iter_boxes(data):
        if cc == b"ftyp":
            saw_ftyp = True
            info.brand = data[b : b + 4].decode("latin1")
        elif cc == b"moov":
            for cc2, b2, e2 in iter_boxes(data, b, e):
                if cc2 == b"mvhd":
                    v, _f, p = _fullbox(data, b2)
                    if v == 1:
                        info.movie_timescale = _u(data, p + 16, 4)
                        info.movie_duration = _u(data, p + 20, 8)
                    else:
                        info.movie_timescale = _u(data, p + 8, 4)
                        info.movie_duration = _u(data, p + 12, 4)
                elif cc2 == b"trak":
                    info.tracks.append(_parse_trak(data, b2, e2))
        elif cc == b"mdat":
            info.mdat_bytes += e - b
    if not saw_ftyp:
        raise Mp4FormatError("not ISO-BMFF (no ftyp box)")
    if not info.tracks:
        raise Mp4FormatError("no trak box")
    return info


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + payload)


def _rle(durations: list[int]) -> list[tuple[int, int]]:
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    return runs


def encode_mp4(
    sample_sizes: list[int],
    sample_durations: list[int],
    timescale: int = 1000,
    width: int = 64,
    height: int = 48,
    codec: bytes = b"opqe",
    handler: bytes = b"vide",
    payload: bytes | None = None,
) -> bytes:
    """Build a REAL single-track ISO-BMFF file: spec-compliant ftyp /
    moov (mvhd, trak>tkhd, mdia>mdhd+hdlr+minf>stbl with stsd, RLE
    stts, per-sample stsz, one-chunk stsc/stco) + mdat carrying the
    opaque payload.  The sample tables are arbitrary — which is the
    point: the parser must read what the tables SAY, not what an
    encoder habit would produce."""
    if len(sample_sizes) != len(sample_durations):
        raise Mp4FormatError("sizes and durations must align")
    n = len(sample_sizes)
    total = sum(sample_sizes)
    dur = sum(sample_durations)
    if payload is None:
        payload = bytes(total)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, struct.pack(">IIII", 0, 0, timescale, dur) + b"\x55\xc4\x00\x00"
    )
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00")
    stsd = _full(
        b"stsd",
        0,
        struct.pack(">I", 1)
        + _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70),
    )
    runs = _rle(sample_durations)
    stts = _full(
        b"stts",
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    stsz = _full(
        b"stsz",
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, max(n, 1), 1))
    stco = _full(b"stco", 0, struct.pack(">II", 1, 0))  # offset patched below
    stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    head = ftyp + moov
    mdat = _box(b"mdat", payload[: total] if total else b"")
    out = bytearray(head + mdat)
    # patch the single chunk offset to point at the mdat payload.
    # Position is ARITHMETIC, not find(): stco is the last child of
    # stbl, which closes minf/mdia/trak/moov with no trailers, so the
    # stco box is the final len(stco) bytes of head and its one offset
    # field is head's last u32 (a find() could match b"stco" inside an
    # unlucky codec/handler fourcc or the payload).
    tag_at = len(head) - len(stco) + 4
    if bytes(out[tag_at : tag_at + 4]) != b"stco":
        # a real raise, not an assert: under ``python -O`` a silent
        # mis-patch would corrupt the last u32 of whatever box moved
        # into the tail position
        raise Mp4FormatError("stco is no longer the final box of moov")
    struct.pack_into(">I", out, len(head) - 4, len(head) + 8)
    return bytes(out)
