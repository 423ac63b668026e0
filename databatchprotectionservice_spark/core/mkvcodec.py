"""EBML / Matroska / WebM container metadata walk.

The video-container twin of ``mp4codec``: RFC 8794 (EBML) plus the
public Matroska element registry are fixed-layout integer structures
— variable-length IDs and sizes, unsigned/UTF-8/float leaf elements,
and SimpleBlock framing — so track inventories (codec IDs, pixel
dimensions, audio rates/channels), cluster/block counts, per-track
payload byte totals, and exact timestamp extents are all computable
without touching a codec payload.  VP8/VP9/AV1/Opus/Vorbis payload
decode stays the documented Pillow/ffmpeg-class seam, exactly at the
codec boundary (`operators/multimodal.py`).

Integer discipline: every statistic returned is an integer.  The two
spec-level float elements (Duration, SamplingFrequency) are exposed
as integers when their IEEE value is integral (the overwhelmingly
common muxer output) and ``None`` otherwise — never a float, so any
derived column stays oracle-checkable bit-for-bit.

SUPPORTED SUBSET (out-of-subset input raises a named error):
one Segment, SimpleBlock/Block plain or LACED — Xiph, fixed-size
and EBML lacing all parse their size tables (since r11), with every
lace total bounds-checked against the block.  UNKNOWN-SIZE elements
(streaming-muxed output, r12) are accepted exactly where RFC 9559's
``unknownsizeallowed`` permits them: a Segment with the all-ones
size marker runs to end of file, an unknown-size Cluster terminates
at the first ID that is not a valid Cluster child (the spec's
termination rule); the marker anywhere else still raises.  Matroska CRC-32 elements (first child, IEEE/zlib polynomial
over the REST of the parent payload) are validated when present and
emitted by the fixture encoder.

Wire vectors hand-assembled in ``tests/test_mkvcodec.py`` pin the
vint edge cases (1/2/4/8-byte sizes, the all-ones reserved pattern)
and the SimpleBlock layout byte-for-byte.
"""

from __future__ import annotations

import struct
import zlib

from .errors import DBPSInvalidInputError


class MkvFormatError(DBPSInvalidInputError):
    """Raised for malformed or out-of-subset EBML/Matroska bytes."""


# element IDs (raw bytes, marker bits included — the registry form)
EBML = b"\x1a\x45\xdf\xa3"
SEGMENT = b"\x18\x53\x80\x67"
INFO = b"\x15\x49\xa9\x66"
TRACKS = b"\x16\x54\xae\x6b"
CLUSTER = b"\x1f\x43\xb6\x75"
_DOCTYPE = b"\x42\x82"
_DOCTYPE_VER = b"\x42\x87"
_EBML_MAX_ID = b"\x42\xf2"
_EBML_MAX_SIZE = b"\x42\xf3"
_TS_SCALE = b"\x2a\xd7\xb1"
_DURATION = b"\x44\x89"
_MUXING_APP = b"\x4d\x80"
_WRITING_APP = b"\x57\x41"
_TRACK_ENTRY = b"\xae"
_TRACK_NUMBER = b"\xd7"
_TRACK_UID = b"\x73\xc5"
_TRACK_TYPE = b"\x83"
_CODEC_ID = b"\x86"
_DEFAULT_DURATION = b"\x23\xe3\x83"
_VIDEO = b"\xe0"
_PIXEL_W = b"\xb0"
_PIXEL_H = b"\xba"
_AUDIO = b"\xe1"
_SAMPLING = b"\xb5"
_CHANNELS = b"\x9f"
_BIT_DEPTH = b"\x62\x64"
_TIMESTAMP = b"\xe7"
_SIMPLE_BLOCK = b"\xa3"
_BLOCK_GROUP = b"\xa0"
_BLOCK = b"\xa1"
_CRC32 = b"\xbf"
_VOID = b"\xec"

_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}


# ---------------------------------------------------------------------------
# vint primitives
# ---------------------------------------------------------------------------


def _read_id(data: bytes, pos: int, end: int) -> tuple[bytes, int]:
    if pos >= end:
        raise MkvFormatError("element ID past parent end")
    b0 = data[pos]
    if b0 == 0:
        raise MkvFormatError("EBML ID longer than 4 bytes (reserved)")
    length = 1
    mask = 0x80
    while not b0 & mask:
        mask >>= 1
        length += 1
    if length > 4:
        raise MkvFormatError("EBML ID longer than 4 bytes")
    if pos + length > end:
        raise MkvFormatError("truncated element ID")
    return data[pos : pos + length], pos + length


def _read_size(
    data: bytes, pos: int, end: int, allow_unknown: bool = False
) -> tuple[int | None, int]:
    """Definite size -> (value, next); all-ones (unknown size) ->
    (None, next) when the element permits it.  RFC 9559 allows
    unknown sizes ONLY on Segment and Cluster (unknownsizeallowed) —
    every other caller keeps the hard error."""
    if pos >= end:
        raise MkvFormatError("element size past parent end")
    b0 = data[pos]
    if b0 == 0:
        raise MkvFormatError("EBML size longer than 8 bytes")
    length = 1
    mask = 0x80
    while not b0 & mask:
        mask >>= 1
        length += 1
    if pos + length > end:
        raise MkvFormatError("truncated element size")
    value = b0 & (mask - 1)
    all_ones = value == mask - 1
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
        all_ones = all_ones and data[pos + i] == 0xFF
    if all_ones:
        if allow_unknown:
            return None, pos + length
        raise MkvFormatError(
            "unknown-size element only allowed on Segment/Cluster "
            "(RFC 9559 unknownsizeallowed)"
        )
    return value, pos + length


def _esize(n: int) -> bytes:
    """Shortest definite-size vint (avoids the all-ones pattern)."""
    if n < 0:
        raise MkvFormatError("negative size")
    for length in range(1, 9):
        limit = (1 << (7 * length)) - 1  # all-ones is reserved
        if n < limit:
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise MkvFormatError(f"size {n} exceeds the 8-byte vint domain")


def _uint_bytes(n: int) -> bytes:
    if n < 0:
        raise MkvFormatError("EBML unsigned element cannot be negative")
    return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _esize(len(payload)) + payload


def _u_elem(eid: bytes, n: int) -> bytes:
    return _elem(eid, _uint_bytes(n))


def _read_uint(data: bytes, pos: int, size: int) -> int:
    if size > 8:
        raise MkvFormatError(f"unsigned element of {size} bytes")
    return int.from_bytes(data[pos : pos + size], "big")


def _read_float_as_int(data: bytes, pos: int, size: int):
    """IEEE float element -> int when integral, else None."""
    if size == 0:
        return 0
    if size == 4:
        (v,) = struct.unpack(">f", data[pos : pos + 4])
    elif size == 8:
        (v,) = struct.unpack(">d", data[pos : pos + 8])
    else:
        raise MkvFormatError(f"float element of {size} bytes")
    return int(v) if float(v).is_integer() else None


def _iter_children(data: bytes, pos: int, end: int):
    """Yield (id_bytes, payload_start, payload_end) for each child."""
    while pos < end:
        eid, p = _read_id(data, pos, end)
        size, p = _read_size(data, p, end)
        if p + size > end:
            raise MkvFormatError(
                f"element {eid.hex()} overruns its parent"
            )
        yield eid, p, p + size
        pos = p + size


#: the elements a Cluster may directly contain (RFC 9559 §Cluster:
#: Timestamp, Position, PrevSize, SimpleBlock, BlockGroup) plus the
#: EBML globals (Void, CRC-32) — the boundary test for terminating an
#: UNKNOWN-SIZE Cluster: it ends at the first ID outside this set
_CLUSTER_CHILD_IDS = frozenset(
    [_TIMESTAMP, b"\xa7", b"\xab", _SIMPLE_BLOCK, _BLOCK_GROUP,
     _VOID, _CRC32]
)


def _unknown_cluster_end(data: bytes, pos: int, end: int) -> int:
    """End offset of an unknown-size Cluster whose payload starts at
    ``pos``: the start of the first element that is not a valid
    Cluster child (RFC 9559's termination rule), or ``end``.  The
    children themselves must carry definite sizes (nested unknown
    sizes are only allowed on Segment/Cluster, and a Cluster cannot
    contain another Cluster)."""
    p = pos
    while p < end:
        mark = p
        eid, q = _read_id(data, p, end)
        if eid not in _CLUSTER_CHILD_IDS:
            return mark
        size, q = _read_size(data, q, end)
        if q + size > end:
            raise MkvFormatError(
                f"cluster child {eid.hex()} overruns the file"
            )
        p = q + size
    return end


def _iter_segment_children(data: bytes, pos: int, end: int):
    """Segment-level child walk: like :func:`_iter_children` but a
    CLUSTER may carry the unknown-size marker, terminated by the
    next non-Cluster-child ID (streaming muxers emit exactly this
    shape — the size of a live cluster isn't known when its header
    is written)."""
    while pos < end:
        eid, p = _read_id(data, pos, end)
        size, p = _read_size(data, p, end, allow_unknown=eid == CLUSTER)
        if size is None:
            cend = _unknown_cluster_end(data, p, end)
            yield eid, p, cend
            pos = cend
            continue
        if p + size > end:
            raise MkvFormatError(
                f"element {eid.hex()} overruns its parent"
            )
        yield eid, p, p + size
        pos = p + size


def _check_crc(data: bytes, children: list) -> None:
    """Matroska CRC-32: when present it MUST be the first child and
    covers every following byte of the parent payload."""
    for i, (eid, s, e) in enumerate(children):
        if eid == _CRC32:
            if i != 0:
                raise MkvFormatError("CRC-32 element is not first child")
            if e - s != 4:
                raise MkvFormatError("CRC-32 element must be 4 bytes")
            stated = int.from_bytes(data[s:e], "little")
            actual = zlib.crc32(data[e : children[-1][2]]) & 0xFFFFFFFF
            if stated != actual:
                raise MkvFormatError(
                    f"CRC-32 mismatch: stated {stated:#010x}, "
                    f"computed {actual:#010x}"
                )


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def parse_mkv(data: bytes) -> dict:
    """Walk a Matroska/WebM file; return integer-exact metadata."""
    if len(data) < 5 or not data.startswith(EBML):
        raise MkvFormatError("not an EBML stream (missing magic)")
    pos = len(EBML)
    hsize, pos = _read_size(data, pos, len(data))
    if pos + hsize > len(data):
        raise MkvFormatError("EBML header overruns the file")
    doctype = "matroska"  # spec default
    doctype_ver = 1
    for eid, s, e in _iter_children(data, pos, pos + hsize):
        if eid == _DOCTYPE:
            try:
                doctype = data[s:e].rstrip(b"\x00").decode("ascii")
            except UnicodeDecodeError:
                raise MkvFormatError("non-ASCII DocType")
        elif eid == _DOCTYPE_VER:
            doctype_ver = _read_uint(data, s, e - s)
        elif eid == _EBML_MAX_ID:
            if _read_uint(data, s, e - s) > 4:
                raise MkvFormatError("EBMLMaxIDLength > 4 unsupported")
        elif eid == _EBML_MAX_SIZE:
            if _read_uint(data, s, e - s) > 8:
                raise MkvFormatError("EBMLMaxSizeLength > 8 unsupported")
    if doctype not in ("matroska", "webm"):
        raise MkvFormatError(
            f"DocType {doctype!r} is not a Matroska family document"
        )
    pos += hsize

    eid, p = _read_id(data, pos, len(data))
    if eid != SEGMENT:
        raise MkvFormatError(f"expected Segment, found {eid.hex()}")
    # a streaming-muxed Segment carries the unknown-size marker and
    # runs to end of file (RFC 9559: unknown-size element with no
    # parent to bound it ends at EOF)
    ssize, p = _read_size(data, p, len(data), allow_unknown=True)
    if ssize is not None and p + ssize != len(data):
        raise MkvFormatError(
            "Segment does not span the remainder of the file"
        )

    info = {
        "container": doctype,
        "doctype_version": doctype_ver,
        "timestamp_scale": 1000000,  # spec default, ns per tick
        "duration_ticks": None,
        "muxing_app": "",
        "writing_app": "",
        "tracks": [],
        "n_clusters": 0,
        "n_blocks": 0,
        "media_bytes": 0,
        "max_timestamp": None,
    }
    track_stats: dict[int, dict] = {}

    for eid, s, e in _iter_segment_children(data, p, len(data)):
        if eid == INFO:
            children = list(_iter_children(data, s, e))
            _check_crc(data, children)
            for cid, cs, ce in children:
                if cid == _TS_SCALE:
                    info["timestamp_scale"] = _read_uint(data, cs, ce - cs)
                elif cid == _DURATION:
                    info["duration_ticks"] = _read_float_as_int(
                        data, cs, ce - cs
                    )
                elif cid == _MUXING_APP:
                    info["muxing_app"] = data[cs:ce].decode(
                        "utf-8", "replace"
                    )
                elif cid == _WRITING_APP:
                    info["writing_app"] = data[cs:ce].decode(
                        "utf-8", "replace"
                    )
        elif eid == TRACKS:
            children = list(_iter_children(data, s, e))
            _check_crc(data, children)
            for cid, cs, ce in children:
                if cid == _TRACK_ENTRY:
                    info["tracks"].append(_parse_track(data, cs, ce))
        elif eid == CLUSTER:
            info["n_clusters"] += 1
            _parse_cluster(data, s, e, info, track_stats)
        # SeekHead / Cues / Tags / Chapters / Void / unknown: skipped

    by_number = {t["number"]: t for t in info["tracks"]}
    for num, stats in track_stats.items():
        if num not in by_number:
            raise MkvFormatError(
                f"block references track {num} with no TrackEntry"
            )
        by_number[num].update(stats)
    for t in info["tracks"]:
        t.setdefault("n_blocks", 0)
        t.setdefault("payload_bytes", 0)
    return info


def _parse_track(data: bytes, s: int, e: int) -> dict:
    t = {
        "number": None, "uid": None, "type": None, "codec_id": "",
        "width": None, "height": None, "sampling_hz": None,
        "channels": None, "bit_depth": None, "default_duration_ns": None,
    }
    for cid, cs, ce in _iter_children(data, s, e):
        if cid == _TRACK_NUMBER:
            t["number"] = _read_uint(data, cs, ce - cs)
        elif cid == _TRACK_UID:
            t["uid"] = _read_uint(data, cs, ce - cs)
        elif cid == _TRACK_TYPE:
            v = _read_uint(data, cs, ce - cs)
            t["type"] = _TRACK_TYPES.get(v, v)
        elif cid == _CODEC_ID:
            t["codec_id"] = data[cs:ce].rstrip(b"\x00").decode(
                "ascii", "replace"
            )
        elif cid == _DEFAULT_DURATION:
            t["default_duration_ns"] = _read_uint(data, cs, ce - cs)
        elif cid == _VIDEO:
            for vid, vs, ve in _iter_children(data, cs, ce):
                if vid == _PIXEL_W:
                    t["width"] = _read_uint(data, vs, ve - vs)
                elif vid == _PIXEL_H:
                    t["height"] = _read_uint(data, vs, ve - vs)
        elif cid == _AUDIO:
            for aid, as_, ae in _iter_children(data, cs, ce):
                if aid == _SAMPLING:
                    t["sampling_hz"] = _read_float_as_int(
                        data, as_, ae - as_
                    )
                elif aid == _CHANNELS:
                    t["channels"] = _read_uint(data, as_, ae - as_)
                elif aid == _BIT_DEPTH:
                    t["bit_depth"] = _read_uint(data, as_, ae - as_)
    if t["number"] is None:
        raise MkvFormatError("TrackEntry without TrackNumber")
    return t


def _lace_vint(data: bytes, pos: int, end: int) -> tuple[int, int, int]:
    """EBML-lacing size vint -> (raw value, new pos, vint length).
    Same wire shape as an element size but WITHOUT the all-ones
    reservation (lace sizes may legally be all ones)."""
    if pos >= end:
        raise MkvFormatError("lace size past block end")
    b0 = data[pos]
    if b0 == 0:
        raise MkvFormatError("lace size vint longer than 8 bytes")
    length = 1
    mask = 0x80
    while not b0 & mask:
        mask >>= 1
        length += 1
    if pos + length > end:
        raise MkvFormatError("truncated lace size vint")
    value = b0 & (mask - 1)
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
    return value, pos + length, length


def _lace_sizes(
    data: bytes, p: int, e: int, flags: int
) -> tuple[list, int]:
    """Matroska block lacing (spec §Block lacing) -> (frame sizes,
    payload start).  ``flags & 0x06``: 0x02 Xiph (255-run sizes like
    Ogg), 0x04 fixed (payload divides evenly), 0x06 EBML (first size
    an unsigned vint, the rest SIGNED vint deltas).  The last frame
    takes the remaining bytes; sizes overrunning the block raise."""
    lace = flags & 0x06
    if p >= e:
        raise MkvFormatError("laced block missing frame count")
    nframes = data[p] + 1
    q = p + 1
    sizes: list[int] = []
    if lace == 0x02:  # Xiph
        for _ in range(nframes - 1):
            sz = 0
            while True:
                if q >= e:
                    raise MkvFormatError("truncated Xiph lace sizes")
                b = data[q]
                q += 1
                sz += b
                if b < 255:
                    break
            sizes.append(sz)
    elif lace == 0x04:  # fixed-size
        rem = e - q
        if nframes == 0 or rem % nframes:
            raise MkvFormatError(
                f"fixed lacing: {rem} bytes do not divide into "
                f"{nframes} frames"
            )
        sizes = [rem // nframes] * (nframes - 1)
    else:  # EBML
        if nframes >= 2:
            first, q, _ = _lace_vint(data, q, e)
            sizes.append(first)
            prev = first
            for _ in range(nframes - 2):
                raw, q, ln = _lace_vint(data, q, e)
                # signed vint: raw - (2^(7*len-1) - 1)
                prev += raw - ((1 << (7 * ln - 1)) - 1)
                if prev < 0:
                    raise MkvFormatError("EBML lace delta went negative")
                sizes.append(prev)
    used = sum(sizes)
    rem = e - q
    if used > rem:
        raise MkvFormatError(
            f"lace sizes total {used} overrun the {rem}-byte payload"
        )
    sizes.append(rem - used)
    return sizes, q


def _parse_block(data: bytes, s: int, e: int) -> tuple[int, int, int, int]:
    """SimpleBlock/Block framing -> (track_number, rel_ts,
    payload_bytes, n_frames).  Laced blocks (Xiph/fixed/EBML) parse
    their size tables; ``payload_bytes`` counts frame bytes only
    (the lace header is framing, not media)."""
    b0 = data[s] if s < e else 0
    if s >= e or b0 == 0:
        raise MkvFormatError("block track number is not a 1-8 byte vint")
    length = 1
    mask = 0x80
    while not b0 & mask:
        mask >>= 1
        length += 1
    if s + length + 3 > e:
        raise MkvFormatError("truncated block header")
    track = b0 & (mask - 1)
    for i in range(1, length):
        track = (track << 8) | data[s + i]
    p = s + length
    (rel_ts,) = struct.unpack_from(">h", data, p)
    flags = data[p + 2]
    if flags & 0x06:
        sizes, start = _lace_sizes(data, p + 3, e, flags)
        return track, rel_ts, e - start, len(sizes)
    return track, rel_ts, e - (p + 3), 1


def _parse_cluster(
    data: bytes, s: int, e: int, info: dict, track_stats: dict
) -> None:
    children = list(_iter_children(data, s, e))
    _check_crc(data, children)
    cluster_ts = 0
    for cid, cs, ce in children:
        if cid == _TIMESTAMP:
            cluster_ts = _read_uint(data, cs, ce - cs)
    for cid, cs, ce in children:
        blocks = []
        if cid == _SIMPLE_BLOCK:
            blocks.append((cs, ce))
        elif cid == _BLOCK_GROUP:
            for gid, gs, ge in _iter_children(data, cs, ce):
                if gid == _BLOCK:
                    blocks.append((gs, ge))
        for bs, be in blocks:
            track, rel_ts, nbytes, _n_frames = _parse_block(data, bs, be)
            st = track_stats.setdefault(
                track, {"n_blocks": 0, "payload_bytes": 0}
            )
            st["n_blocks"] += 1
            st["payload_bytes"] += nbytes
            info["n_blocks"] += 1
            info["media_bytes"] += nbytes
            ts = cluster_ts + rel_ts
            if info["max_timestamp"] is None or ts > info["max_timestamp"]:
                info["max_timestamp"] = ts


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def encode_mkv(
    tracks: list[dict],
    clusters: list[tuple[int, list[tuple[int, int, bytes]]]],
    *,
    doctype: str = "webm",
    timestamp_scale: int = 1000000,
    duration_ticks: int | None = None,
    writing_app: str = "dbps-spark",
    crc: bool = False,
) -> bytes:
    """Build a REAL Matroska/WebM file around opaque codec payloads.

    ``tracks``: dicts with number/type/codec_id and optional
    width/height (video) or sampling_hz/channels (audio).
    ``clusters``: (cluster_timestamp, [(track_number, rel_ts,
    payload), ...]).  ``crc=True`` prepends a valid CRC-32 element to
    Info — the parser verifies it."""
    if doctype not in ("matroska", "webm"):
        raise MkvFormatError(f"refusing to write DocType {doctype!r}")
    header = _elem(
        EBML,
        _u_elem(b"\x42\x86", 1)  # EBMLVersion
        + _u_elem(b"\x42\xf7", 1)  # EBMLReadVersion
        + _u_elem(_EBML_MAX_ID, 4)
        + _u_elem(_EBML_MAX_SIZE, 8)
        + _elem(_DOCTYPE, doctype.encode("ascii"))
        + _u_elem(_DOCTYPE_VER, 4)
        + _u_elem(b"\x42\x85", 2),  # DocTypeReadVersion
    )
    info_body = (
        _elem(_TS_SCALE, _uint_bytes(timestamp_scale))
        + _elem(_MUXING_APP, b"dbps-spark-mkv")
        + _elem(_WRITING_APP, writing_app.encode("utf-8"))
    )
    if duration_ticks is not None:
        info_body += _elem(
            _DURATION, struct.pack(">d", float(duration_ticks))
        )
    if crc:
        info_body = (
            _elem(_CRC32, zlib.crc32(info_body).to_bytes(4, "little"))
            + info_body
        )
    info = _elem(INFO, info_body)

    entries = b""
    for t in tracks:
        body = (
            _u_elem(_TRACK_NUMBER, t["number"])
            + _u_elem(_TRACK_UID, t.get("uid", t["number"]))
            + _u_elem(
                _TRACK_TYPE,
                {v: k for k, v in _TRACK_TYPES.items()}.get(
                    t.get("type", "video"), 1
                ),
            )
            + _elem(_CODEC_ID, t.get("codec_id", "V_VP8").encode("ascii"))
        )
        if t.get("width") is not None:
            body += _elem(
                _VIDEO,
                _u_elem(_PIXEL_W, t["width"])
                + _u_elem(_PIXEL_H, t["height"]),
            )
        if t.get("sampling_hz") is not None:
            body += _elem(
                _AUDIO,
                _elem(_SAMPLING, struct.pack(">d", float(t["sampling_hz"])))
                + _u_elem(_CHANNELS, t.get("channels", 1)),
            )
        if t.get("default_duration_ns") is not None:
            body += _u_elem(_DEFAULT_DURATION, t["default_duration_ns"])
        entries += _elem(_TRACK_ENTRY, body)
    tracks_el = _elem(TRACKS, entries)

    cluster_els = b""
    for cluster_ts, blocks in clusters:
        body = _elem(_TIMESTAMP, _uint_bytes(cluster_ts))
        for track_no, rel_ts, payload in blocks:
            if not 1 <= track_no < 0x80:
                raise MkvFormatError(
                    "encoder writes 1-byte track vints (1..127)"
                )
            blk = (
                bytes([0x80 | track_no])
                + struct.pack(">h", rel_ts)
                + b"\x80"  # keyframe, no lacing
                + payload
            )
            body += _elem(_SIMPLE_BLOCK, blk)
        cluster_els += _elem(CLUSTER, body)

    segment = _elem(SEGMENT, info + tracks_el + cluster_els)
    return header + segment
