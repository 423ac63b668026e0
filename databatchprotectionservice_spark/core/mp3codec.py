"""MPEG audio (MP3) frame-header walk — container metadata only.

Like ``mp4codec``, this closes the *container* half of a perceptual
format from public knowledge alone: the MPEG audio frame header
(ISO/IEC 11172-3 §2.4.1.3 and the 13818-3 / "MPEG 2.5" extensions),
the Xing/Info and VBRI variable-bitrate headers, and ID3v1/ID3v2 tag
structures (id3.org informal standards) are all fixed-layout integer
structs, so frame counts, exact sample totals, duration, bitrate
statistics, and embedded text tags are computable without decoding a
single Huffman spectral payload.  The payload bytes stay opaque —
that is the documented Pillow/ffmpeg-class seam (`operators/
multimodal.py`), exactly at the codec boundary.

Everything here is integer-exact (frame sizes come from the spec's
truncating-division formulas; duration is ``total_samples`` plus the
rate, never a float), so any derived statistic is oracle-checkable.

The encoder builds syntactically valid CBR/VBR frame sequences around
caller-supplied opaque payload bytes (plus optional ID3v2/ID3v1 tags
and a Xing block), which is how fixtures stay self-contained; the
walker validates sync, reserved-field, and cross-frame consistency on
every frame and raises ``Mp3FormatError`` on anything malformed.

Reference test coverage modeled on the container suites of the
reference repo (see SURVEY §2.2 media rows); wire vectors are pinned
byte-for-byte in ``tests/test_mp3codec.py``.
"""

from __future__ import annotations

import struct

from .audiocodec import AudioFormatError


class Mp3FormatError(AudioFormatError):
    """Raised for malformed or out-of-subset MPEG audio bytes."""


# bitrate tables, kbps, index 1..14 (0 = free format, 15 = bad)
_BITRATE = {
    # (version_group, layer): MPEG1 keys use group 1, MPEG2/2.5 group 2
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: sample rates by version string, index 0..2 (3 = reserved)
_RATES = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
          "2.5": (11025, 12000, 8000)}

_VERSION_BITS = {0b00: "2.5", 0b10: "2", 0b11: "1"}  # 0b01 reserved
_LAYER_BITS = {0b01: 3, 0b10: 2, 0b11: 1}  # 0b00 reserved


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576


def _frame_size(version: str, layer: int, bitrate_kbps: int, rate: int,
                padding: int) -> int:
    """Spec frame-length formulas (truncating integer division)."""
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // rate + padding) * 4
    if layer == 3 and version != "1":
        return 72 * bps // rate + padding
    return 144 * bps // rate + padding


def _side_info_len(version: str, channels: int) -> int:
    """Layer III side-info length — where a Xing block starts."""
    if version == "1":
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def _syncsafe(n: int) -> bytes:
    if n < 0 or n >= 1 << 28:
        raise Mp3FormatError(f"value {n} exceeds the syncsafe domain")
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise Mp3FormatError("syncsafe byte with MSB set in ID3v2 size")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


# ---------------------------------------------------------------------------
# ID3 tags
# ---------------------------------------------------------------------------

_TEXT_FRAMES = (b"TIT2", b"TPE1", b"TALB")
_TEXT_KEYS = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album"}


def encode_id3v2(tags: dict) -> bytes:
    """Minimal ID3v2.3 tag: TIT2/TPE1/TALB UTF-8-as-latin?  No —
    encoding byte 3 (UTF-8, valid in v2.4; widely read in practice)
    keeps text round-trips byte-exact.  Emits a v2.4 tag."""
    body = bytearray()
    for fid, key in _TEXT_KEYS.items():
        if key in tags:
            payload = b"\x03" + str(tags[key]).encode("utf-8")
            body += fid + _syncsafe(len(payload)) + b"\x00\x00" + payload
    return b"ID3" + bytes([4, 0, 0]) + _syncsafe(len(body)) + bytes(body)


def _parse_id3v2(data: bytes) -> tuple[dict, int]:
    """Returns (tags, total_tag_length).  Caller checked the magic."""
    if len(data) < 10:
        raise Mp3FormatError("truncated ID3v2 header")
    major, _rev, flags = data[3], data[4], data[5]
    if major not in (2, 3, 4):
        raise Mp3FormatError(f"unsupported ID3v2.{major} tag")
    size = _unsyncsafe(data[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)  # footer flag
    if total > len(data):
        raise Mp3FormatError("ID3v2 size overruns the file")
    tags: dict = {}
    if major == 2 or flags & 0x80:  # v2.2 ids / unsynchronised: skip body
        return tags, total
    pos = 10
    end = 10 + size
    if flags & 0x40:  # extended header: first u32 is its size
        if pos + 4 > end:
            raise Mp3FormatError("truncated ID3v2 extended header")
        # v2.4: syncsafe size INCLUDES the whole extended header;
        # v2.3: plain u32 EXCLUDING the 4-byte size field itself
        ext = (
            _unsyncsafe(data[pos : pos + 4])
            if major == 4
            else struct.unpack_from(">I", data, pos)[0] + 4
        )
        pos += ext
        if pos > end:
            raise Mp3FormatError("ID3v2 extended header overruns tag")
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw = data[pos + 4 : pos + 8]
        flen = _unsyncsafe(raw) if major == 4 else struct.unpack(">I", raw)[0]
        pos += 10
        if pos + flen > end:
            raise Mp3FormatError(f"ID3v2 frame {fid!r} overruns tag")
        if fid in _TEXT_FRAMES and flen >= 1:
            enc = data[pos]
            text = data[pos + 1 : pos + flen]
            if enc == 0:
                tags[_TEXT_KEYS[fid]] = text.decode("latin-1")
            elif enc == 3:
                try:
                    tags[_TEXT_KEYS[fid]] = text.decode("utf-8")
                except UnicodeDecodeError as e:
                    raise Mp3FormatError(f"bad UTF-8 in {fid!r}: {e}")
            # UTF-16 variants (1/2) stay unread — documented subset
        pos += flen
    return tags, total


def encode_id3v1(tags: dict) -> bytes:
    def f(key: str, n: int) -> bytes:
        return str(tags.get(key, "")).encode("latin-1", "replace")[:n].ljust(
            n, b"\x00"
        )

    return (
        b"TAG" + f("title", 30) + f("artist", 30) + f("album", 30)
        + f("year", 4) + f("comment", 30) + bytes([tags.get("genre", 255)])
    )


def _parse_id3v1(block: bytes) -> dict:
    def f(off: int, n: int) -> str:
        return block[off : off + n].split(b"\x00", 1)[0].decode(
            "latin-1"
        ).rstrip()

    return {
        "title": f(3, 30), "artist": f(33, 30), "album": f(63, 30),
        "year": f(93, 4), "genre": block[127],
    }


# ---------------------------------------------------------------------------
# encoder: syntactically valid frames around opaque payload
# ---------------------------------------------------------------------------


def encode_mp3(
    payload: bytes,
    *,
    version: str = "1",
    layer: int = 3,
    bitrate_kbps=128,
    rate: int = 44100,
    channels: int = 2,
    xing: bool = False,
    id3v2: dict | None = None,
    id3v1: dict | None = None,
) -> bytes:
    """Pack ``payload`` into valid MPEG audio frames (opaque bodies).

    ``bitrate_kbps`` may be a sequence, cycled per frame (a VBR
    stream); ``xing=True`` prepends a frame-0 Xing block carrying the
    exact frame and byte counts.  CRC protection is never emitted."""
    if version not in _RATES:
        raise Mp3FormatError(f"unknown MPEG version {version!r}")
    if layer not in (1, 2, 3):
        raise Mp3FormatError(f"unknown layer {layer}")
    if rate not in _RATES[version]:
        raise Mp3FormatError(
            f"rate {rate} invalid for MPEG {version} "
            f"(choose from {_RATES[version]})"
        )
    if channels not in (1, 2):
        raise Mp3FormatError("channels must be 1 or 2")
    group = 1 if version == "1" else 2
    table = _BITRATE[(group, layer)]
    rates_cycle = (
        list(bitrate_kbps)
        if isinstance(bitrate_kbps, (list, tuple))
        else [bitrate_kbps]
    )
    for kb in rates_cycle:
        if kb not in table:
            raise Mp3FormatError(
                f"bitrate {kb} kbps invalid for MPEG {version} layer "
                f"{layer}"
            )

    rate_idx = _RATES[version].index(rate)
    ver_bits = {v: k for k, v in _VERSION_BITS.items()}[version]
    layer_bits = {v: k for k, v in _LAYER_BITS.items()}[layer]
    mode_bits = 0b11 if channels == 1 else 0b00

    def header(kb: int) -> bytes:
        b0 = 0xFF
        b1 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1  # no CRC
        b2 = (table.index(kb) + 1) << 4 | rate_idx << 2  # padding 0
        b3 = mode_bits << 6  # no ext/copyright/original, emphasis none
        return bytes([b0, b1, b2, b3])

    frames = []
    pos = 0
    i = 0
    while True:
        kb = rates_cycle[i % len(rates_cycle)]
        size = _frame_size(version, layer, kb, rate, 0)
        if size <= 4:
            raise Mp3FormatError(
                f"frame size {size} too small at {kb} kbps / {rate} Hz"
            )
        body = payload[pos : pos + size - 4]
        pos += len(body)
        frames.append(header(kb) + body.ljust(size - 4, b"\x00"))
        i += 1
        if pos >= len(payload) and (frames or not payload):
            break
    if xing:
        kb = rates_cycle[0]
        size = _frame_size(version, layer, kb, rate, 0)
        side = _side_info_len(version, channels)
        block = b"Xing" + struct.pack(">I", 0x3)  # frames+bytes flags
        need = 4 + side + len(block) + 8
        if size < need:
            raise Mp3FormatError(
                f"first frame ({size} B) cannot hold a Xing block"
            )
        n_frames = len(frames) + 1
        n_bytes = size + sum(len(f) for f in frames)
        frame0 = (
            header(kb)
            + bytes(side)
            + block
            + struct.pack(">II", n_frames, n_bytes)
        )
        frames.insert(0, frame0 + bytes(size - len(frame0)))
    out = b"".join(frames)
    if id3v2 is not None:
        out = encode_id3v2(id3v2) + out
    if id3v1 is not None:
        out = out + encode_id3v1(id3v1)
    return out


# ---------------------------------------------------------------------------
# walker
# ---------------------------------------------------------------------------


def parse_mp3(data: bytes) -> dict:
    """Walk every frame; return exact integer stream statistics.

    Raises ``Mp3FormatError`` on bad sync, reserved fields,
    free-format bitrate (documented seam), cross-frame
    version/layer/rate inconsistency, overruns, or trailing bytes."""
    if len(data) < 4:
        raise Mp3FormatError("too short for an MPEG audio frame")
    tags_v2: dict = {}
    pos = 0
    if data[:3] == b"ID3":
        tags_v2, tag_len = _parse_id3v2(data)
        pos = tag_len
    end = len(data)
    tags_v1 = None
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        tags_v1 = _parse_id3v1(data[end - 128 : end])
        end -= 128

    frames_start = pos
    n_frames = 0
    first = None  # (version, layer, rate, channels)
    kbps_seen = []
    has_crc = False
    xing_info = None
    vbri_info = None
    while pos < end:
        if pos + 4 > end:
            raise Mp3FormatError(f"trailing bytes at offset {pos}")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise Mp3FormatError(f"lost frame sync at offset {pos}")
        ver_bits = (b1 >> 3) & 0x3
        layer_bits = (b1 >> 1) & 0x3
        if ver_bits not in _VERSION_BITS:
            raise Mp3FormatError("reserved MPEG version bits")
        if layer_bits not in _LAYER_BITS:
            raise Mp3FormatError("reserved layer bits")
        version = _VERSION_BITS[ver_bits]
        layer = _LAYER_BITS[layer_bits]
        crc = not (b1 & 0x1)
        has_crc = has_crc or crc
        br_idx = b2 >> 4
        if br_idx == 0:
            raise Mp3FormatError(
                "free-format bitrate is a documented seam (frame length "
                "not derivable from the header)"
            )
        if br_idx == 15:
            raise Mp3FormatError("bad bitrate index 15")
        rate_idx = (b2 >> 2) & 0x3
        if rate_idx == 3:
            raise Mp3FormatError("reserved sample-rate index")
        if (b3 & 0x3) == 2:
            raise Mp3FormatError("reserved emphasis value")
        rate = _RATES[version][rate_idx]
        group = 1 if version == "1" else 2
        kb = _BITRATE[(group, layer)][br_idx - 1]
        padding = (b2 >> 1) & 0x1
        channels = 1 if (b3 >> 6) == 0b11 else 2
        sig = (version, layer, rate, channels)
        if first is None:
            first = sig
        elif sig != first:
            raise Mp3FormatError(
                f"inconsistent stream: frame {n_frames} is {sig}, "
                f"stream started {first}"
            )
        size = _frame_size(version, layer, kb, rate, padding)
        if size <= 4:
            raise Mp3FormatError(f"degenerate frame size {size}")
        if pos + size > end:
            raise Mp3FormatError(
                f"frame {n_frames} ({size} B) overruns the stream"
            )
        if n_frames == 0 and layer == 3:
            off = pos + 4 + (2 if crc else 0) + _side_info_len(
                version, channels
            )
            magic = data[off : off + 4]
            if magic in (b"Xing", b"Info"):
                xing_info = _parse_xing(data, off, end)
            elif data[pos + 36 : pos + 40] == b"VBRI":
                vbri_info = _parse_vbri(data, pos + 36, end)
        kbps_seen.append(kb)
        n_frames += 1
        pos += size

    if n_frames == 0:
        raise Mp3FormatError("no MPEG audio frames")
    version, layer, rate, channels = first
    spf = _samples_per_frame(version, layer)
    total_samples = n_frames * spf
    return {
        "codec": "mp3",
        "mpeg_version": version,
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "samples_per_frame": spf,
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // rate,
        "stream_bytes": pos - frames_start,
        "bitrate_kbps_min": min(kbps_seen),
        "bitrate_kbps_max": max(kbps_seen),
        "is_vbr": len(set(kbps_seen)) > 1,
        "has_crc": has_crc,
        "xing": xing_info,
        "vbri": vbri_info,
        "id3v2": tags_v2 or None,
        "id3v1": tags_v1,
    }


def _parse_xing(data: bytes, off: int, end: int) -> dict:
    if off + 8 > end:
        raise Mp3FormatError("truncated Xing header")
    info = {"tag": data[off : off + 4].decode("ascii")}
    (flags,) = struct.unpack_from(">I", data, off + 4)
    p = off + 8
    for bit, key in ((1, "frames"), (2, "bytes")):
        if flags & bit:
            if p + 4 > end:
                raise Mp3FormatError(f"truncated Xing {key} field")
            (info[key],) = struct.unpack_from(">I", data, p)
            p += 4
    if flags & 4:
        if p + 100 > end:
            raise Mp3FormatError("truncated Xing TOC")
        info["toc"] = data[p : p + 100]
        p += 100
    if flags & 8:
        if p + 4 > end:
            raise Mp3FormatError("truncated Xing quality field")
        (info["quality"],) = struct.unpack_from(">I", data, p)
    return info


def _parse_vbri(data: bytes, off: int, end: int) -> dict:
    if off + 26 > end:
        raise Mp3FormatError("truncated VBRI header")
    ver, delay, quality, nbytes, nframes = struct.unpack_from(
        ">HHHII", data, off + 4
    )
    return {
        "version": ver, "delay": delay, "quality": quality,
        "bytes": nbytes, "frames": nframes,
    }
