"""Ogg container codec: page layer + Opus/Vorbis identification headers.

The Ogg transport (RFC 3533, fully public) is the streaming twin of the
ISO-BMFF work in ``mp4codec.py``: the CONTAINER is decoded for real —
capture-pattern pages, segment-table lacing, packet reassembly across
page boundaries (continuation flag), granule positions, BOS/EOS flags,
and the spec's CRC-32 (polynomial 0x04C11DB7, zero init, zero final
XOR, no bit reflection — deliberately NOT the zlib CRC) — while the
perceptual codec PAYLOADS stay opaque, exactly like MP4's sample data.
The two mapping specs whose identification headers are plain integer
structs are parsed for real too:

* OpusHead (RFC 7845 §5.1): magic, version, channel count, pre-skip,
  input sample rate, output gain, mapping family;
* Vorbis identification header (Vorbis I spec §4.2.2): packet type 1 +
  "vorbis", version 0, channels, rate, the three bitrate fields, and
  the two blocksize exponents.

The encoder exists for fixture construction (like ``encode_mp4`` /
``encode_wav``) and is round-trip tested; it is not a Spark sink.

Provenance: written from the public RFC 3533 / RFC 7845 / Vorbis I
documents; wire vectors in ``tests/test_oggcodec.py`` are hand-
assembled and the CRC is cross-checked against an independent
bit-by-bit model there.
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import DBPSInvalidInputError


class OggFormatError(DBPSInvalidInputError):
    """Raised for malformed or unsupported Ogg bytes."""


# ---------------------------------------------------------------------------
# CRC-32/OGG — poly 0x04C11DB7, init 0, xorout 0, MSB-first (RFC 3533)
# ---------------------------------------------------------------------------


def _make_crc_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TABLE = _make_crc_table()


def crc32_ogg(data: bytes) -> int:
    """RFC 3533 page CRC: forward (unreflected) CRC-32, zero init and
    zero final XOR — table-driven, one python loop over bytes (pages
    are <= 65307 bytes, so this is never a hot path)."""
    crc = 0
    tab = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tab[((crc >> 24) ^ b) & 0xFF])
    return crc


# ---------------------------------------------------------------------------
# page layer
# ---------------------------------------------------------------------------

_HDR = struct.Struct("<4sBBqIIIB")  # through page_segments
_MAX_SEGS = 255

#: header-type flags (RFC 3533 §6)
FLAG_CONTINUED = 0x01
FLAG_BOS = 0x02
FLAG_EOS = 0x04


def _iter_pages(data: bytes):
    """Yield validated page dicts.  Raises OggFormatError on corrupt
    capture pattern, version, CRC, or truncation."""
    pos, n = 0, len(data)
    while pos < n:
        if n - pos < 27:
            raise OggFormatError("truncated page header")
        (capture, version, htype, granule, serial, seq, crc, nsegs) = (
            _HDR.unpack_from(data, pos)
        )
        if capture != b"OggS":
            raise OggFormatError(
                f"bad capture pattern at offset {pos}: {capture!r}"
            )
        if version != 0:
            raise OggFormatError(f"unsupported Ogg version {version}")
        seg_end = pos + 27 + nsegs
        if seg_end > n:
            raise OggFormatError("truncated segment table")
        lacing = data[pos + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > n:
            raise OggFormatError("truncated page body")
        # CRC is computed over the whole page with the CRC field zeroed
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        actual = crc32_ogg(bytes(page))
        if actual != crc:
            raise OggFormatError(
                f"page CRC mismatch at offset {pos}: "
                f"stored {crc:#010x}, computed {actual:#010x}"
            )
        yield {
            "offset": pos,
            "htype": htype,
            "granule": granule,
            "serial": serial,
            "seq": seq,
            "lacing": lacing,
            "body": data[seg_end:page_end],
        }
        pos = page_end


def decode_ogg(data: bytes) -> dict:
    """Ogg bytes -> {serial, n_pages, packets, granules, flags}.

    Single-logical-stream decoder (the fixture corpus shape; grouped/
    chained streams raise a named error rather than mis-merging).
    Packets are reassembled across pages via the lacing rule: a 255
    lacing value means "continues", a terminal <255 value ends the
    packet; a packet still open at a page boundary requires the next
    page's CONTINUED flag.  ``granules`` records the granule position
    of the page each packet ENDS on (the spec's packet-completion
    granule)."""
    if not data:
        raise OggFormatError("empty Ogg stream")
    packets: list[bytes] = []
    granules: list[int] = []
    serial = None
    n_pages = 0
    expect_seq = None
    open_packet = bytearray()
    open_from_prev_page = False
    saw_bos = saw_eos = False
    for page in _iter_pages(data):
        n_pages += 1
        if serial is None:
            serial = page["serial"]
            if not page["htype"] & FLAG_BOS:
                raise OggFormatError("first page lacks the BOS flag")
            saw_bos = True
        elif page["serial"] != serial:
            raise OggFormatError(
                "grouped/chained Ogg (multiple serials) is unsupported: "
                f"{serial} then {page['serial']}"
            )
        if expect_seq is not None and page["seq"] != expect_seq:
            raise OggFormatError(
                f"page sequence gap: expected {expect_seq}, "
                f"got {page['seq']}"
            )
        expect_seq = page["seq"] + 1
        continued = bool(page["htype"] & FLAG_CONTINUED)
        if continued != open_from_prev_page:
            raise OggFormatError(
                "continuation flag disagrees with packet state "
                f"(page seq {page['seq']})"
            )
        if page["htype"] & FLAG_EOS:
            saw_eos = True
        body, off = page["body"], 0
        for lace in page["lacing"]:
            open_packet += body[off : off + lace]
            off += lace
            if lace < 255:
                packets.append(bytes(open_packet))
                granules.append(page["granule"])
                open_packet = bytearray()
        open_from_prev_page = bool(open_packet) or (
            # a packet ending EXACTLY in a 255 lace stays open with
            # zero buffered bytes; track that via the last lace value
            len(page["lacing"]) > 0 and page["lacing"][-1] == 255
        )
    if open_from_prev_page:
        raise OggFormatError("stream ends mid-packet (no terminal lace)")
    if not saw_eos:
        raise OggFormatError("stream lacks an EOS page")
    return {
        "serial": serial,
        "n_pages": n_pages,
        "packets": packets,
        "granules": granules,
        "bos": saw_bos,
        "eos": saw_eos,
    }


def encode_ogg(
    packets: list[bytes],
    serial: int = 0x1234,
    granules: list[int] | None = None,
) -> bytes:
    """Fixture encoder: one logical stream, packets laced per RFC 3533
    (255-spans + terminal lace, zero-length terminal for exact-255
    multiples), spilling to CONTINUED pages past 255 segments.  Each
    packet's final page carries its granule (default: packet index)."""
    if not packets:
        raise OggFormatError("encode_ogg needs at least one packet")
    if granules is None:
        granules = list(range(len(packets)))
    if len(granules) != len(packets):
        raise OggFormatError("granules must match packets 1:1")
    # flatten to (lace, chunk, ends_packet_index|None) segments
    segs: list[tuple[int, bytes, int | None]] = []
    for pi, pkt in enumerate(packets):
        off = 0
        while len(pkt) - off >= 255:
            segs.append((255, pkt[off : off + 255], None))
            off += 255
        segs.append((len(pkt) - off, pkt[off:], pi))
    pages: list[bytes] = []
    i, seq = 0, 0
    continued = False
    while i < len(segs):
        chunk = segs[i : i + _MAX_SEGS]
        i += len(chunk)
        last_page = i >= len(segs)
        # granule: the LAST packet completed on this page; -1 if none
        # (a continuation-only page, RFC 3533 §6)
        done = [p for _, _, p in chunk if p is not None]
        granule = granules[done[-1]] if done else -1
        htype = (
            (FLAG_CONTINUED if continued else 0)
            | (FLAG_BOS if seq == 0 else 0)
            | (FLAG_EOS if last_page else 0)
        )
        lacing = bytes(lace for lace, _, _ in chunk)
        body = b"".join(c for _, c, _ in chunk)
        hdr = _HDR.pack(
            b"OggS", 0, htype, granule, serial, seq, 0, len(lacing)
        )
        page = bytearray(hdr + lacing + body)
        crc = crc32_ogg(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        pages.append(bytes(page))
        seq += 1
        continued = chunk[-1][0] == 255  # last lace 255 -> packet open
    return b"".join(pages)


# ---------------------------------------------------------------------------
# identification headers: OpusHead (RFC 7845) and Vorbis I
# ---------------------------------------------------------------------------


def parse_opus_head(packet: bytes) -> dict:
    """OpusHead packet -> field dict (RFC 7845 §5.1, all integers)."""
    if len(packet) < 19 or packet[:8] != b"OpusHead":
        raise OggFormatError("not an OpusHead packet")
    version = packet[8]
    if version >> 4 != 0:  # §5.1: compatible while major nibble is 0
        raise OggFormatError(f"unsupported OpusHead version {version}")
    channels = packet[9]
    if channels == 0:
        raise OggFormatError("OpusHead channel count 0")
    pre_skip, input_rate = struct.unpack_from("<HI", packet, 10)
    (gain_q8,) = struct.unpack_from("<h", packet, 16)
    family = packet[18]
    if family != 0 and len(packet) < 21 + channels:
        raise OggFormatError("truncated OpusHead channel mapping table")
    return {
        "codec": "opus",
        "version": version,
        "channels": channels,
        "pre_skip": pre_skip,
        "input_rate": input_rate,
        "output_gain_q8": gain_q8,
        "mapping_family": family,
    }


def parse_vorbis_id(packet: bytes) -> dict:
    """Vorbis identification header -> field dict (Vorbis I §4.2.2)."""
    if len(packet) < 30 or packet[0] != 1 or packet[1:7] != b"vorbis":
        raise OggFormatError("not a Vorbis identification header")
    (version, channels, rate, br_max, br_nom, br_min) = struct.unpack_from(
        "<IBIiii", packet, 7
    )
    if version != 0:
        raise OggFormatError(f"unsupported Vorbis version {version}")
    if channels == 0 or rate == 0:
        raise OggFormatError("Vorbis channels and rate must be nonzero")
    bs = packet[28]
    bs0, bs1 = bs & 0x0F, bs >> 4
    if not (6 <= bs0 <= 13 and bs0 <= bs1 <= 13):
        raise OggFormatError(f"invalid Vorbis blocksize exponents {bs:#x}")
    if not packet[29] & 1:
        raise OggFormatError("Vorbis id header framing bit unset")
    return {
        "codec": "vorbis",
        "version": version,
        "channels": channels,
        "rate": rate,
        "bitrate_max": br_max,
        "bitrate_nominal": br_nom,
        "bitrate_min": br_min,
        "blocksize0": 1 << bs0,
        "blocksize1": 1 << bs1,
    }


def ogg_stream_info(data: bytes) -> dict:
    """One-call summary for the multimodal metadata leg: container
    stats + the parsed identification header of the first packet.
    Unknown first packets yield codec "unknown" (the payload-opaque
    contract, like MP4's codec fourccs) rather than an error."""
    dec = decode_ogg(data)
    first = dec["packets"][0] if dec["packets"] else b""
    if first[:8] == b"OpusHead":
        head: dict = parse_opus_head(first)
    elif len(first) >= 7 and first[0] == 1 and first[1:7] == b"vorbis":
        head = parse_vorbis_id(first)
    else:
        head = {"codec": "unknown"}
    return {
        "serial": dec["serial"],
        "n_pages": dec["n_pages"],
        "n_packets": len(dec["packets"]),
        "payload_bytes": sum(len(p) for p in dec["packets"]),
        "last_granule": dec["granules"][-1] if dec["granules"] else -1,
        **head,
    }
