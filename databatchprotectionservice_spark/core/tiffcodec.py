"""Dependency-free baseline TIFF codec (TIFF 6.0).

Extends the real image path (PPM/BMP/PNG/JPEG/GIF) with the other
format ubiquitous in scanned/archival corpora.  Everything implements
the PUBLIC TIFF 6.0 specification with stdlib + numpy:

* **Decoder** — both byte orders (``II`` little / ``MM`` big endian),
  first-IFD walk with short/long tag values (inline or offset), strip
  organization (any RowsPerStrip), 8-bit samples, chunky planar
  config; photometric 0 (white-is-zero gray, inverted), 1 (gray) and
  2 (RGB); compression 1 (none), 32773 (PackBits) and 5 (TIFF-LZW —
  MSB-first variable-width codes with the spec's EARLY-CHANGE rule:
  the code width bumps one code before the table fills, which is the
  exact opposite corner case from GIF's LSB-first late change;
  ClearCode 256 / EOI 257, table rebuilt on Clear, KwKwK handled);
  Predictor 2 (horizontal differencing, undone per row per sample
  plane after decompression).  Grayscale replicates to RGB to keep
  the uniform ``(w, h, (h, w, 3) uint8)`` contract of
  ``core/imagecodec.py``.
* **Encoder** — fixture/test construction: RGB or grayscale, chosen
  compression (none / PackBits / LZW), optional predictor, chosen
  byte order, strip size — so the decoder is exercised from streams a
  different code path produced, plus hand-assembled vectors in tests.

Out of scope (raise ``TiffFormatError`` with a precise message): tiled
images, planar configuration 2, bit depths other than 8, palette
color, JPEG-in-TIFF, BigTIFF.
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import DBPSInvalidInputError


class TiffFormatError(DBPSInvalidInputError):
    """Raised for malformed or unsupported TIFF bytes."""


#: allocation guard (shared rationale with the JPEG/GIF caps)
DECODE_MAX_PIXELS = 1 << 26

# tag ids (TIFF 6.0 section 8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    """Parse the first IFD into tag -> list of integer values."""
    if len(data) < 8:
        raise TiffFormatError("truncated TIFF header")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise TiffFormatError("IFD offset out of range")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(data):
            raise TiffFormatError("truncated IFD entry")
        tag, typ, count = struct.unpack(bo + "HHI", data[pos : pos + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            pos += 12
            continue  # unknown field type: spec says skip
        total = size * count
        if total <= 4:
            raw = data[pos + 8 : pos + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", data[pos + 8 : pos + 12])
            raw = data[off : off + total]
            if len(raw) != total:
                raise TiffFormatError(f"tag {tag}: value offset out of range")
        if typ == 3:  # SHORT
            vals = list(struct.unpack(bo + "H" * count, raw))
        elif typ == 4:  # LONG
            vals = list(struct.unpack(bo + "I" * count, raw))
        elif typ == 1:  # BYTE
            vals = list(raw)
        else:  # other types irrelevant to the baseline tags
            vals = []
        tags[tag] = vals
        pos += 12
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 section 9): [-127..-1] n -> repeat next byte
    1-n times; [0..127] n -> copy n+1 literal bytes; -128 is a noop."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        b = src[i]
        i += 1
        if b == 128:
            continue
        if b < 128:
            out += src[i : i + b + 1]
            if i + b + 1 > n:
                raise TiffFormatError("PackBits literal run truncated")
            i += b + 1
        else:
            if i >= n:
                raise TiffFormatError("PackBits repeat run truncated")
            out += bytes([src[i]]) * (257 - b)
            i += 1
    if len(out) < expected:
        raise TiffFormatError("PackBits output short of strip size")
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-LZW (section 13): MSB-first bit packing, 9-bit start,
    Clear=256, EOI=257, EARLY CHANGE — width increments when the next
    table index would be 511/1023/2047 (one code earlier than the
    late-change GIF rule)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            # drop the consumed high bits: without this mask acc grows
            # into one strip-sized Python int and every shift above
            # turns O(strip) — quadratic decode overall
            acc &= (1 << nbits) - 1
            if code == 256:  # Clear
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                if len(out) < expected:
                    raise TiffFormatError("LZW ended short of strip size")
                return bytes(out[:expected])
            if prev is None:
                if code > 255:
                    raise TiffFormatError("LZW first code not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffFormatError("LZW code beyond table")
            out += entry
            prev = entry
            # early change: bump width when the NEXT entry would need it
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    raise TiffFormatError("LZW stream ended without EOI")


def decode_tiff(data: bytes) -> tuple[int, int, np.ndarray]:
    """TIFF bytes -> (width, height, (h, w, 3) uint8 RGB)."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise TiffFormatError("not a TIFF (bad byte-order/magic)")
    tags = _read_ifd(data, bo)

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if not vals:
            if default is None:
                raise TiffFormatError(f"missing required tag {tag}")
            return default
        return vals[0]

    w = one(_T_WIDTH)
    h = one(_T_LENGTH)
    if w == 0 or h == 0 or w * h > DECODE_MAX_PIXELS:
        raise TiffFormatError(f"TIFF dimensions {w}x{h} out of range")
    spp = one(_T_SAMPLES, 1)
    photometric = one(_T_PHOTOMETRIC)
    if photometric in (0, 1):
        if spp != 1:
            raise TiffFormatError("grayscale TIFF must have 1 sample/px")
    elif photometric == 2:
        if spp != 3:
            raise TiffFormatError("RGB TIFF must have 3 samples/px")
    else:
        raise TiffFormatError(
            f"photometric {photometric} unsupported (gray/RGB only; "
            "palette and YCbCr need an external codec)"
        )
    bits = tags.get(_T_BITS, [8])
    if any(b != 8 for b in bits):
        raise TiffFormatError(f"bits-per-sample {bits} unsupported (8 only)")
    if one(_T_PLANAR, 1) != 1:
        raise TiffFormatError("planar configuration 2 unsupported")
    compression = one(_T_COMPRESSION, 1)
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise TiffFormatError(f"predictor {predictor} unsupported")
    rows_per_strip = one(_T_ROWS_PER_STRIP, h)
    if rows_per_strip <= 0:
        raise TiffFormatError(f"invalid RowsPerStrip {rows_per_strip}")
    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffFormatError("missing/mismatched strip offsets and counts")
    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != n_strips:
        raise TiffFormatError(
            f"{len(offsets)} strips for {n_strips} expected"
        )
    row_bytes = w * spp
    rows = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        blob = data[off : off + cnt]
        if len(blob) != cnt:
            raise TiffFormatError("strip data out of range")
        strip_rows = min(rows_per_strip, h - s * rows_per_strip)
        expected = strip_rows * row_bytes
        if compression == 1:
            if len(blob) < expected:
                raise TiffFormatError("uncompressed strip short")
            raw = blob[:expected]
        elif compression == 32773:
            raw = _unpackbits(blob, expected)
        elif compression == 5:
            raw = _lzw_decode(blob, expected)
        else:
            raise TiffFormatError(
                f"compression {compression} unsupported (none/PackBits/"
                "LZW; JPEG-in-TIFF and Deflate need an external codec)"
            )
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(
            strip_rows, w, spp
        )
        if predictor == 2:
            # horizontal differencing: cumulative sum along x per sample
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if photometric == 0:  # white is zero: invert
        img = 255 - img
    if spp == 1:
        img = np.repeat(img, 3, axis=2)
    return w, h, img


# ---------------------------------------------------------------------------
# encoder (fixtures/tests)
# ---------------------------------------------------------------------------


def _packbits(row: bytes) -> bytes:
    """Greedy PackBits encoder: repeats of >= 2 become run records,
    literals extend until a 3+ repeat starts (or the 128 cap)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        runlen = j - i + 1
        if runlen >= 2:
            out += bytes([257 - runlen, row[i]])
            i = j + 1
            continue
        lit_end = i
        while lit_end < n and lit_end - i < 128:
            if (
                lit_end + 2 < n
                and row[lit_end] == row[lit_end + 1] == row[lit_end + 2]
            ):
                break
            lit_end += 1
        out += bytes([lit_end - i - 1]) + row[i:lit_end]
        i = lit_end
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-LZW encoder with a REAL string table and the early-change
    width rule (mirror of the decoder; roundtrip-pinned plus a
    hand-assembled decoder vector in tests)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        # drop flushed high bits (same quadratic hazard as the decoder)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)  # spec: every strip starts with Clear
    prev = b""
    for byte in raw:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # early change: the ENCODER bumps width when next_code + 1
        # would overflow, keeping in lockstep with the decoder
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: Clear and restart
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(257)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    byte_order: str = "II",
    rows_per_strip: int | None = None,
    predictor: bool = False,
) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB -> TIFF bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise TiffFormatError("encode_tiff expects uint8 (h, w[, 3])")
    gray = pixels.ndim == 2
    if not gray and pixels.shape[2] != 3:
        raise TiffFormatError("encode_tiff expects 3 channels for color")
    bo = "<" if byte_order == "II" else ">"
    h, w = pixels.shape[:2]
    spp = 1 if gray else 3
    img = pixels.reshape(h, w, spp)
    if rows_per_strip is None:
        rows_per_strip = h
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise TiffFormatError(f"unknown compression {compression!r}")
    if predictor and comp_id == 1:
        raise TiffFormatError("predictor only pairs with compression")
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = img[y0 : y0 + rows_per_strip]
        if predictor:
            d = chunk.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            chunk = (d & 0xFF).astype(np.uint8)
        raw = chunk.tobytes()
        if comp_id == 1:
            strips.append(raw)
        elif comp_id == 32773:
            # PackBits is row-oriented per spec
            rb = w * spp
            strips.append(
                b"".join(
                    _packbits(raw[r : r + rb]) for r in range(0, len(raw), rb)
                )
            )
        else:
            strips.append(_lzw_encode(raw))
    n_strips = len(strips)

    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, v):
        entries.append((tag, 3, 1, v))

    short(_T_WIDTH, w)
    short(_T_LENGTH, h)
    if gray:
        short(_T_BITS, 8)
    else:
        entries.append((_T_BITS, 3, 3, struct.pack(bo + "HHH", 8, 8, 8)))
    short(_T_COMPRESSION, comp_id)
    short(_T_PHOTOMETRIC, 1 if gray else 2)
    short(_T_SAMPLES, spp)
    short(_T_ROWS_PER_STRIP, rows_per_strip)
    if predictor:
        short(_T_PREDICTOR, 2)
    # strip offsets/counts appended after layout is known
    header = 8
    ifd_size = 2 + 12 * (len(entries) + 2) + 4
    # external value area starts after IFD
    ext = bytearray()
    ext_base = header + ifd_size
    def value_field(typ: int, val) -> bytes:
        """The 4-byte IFD value slot: inline short/long/bytes, or a
        LONG offset into the external value area for wider payloads."""
        nonlocal ext
        if isinstance(val, bytes) and len(val) > 4:
            off = ext_base + len(ext)
            ext += val
            return struct.pack(bo + "I", off)
        if isinstance(val, bytes):
            return val.ljust(4, b"\x00")
        if typ == 3:
            return struct.pack(bo + "H", val) + b"\x00\x00"
        return struct.pack(bo + "I", val)

    fixed = [
        (tag, typ, count, value_field(typ, val))
        for tag, typ, count, val in entries
    ]
    strip_data_base = ext_base + len(ext) + 8 * n_strips
    offs, pos = [], strip_data_base
    for sdata in strips:
        offs.append(pos)
        pos += len(sdata)
    off_bytes = struct.pack(bo + "I" * n_strips, *offs)
    cnt_bytes = struct.pack(bo + "I" * n_strips, *(len(s) for s in strips))
    arrays_base = ext_base + len(ext)
    if n_strips == 1:
        fixed.append(
            (_T_STRIP_OFFSETS, 4, 1, struct.pack(bo + "I", offs[0]))
        )
        fixed.append(
            (_T_STRIP_COUNTS, 4, 1, struct.pack(bo + "I", len(strips[0])))
        )
        # the 8-byte area reserved for external strip arrays goes unused
    else:
        fixed.append(
            (_T_STRIP_OFFSETS, 4, n_strips, struct.pack(bo + "I", arrays_base))
        )
        fixed.append(
            (
                _T_STRIP_COUNTS,
                4,
                n_strips,
                struct.pack(bo + "I", arrays_base + 4 * n_strips),
            )
        )
    fixed.sort(key=lambda e: e[0])  # spec: ascending tag order
    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*")
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", len(fixed))
    for tag, typ, count, vf in fixed:
        out += struct.pack(bo + "HHI", tag, typ, count)
        out += vf
    out += struct.pack(bo + "I", 0)  # next IFD
    out += ext
    if n_strips == 1:
        out += b"\x00" * 8  # reserved area (keeps offsets stable)
    else:
        out += off_bytes + cnt_bytes
    for sdata in strips:
        out += sdata
    return bytes(out)
