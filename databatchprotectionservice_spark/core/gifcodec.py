"""Dependency-free GIF (87a/89a) still-image codec.

Extends the real decode path behind ``operators.multimodal.decode_media
(mode="real")`` with the one common web image format the PPM/BMP/PNG/JPEG
set still lacked. GIF is a fully specified public format (GIF89a
specification, 1990; LZW per the spec's Appendix F) decodable with the
stdlib + numpy:

* **container** — ``GIF87a``/``GIF89a`` signature, logical screen
  descriptor, optional global color table; a stream of blocks:
  extensions (``0x21`` — graphic control / comment / application /
  plain text, all length-prefixed sub-block chains that decode skips
  uniformly), image descriptors (``0x2C``) and the trailer (``0x3B``).
* **pixel data** — variable-code-width LZW over palette indices, packed
  little-endian-bit-first into length-prefixed sub-blocks. The decoder
  implements the full dictionary protocol: CLEAR resets to the initial
  code width, END terminates, the KwKwK case (a code one past the
  table) emits ``prev + prev[0]``, and the width grows after the table
  reaches ``2^width`` entries (capped at 12 bits per the spec).
* **interlace** — the four-pass Adam-style row order (rows 0,8,16.. then
  4,12.. then 2,6.. then odd rows) is undone into a sequential raster.

Decoding returns ``(width, height, pixels)`` with pixels ``(h, w, 3)
uint8`` RGB — palette indices mapped through the active (local-over-
global) color table — matching the contract of ``imagecodec``; GIF is
lossless, so the raster is exact. Only the FIRST image in the stream is
decoded (still-image semantics; animation frames would iterate the same
block loop). A transparent-color index, if declared, is mapped through
the palette like any other index — this decoder recovers stored pixels,
not composited presentation.

The encoder (fixture construction; round-trip tested like the other
codecs) emits a non-interlaced GIF89a with a full-size global color
table and a REAL dictionary-building LZW compressor — decode exercises
genuine code growth, not a degenerate clear-code-per-symbol stream.

Reference note: the reference engine has no media codecs at all; this
sits on the engine's multimodal extension surface (SURVEY.md §2
"beyond-reference" operators).
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Raised on malformed or unsupported GIF input."""


_MAX_PIXELS = 67_000_000  # same allocation cap as the JPEG decoder


# ---------------------------------------------------------------------------
# bit readers / writers (LSB-first, per GIF Appendix F)
# ---------------------------------------------------------------------------


def _concat_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Read a length-prefixed sub-block chain starting at ``pos``;
    returns (payload, position after the 0x00 terminator)."""
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise GifFormatError("truncated sub-block")
        chunks.append(data[pos : pos + size])
        pos += size


def _lzw_decode(payload: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW: variable width 3..12 bits, LSB-first bit packing."""
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary as a list of byte strings; entries 0..clear-1 are roots
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    # rolling LSB-first bit buffer — O(n), never materializes the whole
    # stream as one big int (that shift-per-code pattern is O(n^2))
    acc = 0
    nbits = 0
    i = 0
    n_payload = len(payload)

    while True:
        while nbits < width:
            if i >= n_payload:
                break
            acc |= payload[i] << nbits
            i += 1
            nbits += 8
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifFormatError(f"first code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifFormatError(f"LZW code {code} beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise GifFormatError(
            f"LZW produced {len(out)} of {n_pixels} expected pixels"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        targets = range(start, h, step)
        n = len(targets)
        out[list(targets)] = rows[src : src + n]
        src += n
    return out.reshape(-1)


def decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the first image of a GIF into ``(w, h, (h,w,3) uint8 RGB)``."""
    if len(data) < 13:
        raise GifFormatError("truncated GIF header")
    sig = data[:6]
    if sig not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError(f"not a GIF signature: {sig!r}")
    _sw, _sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        gct_len = 2 << (flags & 0x07)
        if pos + 3 * gct_len > len(data):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(data, np.uint8, 3 * gct_len, pos).reshape(-1, 3)
        pos += 3 * gct_len

    while True:
        if pos >= len(data):
            raise GifFormatError("unterminated GIF block stream")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise GifFormatError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-block chain
            if pos >= len(data):
                raise GifFormatError("truncated extension")
            pos += 1  # label byte
            _, pos = _concat_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise GifFormatError("truncated image descriptor")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if w == 0 or h == 0:
            raise GifFormatError(f"degenerate image size {w}x{h}")
        if w * h > _MAX_PIXELS:
            raise GifFormatError(f"image too large: {w}x{h}")
        palette = gct
        if iflags & 0x80:  # local color table wins
            lct_len = 2 << (iflags & 0x07)
            if pos + 3 * lct_len > len(data):
                raise GifFormatError("truncated local color table")
            palette = np.frombuffer(
                data, np.uint8, 3 * lct_len, pos
            ).reshape(-1, 3)
            pos += 3 * lct_len
        if palette is None:
            raise GifFormatError("image has neither local nor global palette")
        if pos >= len(data):
            raise GifFormatError("missing LZW minimum code size")
        min_code_size = data[pos]
        pos += 1
        payload, pos = _concat_subblocks(data, pos)
        idx = _lzw_decode(payload, min_code_size, w * h)
        if int(idx.max(initial=0)) >= len(palette):
            raise GifFormatError(
                f"pixel index {int(idx.max())} outside {len(palette)}-entry "
                "palette"
            )
        if iflags & 0x40:
            idx = _deinterlace(idx, w, h)
        pixels = palette[idx].reshape(h, w, 3)
        return w, h, np.ascontiguousarray(pixels)


# ---------------------------------------------------------------------------
# encoder (fixtures; real dictionary-building LZW)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out_bits: list[tuple[int, int]] = [(clear, width)]
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        if next_code < (1 << 12):
            table[cand] = next_code
            next_code += 1
            # the encoder runs ONE dictionary entry ahead of the decoder
            # (KwKwK exists exactly because of that), so it widens one
            # entry LATER: after assigning value 2^width, not on reaching
            # it — this keeps each emitted code at the width the decoder
            # will read it with (round-trip + hand-stream tests pin this)
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            # table full at 12 bits: flush with CLEAR and rebuild, the
            # spec's non-deferred behavior (the decoder also accepts
            # deferred-clear streams produced by other encoders)
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((end, width))

    acc = 0
    nbits = 0
    raw = bytearray()
    for code, cw in out_bits:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        raw.append(acc & 0xFF)
    return bytes(raw)


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Encode an ``(h, w) uint8`` index raster with an ``(n, 3) uint8``
    palette (n a power of two, 2..256) as a non-animated GIF89a."""
    if indices.ndim != 2 or indices.dtype != np.uint8:
        raise GifFormatError("encode_gif expects (h, w) uint8 indices")
    n_pal = len(palette)
    if n_pal not in (2, 4, 8, 16, 32, 64, 128, 256) or palette.shape != (
        n_pal,
        3,
    ):
        raise GifFormatError("palette must be (2^k, 3) uint8, k=1..8")
    if int(indices.max(initial=0)) >= n_pal:
        raise GifFormatError("index outside palette")
    h, w = indices.shape
    pal_bits = max((n_pal - 1).bit_length(), 1)
    min_code_size = max(pal_bits, 2)

    rows = indices
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        rows = indices[order]

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    out.append(min_code_size)
    out += _subblocks(_lzw_encode(rows.tobytes(), min_code_size))
    out.append(0x3B)
    return bytes(out)


#: identity grayscale palette: index i -> (i, i, i); with it a GIF
#: losslessly carries one byte per pixel, so the decoded RGB raster is
#: the byte stream with every byte tripled — a closed form DuckDB can
#: recompute (the fixture contract in ``multimodal_decode_real``)
GRAY_PALETTE = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
