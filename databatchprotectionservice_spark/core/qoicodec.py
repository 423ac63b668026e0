"""QOI ("Quite OK Image") lossless codec — public specification.

The 2022 single-page public-domain spec (qoiformat.org): a 14-byte
header, then a byte stream of six chunk ops — RGB/RGBA literals, a
64-slot running index keyed by ``(3r+5g+7b+11a) % 64``, 2-bit
wraparound diffs, the two-byte LUMA diff, and 6-bit runs — closed by
a ``00 x7 01`` end marker.  Everything is byte-exact integer state,
so decoded rasters are oracle-checkable with no tolerance, and the
whole adaptive state is one 64-entry array (unlike JPEG-LS's 367
contexts) — the cheap end of the from-scratch image family.

Both directions share the index-hash and wraparound helpers so the
running state cannot mirror-diverge; the tests pin the spec's own
chunk encodings byte-for-byte and fuzz the decoder with the standard
mutation battery.

SUBSET: channels 3 (RGB) and 4 (RGBA), both colorspaces accepted and
echoed back (they are informative only, per spec).
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageFormatError


class QoiFormatError(ImageFormatError):
    """Raised for malformed or out-of-subset QOI bytes."""


_MAGIC = b"qoif"
_END = bytes(7) + b"\x01"
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0

#: spec limit — dimensions are u32 but a 400-million-pixel guard keeps
#: hostile headers from allocating unbounded rasters (same discipline
#: as the PNG bomb guard in imagecodec)
MAX_PIXELS = 1 << 26


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: np.ndarray, colorspace: int = 0) -> bytes:
    """(h, w, 3|4) uint8 raster -> QOI bytes."""
    if (
        pixels.dtype != np.uint8
        or pixels.ndim != 3
        or pixels.shape[2] not in (3, 4)
    ):
        raise QoiFormatError(
            "encode_qoi expects an (h, w, 3|4) uint8 raster"
        )
    if colorspace not in (0, 1):
        raise QoiFormatError(f"colorspace must be 0 or 1, got {colorspace}")
    h, w, channels = pixels.shape
    if h < 1 or w < 1:
        raise QoiFormatError("empty raster")
    out = bytearray(
        _MAGIC + struct.pack(">IIBB", w, h, channels, colorspace)
    )
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = pixels.reshape(-1, channels)
    for px in flat:
        if channels == 4:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), int(px[3])
        else:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        k = _hash(r, g, b, a)
        if index[k] == (r, g, b, a):
            out.append(_OP_INDEX | k)
        else:
            index[k] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        _OP_DIFF | (dr + 2) << 4 | (dg + 2) << 2 | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append((dr - dg + 8) << 4 | (db - dg + 8))
                else:
                    out.append(_OP_RGB)
                    out += bytes((r, g, b))
            else:
                out.append(_OP_RGBA)
                out += bytes((r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """QOI bytes -> (w, h, channels, colorspace, (h, w, ch) raster)."""
    if len(data) < 14 + len(_END):
        raise QoiFormatError("too short for a QOI stream")
    if data[:4] != _MAGIC:
        raise QoiFormatError("not a QOI stream (bad magic)")
    w, h, channels, colorspace = struct.unpack_from(">IIBB", data, 4)
    if channels not in (3, 4):
        raise QoiFormatError(f"channels must be 3 or 4, got {channels}")
    if colorspace not in (0, 1):
        raise QoiFormatError(f"unknown colorspace {colorspace}")
    if w < 1 or h < 1:
        raise QoiFormatError(f"bad dimensions {w}x{h}")
    if w * h > MAX_PIXELS:
        raise QoiFormatError(
            f"{w}x{h} exceeds the {MAX_PIXELS}-pixel decode guard"
        )
    n = w * h
    out = np.empty((n, channels), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(data) - len(_END)
    if data[end:] != _END:
        raise QoiFormatError("missing QOI end marker")
    i = 0
    while i < n:
        if pos >= end:
            raise QoiFormatError(
                f"chunk stream exhausted at pixel {i} of {n}"
            )
        op = data[pos]
        pos += 1
        if op == _OP_RGB:
            if pos + 3 > end:
                raise QoiFormatError("truncated RGB chunk")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == _OP_RGBA:
            if pos + 4 > end:
                raise QoiFormatError("truncated RGBA chunk")
            r, g, b, a = (
                data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            )
            pos += 4
        elif op & 0xC0 == _OP_INDEX:
            r, g, b, a = index[op & 0x3F]
        elif op & 0xC0 == _OP_DIFF:
            r = (r + ((op >> 4) & 0x3) - 2) % 256
            g = (g + ((op >> 2) & 0x3) - 2) % 256
            b = (b + (op & 0x3) - 2) % 256
        elif op & 0xC0 == _OP_LUMA:
            if pos + 1 > end:
                raise QoiFormatError("truncated LUMA chunk")
            dg = (op & 0x3F) - 32
            b2 = data[pos]
            pos += 1
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b2 & 0xF) - 8) % 256
        else:  # _OP_RUN
            run = (op & 0x3F) + 1
            if i + run > n:
                raise QoiFormatError(
                    f"run of {run} overruns the raster at pixel {i}"
                )
            px = (r, g, b, a)[:channels]
            out[i : i + run] = px
            i += run
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)[:channels]
        i += 1
    if pos != end:
        raise QoiFormatError(
            f"{end - pos} trailing chunk bytes after the last pixel"
        )
    return w, h, channels, colorspace, out.reshape(h, w, channels)
