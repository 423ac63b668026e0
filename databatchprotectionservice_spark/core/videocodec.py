"""Dependency-free video codec: YUV4MPEG2 (.y4m), uncompressed.

The video leg of the multimodal surface: Y4M is the standard
uncompressed-video interchange container (what ffmpeg emits for raw
pipelines) — an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ...``
followed by frames, each an ASCII ``FRAME`` line plus a raw YUV raster.
Fully specified, public, and decodable with pure numpy: parse the
header parameters, then slice fixed-size frame rasters.

Supported colorspaces:

* ``C444`` — no chroma subsampling: one byte each of Y, U, V per
  pixel, plane-ordered. Raster math is exact and byte-addressable.
* ``C420`` (and its chroma-siting aliases ``C420jpeg`` / ``C420mpeg2``
  / ``C420paldv``, which share the byte layout) — ffmpeg's DEFAULT
  rawvideo output: full-res Y plane followed by half-res (w/2 x h/2)
  U and V planes. The decoder upsamples chroma by 2x2 sample
  REPLICATION, so every output byte is an exact copy of an input byte
  and downstream statistics stay integer-exact for the oracle (each
  chroma sample simply counts 4x).
* ``C422`` — half-width chroma, same replication logic (2x1).

Compressed video (H.264/VP9/AV1) raises at the dispatch seam where
ffmpeg would slot in.

The encoders exist for fixture construction and are round-trip tested;
they are not a Spark sink.
"""

from __future__ import annotations

import numpy as np


class VideoFormatError(ValueError):
    """Raised for malformed or unsupported video bytes."""


_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """(n_frames, 3, h, w) uint8 planar YUV (C444) -> .y4m bytes."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[1] != 3:
        raise VideoFormatError("encode_y4m expects (n, 3, h, w) uint8")
    n, _, h, w = frames.shape
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (w, h, *fps)
    out = bytearray(header)
    for f in range(n):
        out += b"FRAME\n"
        out += frames[f].tobytes()
    return bytes(out)


def encode_y4m_planar(
    y: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    colorspace: str = "C420",
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Subsampled planar planes -> .y4m bytes. ``y`` is (n, h, w); ``u``
    and ``v`` are (n, h//2, w//2) for C420* or (n, h, w//2) for C422."""
    if y.dtype != np.uint8 or y.ndim != 3:
        raise VideoFormatError("encode_y4m_planar expects (n, h, w) uint8 Y")
    n, h, w = y.shape
    if colorspace in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        want = (n, h // 2, w // 2)
    elif colorspace == "C422":
        want = (n, h, w // 2)
    else:
        # exact match only: a 10/12-bit tag would silently mislabel an
        # 8-bit byte layout
        raise VideoFormatError(f"encode_y4m_planar: unsupported {colorspace}")
    if (
        u.shape != want
        or v.shape != want
        or u.dtype != np.uint8
        or v.dtype != np.uint8
    ):
        raise VideoFormatError(
            f"chroma planes must be {want} uint8 for {colorspace}"
        )
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (
        w, h, fps[0], fps[1], colorspace.encode("ascii"),
    )
    out = bytearray(header)
    for f in range(n):
        out += b"FRAME\n"
        out += y[f].tobytes() + u[f].tobytes() + v[f].tobytes()
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """.y4m bytes -> (width, height, (fps_num, fps_den), frames) with
    frames a (n_frames, 3, h, w) uint8 planar ndarray. For subsampled
    colorspaces (C420*, C422) the chroma planes are upsampled to full
    resolution by sample replication, so every emitted byte is an exact
    copy of a stream byte."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise VideoFormatError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    colorspace = "C420"  # the Y4M default when the C tag is absent
    for tok in data[len(_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:]
        try:
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "F":
                num, den = val.split(b":")
                fps = (int(num), int(den))
            elif tag == "C":
                colorspace = "C" + val.decode("ascii")
        except (ValueError, UnicodeDecodeError) as exc:
            raise VideoFormatError(f"bad Y4M header token {tok!r}") from exc
    if w is None or h is None or w <= 0 or h <= 0:
        raise VideoFormatError("Y4M header missing W/H")
    # EXACT colorspace match: a prefix match would misclassify 10/12-bit
    # and alpha variants (C420p10, C444alpha — different bytes-per-
    # sample/plane-count) as their 8-bit base layouts and then misparse
    # mid-frame; those must hit the unsupported-colorspace seam instead
    if colorspace == "C444":
        cw, ch = w, h
    elif colorspace in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        # the siting aliases share the 8-bit byte layout exactly
        if w % 2 or h % 2:
            raise VideoFormatError(
                f"C420 requires even dimensions, got {w}x{h}"
            )
        cw, ch = w // 2, h // 2
    elif colorspace == "C422":
        if w % 2:
            raise VideoFormatError(f"C422 requires even width, got {w}")
        cw, ch = w // 2, h
    else:
        raise VideoFormatError(
            f"unsupported Y4M colorspace {colorspace} (8-bit "
            "C444/C420/C420jpeg/C420mpeg2/C420paldv/C422 only; "
            "10/12-bit, alpha, and compressed video need an external "
            "codec)"
        )
    frame_bytes = w * h + 2 * cw * ch
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise VideoFormatError(f"bad FRAME marker at offset {pos}")
        raster = data[fnl + 1 : fnl + 1 + frame_bytes]
        if len(raster) != frame_bytes:
            raise VideoFormatError(
                f"truncated frame: need {frame_bytes} bytes, "
                f"have {len(raster)}"
            )
        buf = np.frombuffer(raster, dtype=np.uint8)
        if colorspace == "C444":
            frames.append(buf.reshape(3, h, w))
        else:
            yp = buf[: w * h].reshape(h, w)
            up = buf[w * h : w * h + cw * ch].reshape(ch, cw)
            vp = buf[w * h + cw * ch :].reshape(ch, cw)
            # replication upsample: every byte an exact stream copy
            up = np.repeat(np.repeat(up, h // ch, axis=0), w // cw, axis=1)
            vp = np.repeat(np.repeat(vp, h // ch, axis=0), w // cw, axis=1)
            frames.append(np.stack([yp, up, vp]))
        pos = fnl + 1 + frame_bytes
    if not frames:
        raise VideoFormatError("Y4M stream has no frames")
    return w, h, fps, np.stack(frames)
