"""Dependency-free video codec: YUV4MPEG2 (.y4m), uncompressed.

The video leg of the multimodal surface: Y4M is the standard
uncompressed-video interchange container (what ffmpeg emits for raw
pipelines) — an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ...``
followed by frames, each an ASCII ``FRAME`` line plus a raw YUV raster.
Fully specified, public, and decodable with pure numpy: parse the
header parameters, then slice fixed-size frame rasters.

Only ``C444`` (no chroma subsampling: one byte each of Y, U, V per
pixel, plane-ordered) is implemented — its raster math is exact and
byte-addressable, which keeps every downstream statistic integer-exact
for the oracle. Subsampled layouts (C420 et al.) and compressed video
(H.264/VP9/AV1) raise at the dispatch seam where ffmpeg would slot in.

The encoder exists for fixture construction and is round-trip tested;
it is not a Spark sink.
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


def decode_y4m(data: bytes) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """.y4m bytes -> (width, height, (fps_num, fps_den), frames) with
    frames a (n_frames, 3, h, w) uint8 planar ndarray."""
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
    if colorspace != "C444":
        raise VideoFormatError(
            f"unsupported Y4M colorspace {colorspace} (only C444; "
            "subsampled/compressed video needs an external codec)"
        )
    frame_bytes = w * h * 3
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
        frames.append(
            np.frombuffer(raster, dtype=np.uint8).reshape(3, h, w)
        )
        pos = fnl + 1 + frame_bytes
    if not frames:
        raise VideoFormatError("Y4M stream has no frames")
    return w, h, fps, np.stack(frames)
