"""Dependency-free AVI container + Motion-JPEG video decode.

Closes the compressed-VIDEO seam the way FLAC closed the lossless-audio
one: Motion-JPEG (fourcc ``MJPG``) is the one mainstream compressed
video codec that is fully decodable from public specs with machinery
this repo already has — every frame is a complete baseline JPEG
(ITU T.81), so the video path composes the existing from-scratch JPEG
decoder (``core/jpegcodec.py``) with a RIFF-AVI container walk (the
same RIFF discipline as the WAV decoder in ``core/audiocodec.py``).
Inter-frame codecs (H.264/VP9/AV1) remain at the documented
library seam — they need entropy-coded inter prediction, not a
container parse.

Container coverage (public AVI 1.0 spec, OpenDML not required at
fixture scale): ``RIFF('AVI ')`` with ``LIST hdrl`` (``avih`` main
header + ``LIST strl`` with ``strh``/``strf``), ``LIST movi`` carrying
``00dc`` compressed-video chunks (word-aligned), and an ``idx1`` index
whose entries are validated against the actual chunk layout when
present.  The decoder cross-checks every redundant field the container
carries: stream count, fourcc/handler, frame dims (avih vs strf vs
every decoded JPEG), frame count (avih vs strh vs actual chunks vs
idx1), and chunk bounds — a mis-segmented movi walk cannot produce the
right frames.

The encoder exists for fixture construction (it assembles per-frame
JPEGs from the closed-form constant-tile encoder, so decoded rasters
are bit-exact and oracle-restatable — see the exactness note in
``core/jpegcodec.py``); it is not a Spark sink.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import JpegFormatError, decode_jpeg


class AviFormatError(ValueError):
    """Raised for malformed or unsupported AVI bytes."""


#: AVIF_HASINDEX — the one main-header flag the fixtures set
_AVIF_HASINDEX = 0x00000010
#: AVIIF_KEYFRAME — every MJPEG frame is intra-coded
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Per-frame baseline-JPEG bytes -> single-stream AVI (MJPG).

    ``frames`` are complete JPEG files (SOI..EOI) of identical
    ``width`` x ``height``; the encoder only wraps them in the
    container — frame pixel content is whatever the JPEGs decode to.
    Includes a spec-complete ``idx1`` (offsets measured from the
    ``movi`` fourcc, the convention mainstream muxers emit)."""
    if not frames:
        raise AviFormatError("encode_avi_mjpeg needs at least one frame")
    if width <= 0 or height <= 0:
        raise AviFormatError("frame dimensions must be positive")
    n = len(frames)
    rate, scale = fps
    if rate <= 0 or scale <= 0:
        raise AviFormatError("fps must be positive")
    max_chunk = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        (1_000_000 * scale) // rate,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_chunk,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            scale,  # dwScale
            rate,  # dwRate
            0,  # dwStart
            n,  # dwLength (frames)
            max_chunk,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize (0: variable-size samples)
            0, 0, width, height,  # rcFrame
        )
    )
    # strf = BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount (decoded depth, advisory for MJPG)
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (advisory)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx_entries = []
    for f in frames:
        # idx1 offsets are measured from the 'movi' fourcc: the first
        # chunk header sits 4 bytes past it
        idx_entries.append((4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_body))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for the RIFF chunks in
    ``data[start:end]``, honoring word alignment."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + length > end:
            raise AviFormatError(
                f"chunk {fourcc!r} overruns its parent "
                f"({length} bytes at {pos})"
            )
        yield fourcc, body, length
        pos = body + length + (length & 1)


def decode_avi_mjpeg(
    data: bytes,
) -> tuple[tuple[int, int], np.ndarray]:
    """AVI(MJPG) bytes -> ((rate, scale) fps, (n, h, w) uint8 gray).

    Every ``00dc`` chunk runs through the from-scratch baseline JPEG
    decoder; the gray plane is channel 0 of the decoded RGB (the
    fixture JPEGs are grayscale, all channels equal).  Redundant
    container fields are cross-checked: a decoder that mis-walks movi,
    trusts idx1 blindly, or skips dimension checks raises here."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI file")
    if len(data) < 12:
        raise AviFormatError("AVI too short")
    (riff_len,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_len)
    avih = None
    strh = None
    strf_dims = None
    movi_span = None
    idx1 = None
    for fourcc, body, length in _walk_chunks(data, 12, end):
        if fourcc == b"LIST":
            if length < 4:
                raise AviFormatError("LIST chunk too short for a type")
            ltype = data[body : body + 4]
            if ltype == b"hdrl":
                for fc2, b2, l2 in _walk_chunks(data, body + 4, body + length):
                    if fc2 == b"avih":
                        if l2 < 56:
                            raise AviFormatError("avih too short")
                        avih = struct.unpack("<14I", data[b2 : b2 + 56])
                    elif fc2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        for fc3, b3, l3 in _walk_chunks(
                            data, b2 + 4, b2 + l2
                        ):
                            if fc3 == b"strh":
                                if l3 < 56:
                                    raise AviFormatError("strh too short")
                                strh = data[b3 : b3 + 56]
                            elif fc3 == b"strf":
                                if l3 < 40:
                                    raise AviFormatError("strf too short")
                                _bs, bw, bh = struct.unpack(
                                    "<Iii", data[b3 : b3 + 12]
                                )
                                comp = data[b3 + 16 : b3 + 20]
                                if comp != b"MJPG":
                                    raise AviFormatError(
                                        f"not MJPEG (biCompression "
                                        f"{comp!r})"
                                    )
                                strf_dims = (bw, abs(bh))
            elif ltype == b"movi":
                movi_span = (body, body + length)
        elif fourcc == b"idx1":
            idx1 = (body, length)
    if avih is None or strh is None or strf_dims is None:
        raise AviFormatError("AVI missing avih/strh/strf")
    if movi_span is None:
        raise AviFormatError("AVI missing movi list")
    if avih[6] != 1:
        raise AviFormatError(f"only single-stream AVI supported "
                             f"(dwStreams={avih[6]})")
    if strh[:4] != b"vids" or strh[4:8] != b"MJPG":
        raise AviFormatError(
            f"not an MJPEG video stream "
            f"({strh[:4]!r}/{strh[4:8]!r})"
        )
    scale, rate, _start, length_frames = struct.unpack(
        "<IIII", strh[20:36]
    )
    if scale == 0 or rate == 0:
        raise AviFormatError("strh dwScale/dwRate must be nonzero")
    width, height = avih[8], avih[9]
    if (width, height) != strf_dims:
        raise AviFormatError(
            f"avih dims {width}x{height} != strf {strf_dims[0]}x"
            f"{strf_dims[1]}"
        )
    ms, me = movi_span
    frames = []
    chunk_layout = []
    for fourcc, body, length in _walk_chunks(data, ms + 4, me):
        if fourcc != b"00dc":
            raise AviFormatError(
                f"unexpected movi chunk {fourcc!r} in a single-video-"
                "stream file"
            )
        # idx1 offsets are measured from the 'movi' fourcc at ms
        chunk_layout.append((body - 8 - ms, length))
        try:
            w, h, rgb = decode_jpeg(bytes(data[body : body + length]))
        except JpegFormatError as exc:
            # frame payloads are part of the container contract: keep
            # one domain error type for the whole decode
            raise AviFormatError(
                f"frame {len(frames)} JPEG invalid: {exc}"
            ) from exc
        if (w, h) != (width, height):
            raise AviFormatError(
                f"frame {len(frames)} is {w}x{h}, container says "
                f"{width}x{height}"
            )
        frames.append(rgb[:, :, 0])
    if len(frames) != avih[4]:
        raise AviFormatError(
            f"avih dwTotalFrames {avih[4]} != {len(frames)} movi chunks"
        )
    if length_frames != len(frames):
        raise AviFormatError(
            f"strh dwLength {length_frames} != {len(frames)} movi chunks"
        )
    if idx1 is not None:
        ib, il = idx1
        if il % 16:
            raise AviFormatError("idx1 length not a multiple of 16")
        entries = il // 16
        if entries != len(frames):
            raise AviFormatError(
                f"idx1 has {entries} entries for {len(frames)} frames"
            )
        for i in range(entries):
            e = ib + 16 * i
            ckid = data[e : e + 4]
            _flags, off, size = struct.unpack("<III", data[e + 4 : e + 16])
            if ckid != b"00dc":
                raise AviFormatError(f"idx1 entry {i} ckid {ckid!r}")
            if (off, size) != chunk_layout[i]:
                raise AviFormatError(
                    f"idx1 entry {i} ({off},{size}) != actual chunk "
                    f"{chunk_layout[i]}"
                )
    if not frames:
        raise AviFormatError("AVI carries no video frames")
    return (rate, scale), np.stack(frames)
