"""Dependency-free audio codec: RIFF/WAVE PCM.

The audio leg of the multimodal surface (SURVEY §7 phase 3 "multimodal
columns"): WAV is a fully specified public container decodable with the
stdlib + numpy — a chunked RIFF file whose ``fmt `` chunk declares PCM
layout and whose ``data`` chunk carries little-endian interleaved
samples. The decoder walks chunks properly (tolerating unknown chunks
like ``LIST``/``fact``), validates the PCM/16-bit contract, and returns
the samples as an ``(n_frames, channels) int16`` ndarray — integer
samples, so every downstream statistic (peak, energy) is EXACT and
oracle-checkable with no float tolerance.

Compressed audio (MP3/AAC/OGG) raises at the dispatch seam like
JPEG/video does for images — a pydub/ffmpeg drop-in changes one
function.

The encoder exists for fixture construction and is round-trip tested;
it is not a Spark sink.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    """Raised for malformed or unsupported audio bytes."""


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise AudioFormatError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    payload = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (rate, channels, samples) with samples an
    ``(n_frames, channels) int16`` ndarray."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise AudioFormatError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise AudioFormatError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            payload = chunk
            break  # data is the last chunk we need
        # unknown chunks (LIST, fact, ...) are skipped; chunks are
        # word-aligned — a chunk of odd length carries one pad byte
        pos += 8 + length + (length & 1)
    if fmt is None:
        raise AudioFormatError("WAV missing fmt chunk")
    if payload is None:
        raise AudioFormatError("WAV missing data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise AudioFormatError(
            f"unsupported WAV format tag {audio_format} (only PCM=1; "
            "MP3/AAC/OGG need an external codec)"
        )
    if bits != 16:
        raise AudioFormatError(f"unsupported WAV bit depth {bits} (only 16)")
    if channels < 1 or block_align != channels * 2:
        raise AudioFormatError(
            f"inconsistent WAV layout: channels={channels} "
            f"block_align={block_align}"
        )
    if len(payload) % block_align:
        raise AudioFormatError("WAV data not a whole number of frames")
    samples = np.frombuffer(payload, dtype="<i2").reshape(-1, channels)
    return rate, channels, samples.astype(np.int16)
