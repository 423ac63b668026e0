"""Dependency-free audio codecs: RIFF/WAVE PCM and IMA ADPCM.

The audio leg of the multimodal surface (SURVEY §7 phase 3 "multimodal
columns"): WAV is a fully specified public container decodable with the
stdlib + numpy — a chunked RIFF file whose ``fmt `` chunk declares PCM
layout and whose ``data`` chunk carries little-endian interleaved
samples. The decoder walks chunks properly (tolerating unknown chunks
like ``LIST``/``fact``), validates the PCM/16-bit contract, and returns
the samples as an ``(n_frames, channels) int16`` ndarray — integer
samples, so every downstream statistic (peak, energy) is EXACT and
oracle-checkable with no float tolerance.

Compressed audio has a REAL decode path for IMA (DVI) ADPCM — WAVE
format tag 0x11, a pure integer state machine (89-entry step table)
with block predictors, ``fact``-chunk tail trimming, and a fixture
encoder.  Perceptual codecs (MP3/AAC/OGG) still raise at the dispatch
seam — a pydub/ffmpeg drop-in changes one function.

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


# ---------------------------------------------------------------------------
# IMA (DVI) ADPCM — WAVE format tag 0x11: real COMPRESSED audio decode
# ---------------------------------------------------------------------------

#: step-size table, IMA ADPCM specification (89 entries)
IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

#: index-adjustment table (low 3 bits of the nibble)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_decode_nibbles(nibbles, predictor: int, index: int):
    """Reference IMA decode loop: one nibble -> one sample.  Pure
    integer state machine straight from the spec; the starting
    predictor is NOT emitted (block headers carry it as sample 0)."""
    out = []
    for n in nibbles:
        step = IMA_STEP_TABLE[index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        predictor = max(-32768, min(32767, predictor + diff))
        index = max(0, min(88, index + IMA_INDEX_TABLE[n & 7]))
        out.append(predictor)
    return out, predictor, index


def encode_wav_adpcm(
    samples: np.ndarray, rate: int = 8000, block_align: int = 132
) -> bytes:
    """(n,) int16 mono -> RIFF/WAVE IMA-ADPCM (format tag 0x11).

    Standard block layout: a 4-byte header (int16 predictor carrying
    sample 0 VERBATIM, uint8 step index, reserved) followed by
    ``block_align - 4`` nibble-pair bytes, so each block holds
    ``(block_align - 4) * 2 + 1`` samples; the final partial block is
    zero-nibble padded and the true frame count rides in the ``fact``
    chunk, exactly as real encoders emit."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise AudioFormatError("encode_wav_adpcm expects (n,) int16 mono")
    n = len(samples)
    if n == 0:
        raise AudioFormatError("encode_wav_adpcm needs at least one sample")
    spb = (block_align - 4) * 2 + 1
    blocks = bytearray()
    index = 0
    pos = 0
    while pos < n:
        chunk = samples[pos : pos + spb]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            s = int(s)
            step = IMA_STEP_TABLE[index]
            delta = s - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            if nib & 8:
                diff = -diff
            pred = max(-32768, min(32767, pred + diff))
            index = max(0, min(88, index + IMA_INDEX_TABLE[nib & 7]))
            nibbles.append(nib)
        nibbles += [0] * (spb - 1 - len(nibbles))  # pad the last block
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
        pos += spb
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11,
        1,
        rate,
        (rate * block_align + spb - 1) // spb,  # nominal byte rate
        block_align,
        4,  # bits per (encoded) sample
        2,  # cbSize
        spb,  # wSamplesPerBlock
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(blocks))
        + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE IMA-ADPCM (mono, format tag 0x11) -> (rate, samples).

    Block-structured decode: each block's header predictor IS sample
    0 (emitted verbatim), the step index resumes from the header, and
    the nibble stream drives the integer state machine.  The ``fact``
    chunk's frame count trims the final block's zero-nibble padding —
    without honoring it a decoder silently appends garbage samples."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    fact_frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise AudioFormatError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise AudioFormatError("fmt chunk too short")
            tag16 = struct.unpack("<H", chunk[:2])[0]
            if tag16 != 0x11:
                raise AudioFormatError(
                    f"not IMA ADPCM (format tag {tag16:#x})"
                )
            if length < 20:
                raise AudioFormatError(
                    "ADPCM fmt chunk missing wSamplesPerBlock"
                )
            fmt = struct.unpack("<HHIIHHHH", chunk[:20])
        elif tag == b"fact":
            if length < 4:
                raise AudioFormatError("fact chunk too short")
            (fact_frames,) = struct.unpack("<I", chunk[:4])
        elif tag == b"data":
            payload = chunk
            break
        pos += 8 + length + (length & 1)
    if fmt is None or payload is None:
        raise AudioFormatError("WAV missing fmt/data chunk")
    tag_, channels, rate, _br, block_align, bits, _cb, spb = fmt
    if tag_ != 0x11:
        raise AudioFormatError(f"not IMA ADPCM (format tag {tag_:#x})")
    if channels != 1:
        raise AudioFormatError("only mono IMA ADPCM supported")
    if bits != 4:
        raise AudioFormatError(f"bad ADPCM bits-per-sample {bits}")
    if spb != (block_align - 4) * 2 + 1:
        raise AudioFormatError(
            f"inconsistent ADPCM block geometry: align={block_align} "
            f"samples_per_block={spb}"
        )
    if len(payload) % block_align:
        raise AudioFormatError("ADPCM data not a whole number of blocks")
    out: list[int] = []
    for b0 in range(0, len(payload), block_align):
        pred, index, _ = struct.unpack(
            "<hBB", payload[b0 : b0 + 4]
        )
        if index > 88:
            raise AudioFormatError(f"ADPCM step index {index} out of range")
        out.append(pred)
        body = payload[b0 + 4 : b0 + block_align]
        nibbles = []
        for byte in body:
            nibbles.append(byte & 0xF)
            nibbles.append(byte >> 4)
        dec, _, _ = _ima_decode_nibbles(nibbles, pred, index)
        out.extend(dec)
    if fact_frames is not None:
        if fact_frames > len(out):
            raise AudioFormatError(
                f"fact frame count {fact_frames} exceeds decoded {len(out)}"
            )
        out = out[:fact_frames]
    return rate, np.asarray(out, dtype=np.int16)
