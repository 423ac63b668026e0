"""RIFF/WAVE PCM codec: round-trips, chunk-walk tolerance, error paths.

Mirrors test_imagecodec.py's discipline: hypothesis round-trips through
the real encoder, a hand-assembled WAV with extra chunks (LIST before
data, odd-length chunk padding) that the decoder must walk over, and
precise failures for non-PCM, wrong bit depth, truncation, and layout
inconsistencies.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.audiocodec import (
    AudioFormatError,
    decode_wav,
    encode_wav,
)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 99),
)
def test_wav_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    got_rate, got_ch, got = decode_wav(encode_wav(s, rate=rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(got, s)


def test_wav_mono_1d_input():
    s = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    rate, ch, got = decode_wav(encode_wav(s))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got[:, 0], s)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def test_wav_decoder_skips_unknown_chunks():
    """LIST (odd length, exercising word-alignment padding) and fact
    chunks before data must be walked over, per the RIFF spec."""
    s = np.array([[1], [-2], [3]], dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + _chunk(b"fmt ", fmt)
        + _chunk(b"LIST", b"INFOxyz")  # 7 bytes: odd, needs pad byte
        + _chunk(b"fact", struct.pack("<I", 3))
        + _chunk(b"data", s.astype("<i2").tobytes())
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, got = decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got, s)


def test_wav_errors():
    good = encode_wav(np.zeros(4, dtype=np.int16))
    with pytest.raises(AudioFormatError, match="not a RIFF"):
        decode_wav(b"OggS" + good[4:])
    with pytest.raises(AudioFormatError, match="truncated"):
        decode_wav(good[:-3])

    def mk(audio_format=1, bits=16, block_align=2, channels=1):
        fmt = struct.pack(
            "<HHIIHH", audio_format, channels, 8000, 16000, block_align, bits
        )
        body = (
            b"WAVE"
            + _chunk(b"fmt ", fmt)
            + _chunk(b"data", b"\x00\x00\x00\x00")
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(AudioFormatError, match="format tag 85"):
        decode_wav(mk(audio_format=85))  # MP3-in-WAV
    with pytest.raises(AudioFormatError, match="bit depth 8"):
        decode_wav(mk(bits=8))
    with pytest.raises(AudioFormatError, match="inconsistent"):
        decode_wav(mk(block_align=3))
    with pytest.raises(AudioFormatError, match="missing data"):
        body = b"WAVE" + _chunk(
            b"fmt ", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        )
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(AudioFormatError, match="whole number of frames"):
        body = b"WAVE" + _chunk(
            b"fmt ", struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        ) + _chunk(b"data", b"\x00\x00")  # 2 bytes, frame needs 4
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# IMA ADPCM (WAVE format 0x11)
# ---------------------------------------------------------------------------


def _ima_twin(nibbles, pred, index):
    """Independent spec model: shares no code with the codec (the
    codec's tables are re-derived here from the published constants)."""
    steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
             34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
             130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
             408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166,
             1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024,
             3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845,
             8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
             20350, 22385, 24623, 27086, 29794, 32767]
    idx_adj = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = []
    for n in nibbles:
        step = steps[index]
        mag = n & 7
        # diff = (2*mag + 1) * step / 8, truncating per-term (the spec's
        # shift-add formulation, NOT a single multiply)
        diff = step >> 3
        if mag & 1:
            diff += step >> 2
        if mag & 2:
            diff += step >> 1
        if mag & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + idx_adj[mag]))
        out.append(pred)
    return out


def test_ima_state_machine_matches_independent_spec_model():
    from databatchprotectionservice_spark.core.audiocodec import (
        _ima_decode_nibbles,
    )

    import random

    rnd = random.Random(11)
    for trial in range(50):
        nibbles = [rnd.randrange(16) for _ in range(200)]
        pred = rnd.randrange(-32768, 32768)
        index = rnd.randrange(89)
        got, _, _ = _ima_decode_nibbles(nibbles, pred, index)
        assert got == _ima_twin(nibbles, pred, index)


def test_ima_hand_vector():
    """One fully hand-computed vector: pred=0, index=0 (step 7).
    Nibble 4 -> diff = 7>>3 + 7 = 7, pred 7, index += idx_adj[4]=2 ->
    2 (step 9); nibble 12 (8|4) -> diff = 9>>3 + 9 = 10, pred
    7-10 = -3, index += 2 -> 4 (step 11); nibble 1 -> diff =
    11>>3 + 11>>2 = 1 + 2 = 3, pred 0, index += idx_adj[1]=-1 -> 3."""
    from databatchprotectionservice_spark.core.audiocodec import (
        _ima_decode_nibbles,
    )

    got, pred, index = _ima_decode_nibbles([4, 12, 1], 0, 0)
    assert got == [7, -3, 0]
    assert (pred, index) == (0, 3)


def test_adpcm_roundtrip_block_starts_exact_and_error_bounded():
    import numpy as np

    from databatchprotectionservice_spark.core.audiocodec import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    t = np.arange(2000)
    sig = (5000 * np.sin(t / 20)).astype(np.int16)
    rate, dec = decode_wav_adpcm(encode_wav_adpcm(sig, rate=16000))
    assert rate == 16000
    assert len(dec) == len(sig)  # fact chunk trims the padded tail
    spb = (132 - 4) * 2 + 1
    # block headers carry block-start samples verbatim
    assert np.array_equal(dec[::spb], sig[::spb])
    # ADPCM tracks a smooth signal within a small bounded error
    assert int(np.abs(dec.astype(int) - sig.astype(int)).max()) < 1500


def test_adpcm_error_paths():
    import numpy as np
    import pytest

    from databatchprotectionservice_spark.core.audiocodec import (
        AudioFormatError,
        decode_wav,
        decode_wav_adpcm,
        encode_wav,
        encode_wav_adpcm,
    )

    sig = np.arange(300, dtype=np.int16)
    good = encode_wav_adpcm(sig)
    # the PCM decoder refuses ADPCM with a precise message
    with pytest.raises(AudioFormatError, match="format tag"):
        decode_wav(good)
    # and the ADPCM decoder refuses PCM
    with pytest.raises(AudioFormatError, match="IMA ADPCM"):
        decode_wav_adpcm(encode_wav(sig))
    # truncated payload: not a whole number of blocks
    bad = good[:-5]
    with pytest.raises(AudioFormatError):
        decode_wav_adpcm(bad)
    # corrupt step index in a block header
    bad2 = bytearray(good)
    data_at = bad2.index(b"data") + 8
    bad2[data_at + 2] = 120  # index byte > 88
    with pytest.raises(AudioFormatError, match="out of range"):
        decode_wav_adpcm(bytes(bad2))


def test_short_fact_chunk_is_a_domain_error():
    """A corrupt fact chunk shorter than 4 bytes must raise
    AudioFormatError, not struct.error (found by the extended fuzz
    campaign)."""
    import struct

    import numpy as np

    from databatchprotectionservice_spark.core.audiocodec import (
        AudioFormatError,
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    data = bytearray(encode_wav_adpcm(np.arange(600, dtype=np.int16)))
    pos = data.find(b"fact")
    assert pos != -1
    struct.pack_into("<I", data, pos + 4, 2)  # claim a 2-byte fact body
    with pytest.raises(AudioFormatError, match="fact chunk"):
        decode_wav_adpcm(bytes(data))


def test_adpcm_batch_paths_bit_identical_to_scalar():
    """The lockstep batch codec (one table-gather walk across every
    block of every clip) must stay byte-identical to the scalar
    reference loops — encode bytes AND decoded samples — across
    sawtooth, full-range noise, smooth, and sub-block clip shapes."""
    import numpy as np

    from databatchprotectionservice_spark.core.audiocodec import (
        decode_wav_adpcm,
        decode_wav_adpcm_batch,
        encode_wav_adpcm,
        encode_wav_adpcm_batch,
    )

    rng = np.random.default_rng(11)
    sigs = []
    for doc_id in range(12):
        n = int(rng.integers(1, 2500))
        i = np.arange(n, dtype=np.int64)
        s = ((doc_id * 31 + i * 17) % 65536 - 32768).astype(np.int16)
        if doc_id % 4 == 1:
            s = rng.integers(-32768, 32768, n).astype(np.int16)
        if doc_id % 4 == 2:
            s = (3000 * np.sin(np.arange(n) / 15)).astype(np.int16)
        sigs.append(s)
    scalar = [encode_wav_adpcm(s, rate=8000) for s in sigs]
    assert encode_wav_adpcm_batch(sigs, rate=8000) == scalar
    batch_dec = decode_wav_adpcm_batch(scalar)
    for sig, pay, (rb, db) in zip(sigs, scalar, batch_dec):
        rs, ds = decode_wav_adpcm(pay)
        assert rs == rb
        assert np.array_equal(ds, db)
        assert len(ds) == len(sig)


# ---------------------------------------------------------------------------
# G.711 log-PCM (WAVE format tags 6/7)
# ---------------------------------------------------------------------------


def test_g711_decode_tables_pin_itu_anchor_values():
    """The published G.711 extremes and the two interop traps: mu-law's
    TWO zero codes, and A-law's inverted sign-bit convention."""
    from databatchprotectionservice_spark.core.audiocodec import (
        _alaw_decode_table,
        _ulaw_decode_table,
    )

    u = _ulaw_decode_table()
    assert u[0x00] == -32124 and u[0x80] == 32124
    assert u[0xFF] == 0 and u[0x7F] == 0  # positive AND negative zero
    assert u[0x01] == -31100  # second-largest negative level
    # segment-0 ladder: codes 0xFF down to 0xF0 decode 0,8,...,120
    assert list(u[0xF0:0x100][::-1]) == list(range(0, 128, 8))

    a = _alaw_decode_table()
    assert a[0xD5] == 8 and a[0x55] == -8  # sign bit SET is positive
    assert a[0xAA] == 32256 and a[0x2A] == -32256
    # segment-1 ladder starts at the published 264 with step 16:
    # a-value 0x90 (sign|seg=1|mant=0) XOR the 0x55 toggle -> code 0xC5
    assert a[0xC5] == 264 and a[0xC5 ^ 0x80] == -264
    # every magnitude appears with both signs, 128 distinct magnitudes
    mags = sorted(set(abs(int(x)) for x in a))
    assert mags[0] == 8 and mags[-1] == 32256 and len(mags) == 128


def test_g711_decode_tables_are_symmetric_and_monotone_per_segment():
    from databatchprotectionservice_spark.core.audiocodec import (
        _alaw_decode_table,
        _ulaw_decode_table,
    )

    for lut in (_ulaw_decode_table(), _alaw_decode_table()):
        vals = lut.astype(np.int32)
        # every positive level has its mirrored negative level
        pos = sorted(int(v) for v in vals if v > 0)
        neg = sorted(-int(v) for v in vals if v < 0)
        assert pos == neg


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 300),
    ch=st.integers(1, 2),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 99),
)
def test_g711_wav_roundtrip_is_nearest_level(n, ch, law, seed):
    from databatchprotectionservice_spark.core.audiocodec import (
        _alaw_decode_table,
        _ulaw_decode_table,
        decode_wav,
        encode_wav_g711,
    )

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    rate, got_ch, got = decode_wav(encode_wav_g711(s, rate=8000, law=law))
    assert (rate, got_ch) == (8000, ch)
    assert got.shape == s.shape and got.dtype == np.int16
    lut = _ulaw_decode_table() if law == "ulaw" else _alaw_decode_table()
    levels = np.sort(np.unique(lut.astype(np.int32)))
    x = s.astype(np.int32).ravel()
    y = got.astype(np.int32).ravel()
    err = np.abs(y - x)
    # nearest-level: no OTHER level may be strictly closer
    idx = np.searchsorted(levels, x).clip(1, len(levels) - 1)
    best = np.minimum(
        np.abs(levels[idx] - x), np.abs(levels[idx - 1] - x)
    )
    assert np.array_equal(err, best)


def test_g711_encode_decode_of_exact_levels_is_identity():
    """Every decodable level encodes back to itself (quantization is
    idempotent on the quantized lattice)."""
    from databatchprotectionservice_spark.core.audiocodec import (
        _alaw_decode_table,
        _ulaw_decode_table,
        decode_wav,
        encode_wav_g711,
    )

    for law, lut in (
        ("ulaw", _ulaw_decode_table()),
        ("alaw", _alaw_decode_table()),
    ):
        levels = np.unique(lut).astype(np.int16)
        _, _, got = decode_wav(encode_wav_g711(levels, law=law))
        assert np.array_equal(got.ravel(), levels)


def test_g711_hand_assembled_wire_vector():
    """A hand-built mu-law WAV (tag 7, 8-bit, mono) decodes to the
    anchor values — the wire format itself, not just the LUT."""
    from databatchprotectionservice_spark.core.audiocodec import decode_wav

    payload = bytes([0x00, 0x80, 0xFF, 0x7F])
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, samples = decode_wav(wav)
    assert (rate, ch) == (8000, 1)
    assert list(samples.ravel()) == [-32124, 32124, 0, 0]


def test_g711_error_paths():
    from databatchprotectionservice_spark.core.audiocodec import (
        AudioFormatError,
        encode_wav_g711,
    )

    with pytest.raises(AudioFormatError, match="unknown G.711 law"):
        encode_wav_g711(np.zeros(4, dtype=np.int16), law="mp3")
    with pytest.raises(AudioFormatError, match="int16"):
        encode_wav_g711(np.zeros(4, dtype=np.int32), law="ulaw")
    # 16-bit depth declared on a G.711 tag is a layout error
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 2)
        + b"\xff\xff"
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    from databatchprotectionservice_spark.core.audiocodec import decode_wav

    with pytest.raises(AudioFormatError, match="G.711 is 8-bit"):
        decode_wav(wav)
