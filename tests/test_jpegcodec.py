"""Baseline JPEG codec tests.

Independence strategy: the roundtrip tests prove encoder/decoder
consistency; the known-answer tests prove the DECODER against inputs
the encoder never produced — a hand-assembled JPEG byte stream with a
trivial Huffman table whose expected raster is computed here with a
NAIVE O(64^2) cosine-sum IDCT (a completely separate code path from the
codec's tensordot basis-matrix IDCT).
"""

import struct

import numpy as np
import pytest

from databatchprotectionservice_spark.core.jpegcodec import (
    ZIGZAG,
    JpegFormatError,
    decode_jpeg,
    encode_jpeg,
)


def _naive_idct(coef: np.ndarray) -> np.ndarray:
    """Textbook 2-D IDCT-III, direct cosine double sum (test-only)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_constant_tiles_roundtrip_bit_exact():
    rng = np.random.RandomState(7)
    tiles = rng.randint(0, 256, size=(4, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    w, h, rgb = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (40, 32)
    assert np.array_equal(rgb, np.repeat(img[:, :, None], 3, axis=2))


def test_random_gray_roundtrip_within_one():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (40, 24)
    assert np.abs(rgb[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    # gray replicates identically to all three channels
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 2])


def test_color_444_constant_within_rounding():
    img = np.zeros((17, 19, 3), np.uint8)
    img[:] = [200, 30, 90]
    w, h, rgb = decode_jpeg(encode_jpeg(img, subsampling="444"))
    assert (w, h) == (19, 17)
    # one constant color in, one constant color out (4:4:4 keeps chroma
    # resolution; only the YCbCr<->RGB double rounding remains)
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == 1
    assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 1


def test_color_420_constant_within_rounding():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:] = [12, 230, 101]
    w, h, rgb = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert (w, h) == (16, 16)
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == 1
    assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 1


def test_color_420_smooth_gradient_tolerance():
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(x * 2) % 256, (y * 3) % 256, ((x + y)) % 256], axis=2
    ).astype(np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert (w, h) == (48, 32)
    # 2x2 chroma box-average + replication: bounded by the local chroma
    # gradient, far below any structural failure
    assert np.abs(rgb.astype(int) - img.astype(int)).mean() < 6


def test_quant_table_roundtrips_through_dqt():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    q = np.full((8, 8), 16, dtype=np.uint8)  # heavier quant -> lossy
    w, h, rgb = decode_jpeg(encode_jpeg(img, quant=q))
    err = np.abs(rgb[:, :, 0].astype(int) - img.astype(int)).max()
    assert 1 < err < 128  # lossy but sane — DQT was parsed and applied


def test_non_multiple_of_eight_crops_correctly():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (13, 9)
    assert rgb.shape == (9, 13, 3)


def _handmade_jpeg(dc_quantized: int, quant_dc: int) -> bytes:
    """Assemble an 8x8 single-component baseline JPEG byte-by-byte with
    a MINIMAL custom Huffman alphabet (not the Annex K tables the
    encoder uses): DC table {size 2 -> code '00' (2 bits)}, AC table
    {EOB -> code '0' (1 bit)}. The scan encodes one block whose only
    coefficient is DC = ``dc_quantized`` (2-bit magnitude)."""
    assert dc_quantized in (2, 3), "2-bit positive magnitudes only"
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, quant_dc everywhere (zigzag order irrelevant: uniform)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([quant_dc] * 64)
    # SOF0: 8-bit, 8x8, 1 component, no subsampling, qtable 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DHT DC table 0: one code of length 2, symbol 0x02 (size 2)
    bits = [0] * 16
    bits[1] = 1
    out += b"\xff\xc4" + struct.pack(">H", 19 + 1) + b"\x00" + bytes(bits) + bytes([0x02])
    # DHT AC table 0: one code of length 1, symbol 0x00 (EOB)
    bits = [0] * 16
    bits[0] = 1
    out += b"\xff\xc4" + struct.pack(">H", 19 + 1) + b"\x10" + bytes(bits) + bytes([0x00])
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    # entropy: DC code '00' + 2 magnitude bits + AC EOB '0', padded with 1s
    # dc=2 -> bits '10'; dc=3 -> bits '11'
    mag = {2: 0b10, 3: 0b11}[dc_quantized]
    byte = (0b00 << 6) | (mag << 4) | (0b0 << 3) | 0b111
    out += bytes([byte])
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dc,quant", [(2, 4), (3, 4), (2, 16), (3, 90)])
def test_handmade_jpeg_matches_naive_idct(dc, quant):
    """Decoder vs an independent cosine-sum IDCT on a stream the
    encoder never produced (custom Huffman alphabet, custom quant)."""
    w, h, rgb = decode_jpeg(_handmade_jpeg(dc, quant))
    assert (w, h) == (8, 8)
    coef = np.zeros((8, 8))
    coef[0, 0] = dc * quant  # dequantized DC
    expected = np.clip(np.round(_naive_idct(coef) + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(rgb[:, :, 0], expected)
    # and the closed form: DC-only block is constant DC/8 + 128
    assert np.all(rgb[:, :, 0] == np.clip(round(dc * quant / 8 + 128), 0, 255))


def test_restart_markers_reset_dc_prediction():
    """DRI/RSTn path: re-encode the entropy segments of a 4-block image
    into restart intervals of 1 MCU and check the decode is unchanged."""
    rng = np.random.RandomState(9)
    tiles = rng.randint(0, 256, size=(1, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)  # 8x32, 4 MCUs
    base = encode_jpeg(img)
    # decode each single-tile image independently to get per-MCU scans
    from databatchprotectionservice_spark.core.jpegcodec import (
        _AC_LUMA,
        _BitWriter,
        _DC_LUMA,
        _encode_blocks,
        _huff_codes,
        _plane_blocks,
    )

    sos = base.index(b"\xff\xda")
    sos_len = struct.unpack(">H", base[sos + 2 : sos + 4])[0]
    head = base[: sos]
    # insert DRI (restart every 1 MCU)
    head += b"\xff\xdd" + struct.pack(">HH", 4, 1)
    head += base[sos : sos + 2 + sos_len]
    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)
    blocks, _, _ = _plane_blocks(img.astype(np.float64))
    scan = bytearray()
    for i, blk in enumerate(blocks):
        wr = _BitWriter()
        _encode_blocks(wr, blk[None], np.ones((8, 8)), dc_l, ac_l, 0)
        scan += wr.flush()
        if i < len(blocks) - 1:
            scan += bytes([0xFF, 0xD0 + (i % 8)])
    data = bytes(head) + bytes(scan) + b"\xff\xd9"
    w, h, rgb = decode_jpeg(data)
    assert np.array_equal(rgb, np.repeat(img[:, :, None], 3, axis=2))


def test_unsupported_modes_and_garbage_raise():
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\x89PNG not a jpeg")
    # a progressive SOF2 header with no scans is truncated, not a mode
    # error (progressive decode is supported since round 8)
    data = (
        b"\xff\xd8\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(JpegFormatError):
        decode_jpeg(data)
    # arithmetic-coded SOF9 stays a documented mode error
    data9 = (
        b"\xff\xd8\xff\xc9" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(JpegFormatError, match="arithmetic"):
        decode_jpeg(data9)
    with pytest.raises(JpegFormatError):
        decode_jpeg(encode_jpeg(np.zeros((8, 8), np.uint8))[:40])


def test_zigzag_is_an_involution_free_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_gray_tiles_fast_encoder_byte_identical():
    """The vectorized constant-tile encoder must emit the EXACT bytes of
    the general encoder on the expanded raster — same headers, same
    Huffman stream, same padding and byte stuffing."""
    from databatchprotectionservice_spark.core.jpegcodec import (
        encode_jpeg_gray_tiles,
    )

    rng = np.random.RandomState(31)
    for shape in [(1, 1), (2, 7), (9, 32)]:
        tiles = rng.randint(0, 256, size=shape, dtype=np.uint8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        assert encode_jpeg_gray_tiles(tiles) == encode_jpeg(img)
    # and a worst-case stuffing input: constant 255 tiles produce long
    # runs of 1-bits in the padded stream
    tiles = np.full((3, 32), 255, dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    data = encode_jpeg_gray_tiles(tiles)
    assert data == encode_jpeg(img)
    w, h, rgb = decode_jpeg(data)
    assert np.all(rgb == 255)


def test_decoder_never_crashes_on_mutated_streams():
    """Robustness: random single-byte mutations of a valid JPEG must
    either decode (mutations in pixel data) or raise JpegFormatError /
    the documented dispatch errors — never hang, never escape with an
    arbitrary exception. (A corrupted web corpus WILL hit this path.)"""
    rng = np.random.RandomState(42)
    tiles = rng.randint(0, 256, size=(2, 4), dtype=np.uint8)
    base = bytearray(
        encode_jpeg(np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1))
    )
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            w, h, rgb = decode_jpeg(bytes(data))
            assert rgb.dtype == np.uint8 and rgb.shape[2] == 3
        except JpegFormatError:
            pass
        except (ValueError, IndexError, struct.error) as exc:
            raise AssertionError(
                f"trial {trial}: non-domain exception {type(exc).__name__}:"
                f" {exc}"
            ) from exc


def test_decoder_never_crashes_on_truncations():
    rng = np.random.RandomState(17)
    tiles = rng.randint(0, 256, size=(2, 4), dtype=np.uint8)
    base = encode_jpeg(np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1))
    for cut in range(0, len(base), 7):
        try:
            decode_jpeg(base[:cut])
        except JpegFormatError:
            pass


def test_property_random_gray_images_roundtrip_within_one():
    """Property over random shapes/content: all-ones quantization must
    reconstruct ANY grayscale image within +-1 per sample (float DCT +
    integer coefficient rounding is the only loss source)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, size=(h, w), dtype=np.uint8
        )
        ww, hh, rgb = decode_jpeg(encode_jpeg(img))
        assert (ww, hh) == (w, h)
        assert np.abs(rgb[:, :, 0].astype(int) - img.astype(int)).max() <= 1

    check()


def test_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code; some encoders pad. Insert fill bytes before every marker of a
    valid stream and require an identical decode."""
    tiles = np.arange(8, dtype=np.uint8).reshape(2, 4) * 30
    base = encode_jpeg(np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1))
    # rebuild the stream, doubling each marker's 0xFF prefix (skip the
    # entropy-coded segment, where FF bytes are data/stuffing)
    sos = base.index(b"\xff\xda")
    # keep SOI at offset 0 (the magic check is positional); double every
    # later marker prefix in the header region (no segment payload in
    # this stream contains a 0xFF byte)
    head = base[:2] + base[2:sos].replace(b"\xff", b"\xff\xff")
    padded = head + base[sos:]
    w1, h1, r1 = decode_jpeg(base)
    w2, h2, r2 = decode_jpeg(padded)
    assert (w1, h1) == (w2, h2)
    assert np.array_equal(r1, r2)


def test_multiscan_noninterleaved_decodes_identically():
    """T.81 permits sequential files that put each component in its own
    scan; the decoder must produce the SAME raster as the interleaved
    form of the same image (a decoder that silently decoded only the
    first scan would flat-line chroma at 128)."""
    rng = np.random.RandomState(41)
    for shape in [(8, 8, 3), (17, 21, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        inter = decode_jpeg(encode_jpeg(img, subsampling="444"))
        multi = decode_jpeg(
            encode_jpeg(img, subsampling="444", interleaved=False)
        )
        assert inter[:2] == multi[:2]
        assert np.array_equal(inter[2], multi[2])
    # constant color: exact through both layouts
    img = np.zeros((16, 8, 3), np.uint8)
    img[:] = [200, 30, 90]
    w, h, rgb = decode_jpeg(
        encode_jpeg(img, subsampling="444", interleaved=False)
    )
    assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 1


def test_partial_component_coverage_raises():
    """A truncated multi-scan file whose later scans are missing must
    raise — never return a raster with silently-zero components."""
    data = encode_jpeg(
        np.full((8, 8, 3), 77, dtype=np.uint8),
        subsampling="444",
        interleaved=False,
    )
    # cut after the FIRST scan: find the second SOS and truncate there,
    # appending EOI
    first = data.index(b"\xff\xda")
    second = data.index(b"\xff\xda", first + 2)
    with pytest.raises(JpegFormatError, match="never received a scan"):
        decode_jpeg(data[:second] + b"\xff\xd9")


def test_non_integer_sampling_ratio_raises_domain_error():
    """Sampling factors 3x1 vs 2x1 are structurally legal but need
    non-integer replication — must raise JpegFormatError, not escape as
    a numpy broadcast ValueError."""
    base = encode_jpeg(
        np.full((8, 8, 3), 50, dtype=np.uint8), subsampling="444"
    )
    sof = base.index(b"\xff\xc0")
    mut = bytearray(base)
    mut[sof + 11] = 0x31  # Y: h=3, v=1 (was 0x11); Cb/Cr stay 1x1... 
    # make chroma 2x1 so the ratio 3:2 is non-integer
    mut[sof + 14] = 0x21
    with pytest.raises(JpegFormatError):
        decode_jpeg(bytes(mut))


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — round 8
# ---------------------------------------------------------------------------

from databatchprotectionservice_spark.core.jpegcodec import (  # noqa: E402
    encode_jpeg_gray_tiles,
    encode_jpeg_gray_tiles_progressive,
    encode_jpeg_progressive,
)


def test_progressive_equals_sequential_random_content():
    """The six-scan progression re-slices the SAME quantized
    coefficients by band and bit plane, so with identical tables the
    progressive decode must be BIT-IDENTICAL to the sequential one."""
    rng = np.random.RandomState(11)
    qt = np.clip(np.arange(64).reshape(8, 8) // 4 + 1, 1, 255).astype(np.uint8)
    for shape in [(8, 8), (13, 21), (40, 40)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        seq = decode_jpeg(encode_jpeg(img, quant=qt))[2]
        for split in (2, 6, 63):
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quant=qt, spectral_split=split)
            )[2]
            assert np.array_equal(seq, prog), (shape, split)


def test_progressive_tile_fast_encoder_byte_identical():
    """The vectorized constant-tile progressive encoder must emit the
    EXACT bytes of the general progressive encoder on the expanded
    raster — same scans, same EOB-run chunking, same padding."""
    rng = np.random.RandomState(3)
    tiles = rng.randint(0, 256, size=(4, 9), dtype=np.uint8)
    raster = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    fast = encode_jpeg_gray_tiles_progressive(tiles)
    assert fast == encode_jpeg_progressive(raster)
    assert np.array_equal(decode_jpeg(fast)[2][:, :, 0], raster)


def _mini_dht(tc, th, bits, values):
    payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _prog_headers():
    """SOI + DQT(all ones) + SOF2 8x8 grayscale, shared by the
    hand-assembled vectors."""
    q = bytes([0]) + bytes(64)  # pq/tq=0 then 64 zigzag entries
    q = bytes([0]) + bytes([1] * 64)
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(q)) + q
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    return out


def _sos1(td_ta, ss, se, ah, al):
    return (
        b"\xff\xda"
        + struct.pack(">HB", 8, 1)
        + bytes([1, td_ta, ss, se, (ah << 4) | al])
    )


def test_hand_assembled_progressive_dc_vector():
    """HAND-ASSEMBLED successive-approximation DC vector (derivation in
    comments; the encoder never produced these bytes).

    Target: single 8x8 block, quant all-ones, DC coefficient 7
    (=> constant raster round(7/8 + 128) = 129).

    DC Huffman table: bits=[0,1,5,...] (Annex K DC luma canonical):
      size 0 -> '00', size 1 -> '010', size 2 -> '011', size 3 -> '100'
    Scan 1 (Ss=0 Se=0 Ah=0 Al=1): diff = 7>>1 = 3 -> size 2 code '011'
      + raw '11' = 01111, pad '111' -> byte 0x7F.
    Scan 2 (AC 1..63, Ah=0 Al=0) with a 1-entry AC table
      {EOB0 -> '0'}: one '0' bit, pad -> 0x7F.
    Scan 3 (DC refinement Ah=1 Al=0): raw bit 7&1=1, pad -> 0xFF,
      which must be STUFFED to FF 00 inside entropy data."""
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [1] + [0] * 15
    ac_vals = [0x00]
    data = (
        _prog_headers()
        + _mini_dht(0, 0, dc_bits, dc_vals)
        + _mini_dht(1, 0, ac_bits, ac_vals)
        + _sos1(0x00, 0, 0, 0, 1)
        + b"\x7f"
        + _sos1(0x10, 1, 63, 0, 0)
        + b"\x7f"
        + _sos1(0x00, 0, 0, 1, 0)
        + b"\xff\x00"
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg(data)
    assert (w, h) == (8, 8)
    assert np.all(rgb == 129)


def test_hand_assembled_progressive_ac_refinement_vector():
    """HAND-ASSEMBLED spectral-selection + AC-refinement vector.

    Target: single block, DC=0, AC coefficient +5 at zigzag index 1.

    AC Huffman table {EOB0 -> '00', (r=0,s=2) -> '01'} (two 2-bit
    codes, canonical).
    Scan 1 (DC first, Al=0): size-0 code '00' (diff 0), pad -> 0x3F
      using DC table {0 -> '00', ...} (Annex K shape).
    Scan 2 (AC 1..63 first, Ah=0 Al=1): value = trunc(5/2) = 2 ->
      (run 0, size 2) code '01' + raw '10', then EOB0 '00':
      011000 + pad '11' -> 0x63.  Decoder stores 2<<1 = 4.
    Scan 3 (AC 1..63 refinement, Ah=1 Al=0): no newly-significant
      coefficient: EOB0 '00' starts the EOB run, then the nonzero
      coefficient's correction bit '1' appends: 001 + pad -> 0x3F.
      Decoder: 4 has bit0 clear, coefficient positive -> 4+1 = 5.

    Expected raster: the naive-IDCT of coef[zigzag 1]=5 (natural
    position (0,1)), computed here by the independent cosine sum."""
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [0, 2] + [0] * 14
    ac_vals = [0x00, 0x02]
    data = (
        _prog_headers()
        + _mini_dht(0, 0, dc_bits, dc_vals)
        + _mini_dht(1, 0, ac_bits, ac_vals)
        + _sos1(0x00, 0, 0, 0, 0)
        + b"\x3f"
        + _sos1(0x10, 1, 63, 0, 1)
        + b"\x63"
        + _sos1(0x10, 1, 63, 1, 0)
        + b"\x3f"
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg(data)
    coef = np.zeros((8, 8))
    coef[0, 1] = 5.0
    want = np.clip(np.round(_naive_idct(coef) + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(rgb[:, :, 0], want)


def test_progressive_ac_scan_must_be_single_component():
    """T.81 G: AC progression scans carry exactly one component."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg_progressive(img))
    # patch the first AC SOS (1 component) into claiming 2 components
    # would change lengths; instead decode a crafted color progressive
    # header with a 2-component AC scan
    q = bytes([0]) + bytes([1] * 64)
    bad = b"\xff\xd8"
    bad += b"\xff\xdb" + struct.pack(">H", 2 + len(q)) + q
    bad += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
    bad += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    bad += _mini_dht(1, 0, [1] + [0] * 15, [0x00])
    bad += (
        b"\xff\xda"
        + struct.pack(">HB", 10, 2)
        + bytes([1, 0x00, 2, 0x00, 1, 63, 0])
    )
    bad += b"\x00\xff\xd9"
    with pytest.raises(JpegFormatError, match="single-component"):
        decode_jpeg(bytes(bad))


def test_multi_component_subset_sequential_scan_decodes():
    """Sequential SUBSET scans (a 2-of-3-component interleaved SOS) —
    the r7 seam — now decode: compose Y as one scan and Cb+Cr as one
    interleaved subset scan, and require the result to equal the
    fully-interleaved encoding of the same image."""
    from databatchprotectionservice_spark.core.jpegcodec import (
        _AC_CHROMA,
        _AC_LUMA,
        _BitWriter,
        _DC_CHROMA,
        _DC_LUMA,
        _dht_segment,
        _dqt_segment,
        _encode_blocks,
        _huff_codes,
        _plane_blocks,
        _rgb_to_ycbcr,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    q = np.ones((8, 8), dtype=np.int32)
    y, cb, cr = _rgb_to_ycbcr(img)
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, q)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    qf = q.astype(np.float64)
    # scan 1: Y alone
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    wr = _BitWriter()
    yb, _, _ = _plane_blocks(y)
    _encode_blocks(wr, yb, qf, _huff_codes(*_DC_LUMA), _huff_codes(*_AC_LUMA), 0)
    out += wr.flush()
    # scan 2: Cb + Cr INTERLEAVED subset — per MCU: one Cb block then
    # one Cr block (4:4:4, so one block each), separate DC predictors
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 10, 2)
        + bytes([2, 0x11, 3, 0x11, 0, 63, 0])
    )
    wr = _BitWriter()
    cbb, _, _ = _plane_blocks(cb)
    crb, _, _ = _plane_blocks(cr)
    dc_c, ac_c = _huff_codes(*_DC_CHROMA), _huff_codes(*_AC_CHROMA)
    pred_cb = pred_cr = 0
    for m in range(cbb.shape[0]):
        pred_cb = _encode_blocks(wr, cbb[m : m + 1], qf, dc_c, ac_c, pred_cb)
        pred_cr = _encode_blocks(wr, crb[m : m + 1], qf, dc_c, ac_c, pred_cr)
    out += wr.flush()
    out += b"\xff\xd9"
    got = decode_jpeg(bytes(out))[2]
    want = decode_jpeg(encode_jpeg(img))[2]
    assert np.array_equal(got, want)


def test_progressive_decoder_never_crashes_on_mutations():
    """The 300-trial mutation battery, progressive edition: every
    single-byte mutation of a valid SOF2 stream must decode or raise
    the domain error — never crash, never hang."""
    rng = np.random.RandomState(23)
    tiles = rng.randint(0, 256, size=(2, 4), dtype=np.uint8)
    base = bytearray(encode_jpeg_gray_tiles_progressive(tiles))
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            w, h, rgb = decode_jpeg(bytes(data))
            assert rgb.dtype == np.uint8 and rgb.shape[2] == 3
        except JpegFormatError:
            pass
        except (ValueError, IndexError, struct.error) as exc:
            raise AssertionError(
                f"trial {trial}: non-domain exception {type(exc).__name__}:"
                f" {exc}"
            ) from exc


def test_progressive_decoder_never_crashes_on_truncations():
    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    base = encode_jpeg_progressive(img)
    for cut in range(0, len(base), 5):
        try:
            decode_jpeg(base[:cut])
        except JpegFormatError:
            pass


def test_color_progressive_equals_sequential():
    """COLOR progressive (the shape every real web progressive JPEG
    has): interleaved 3-component DC first + refinement scans and
    per-component full-band AC scans must decode identically to the
    sequential 4:4:4 encoding of the same image."""
    rng = np.random.RandomState(31)
    qt = np.clip(np.arange(64).reshape(8, 8) // 4 + 1, 1, 255).astype(np.uint8)
    for shape in [(8, 8, 3), (16, 24, 3), (13, 21, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        seq = decode_jpeg(encode_jpeg(img, quant=qt, subsampling="444"))[2]
        prog = decode_jpeg(encode_jpeg_progressive(img, quant=qt))[2]
        assert np.array_equal(seq, prog), shape


def test_single_component_scan_ignores_frame_sampling_factors():
    """T.81 A.2.2: EVERY 1-component scan is non-interleaved, even when
    the frame header declares sampling factors > 1 (real files exist —
    e.g. jpegtran -grayscale keeps the source's 4:2:0 luma factors).
    Construct one by patching the SOF0 h/v byte of a grayscale encode
    from 1x1 to 2x2: the decode must be IDENTICAL, not a Huffman error
    from assuming 4 data units per MCU."""
    import numpy as np

    from databatchprotectionservice_spark.core.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(3)
    # dims deliberately not multiples of 8 or 16 to exercise geometry
    img = rng.integers(0, 256, (19, 21), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    at = bytes(data).index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) id(1) hv(1) tq(1)
    assert data[at + 11] == 0x11
    data[at + 11] = 0x22
    w1, h1, rgb1 = decode_jpeg(bytes(data))
    w0, h0, rgb0 = decode_jpeg(encode_jpeg(img))
    assert (w1, h1) == (w0, h0) == (21, 19)
    assert np.array_equal(rgb1, rgb0)
