"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT).

The majority format of any real web-scraped multimodal corpus — VERDICT
r6's top extension ask. Everything here implements the PUBLIC spec
(ITU-T T.81 / ISO 10918-1, JFIF per ITU-T T.871) with stdlib + numpy:

* **Decoder** — baseline sequential DCT, 8-bit samples: marker walk
  (APPn/COM skipped, DQT/DHT/DRI/SOF0/SOS parsed), canonical Huffman
  tables built from the stream's own DHT segments (16-bit peek lookup
  table, O(1) per symbol), entropy-coded segment destuffing (FF 00) and
  restart-marker handling, DC prediction + EXTEND, dequantize, 2-D
  IDCT vectorized over ALL blocks of a component at once (two
  tensordots against the 8x8 DCT-II basis), plane assembly, chroma
  upsample by sample-replication for any (h, v) factors (covers 4:2:0,
  4:2:2, 4:4:4), JFIF YCbCr->RGB. Both sequential scan layouts decode:
  the fully interleaved single scan AND multi-scan non-interleaved
  files (one component per SOS, with DHT/DQT updates between scans);
  legal 0xFF fill bytes before markers are accepted. Grayscale
  replicates to RGB to keep the uniform ``(w, h, (h, w, 3) uint8)``
  contract of ``core/imagecodec.py``. Progressive (SOF2), arithmetic
  coding, 12-bit, hierarchical, and multi-component SUBSET scans raise
  ``JpegFormatError`` with a precise message — the documented seam.
* **Encoder** — fixture/test construction (like the PPM/BMP/PNG/WAV/Y4M
  encoders, not a Spark sink): grayscale or YCbCr 4:4:4 / 4:2:0,
  caller-supplied quantization tables (default all-ones, i.e. the
  maximum-fidelity baseline stream), Annex K "typical" Huffman tables
  written into DHT so any spec-compliant decoder can read the output.

Exactness note (what makes JPEG oracle-checkable): with all-ones quant
tables, a block that is CONSTANT decodes bit-exactly — its forward DCT
is a lone DC coefficient ``8*(v-128)`` (an exact integer), every AC
coefficient is 0, and the IDCT of a DC-only block is the constant
``DC/8``. The ``multimodal_decode_real`` JPEG fixture exploits this by
tiling each payload byte as an 8x8 constant block, so the decoded
raster is a closed-form function of the text that DuckDB recomputes.
Non-constant blocks round-trip within +-1 per sample (float DCT +
integer coefficient rounding), matching any conformant codec.
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import DBPSInvalidInputError


class JpegFormatError(DBPSInvalidInputError):
    """Raised for malformed or unsupported JPEG bytes."""


# ---------------------------------------------------------------------------
# constants: zigzag order, DCT basis, Annex K Huffman tables
# ---------------------------------------------------------------------------

#: corrupted-header allocation guard for the decoder: a mutated SOF can
#: declare up to 65535x65535 px; cap total pixels so garbage headers
#: raise instead of allocating gigabytes of coefficient storage
DECODE_MAX_PIXELS = 1 << 26  # 67 Mpx — beyond any sane training image

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)  # fmt: skip


def _dct_basis() -> np.ndarray:
    """8x8 DCT-II basis C with C[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
    forward DCT of block f is C @ f @ C.T, inverse is C.T @ F @ C."""
    u = np.arange(8).reshape(8, 1).astype(np.float64)
    x = np.arange(8).reshape(1, 8).astype(np.float64)
    c = np.cos((2.0 * x + 1.0) * u * np.pi / 16.0) / 2.0
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_basis()

# ITU-T T.81 Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
# Written into the encoder's DHT segments; the decoder always uses the
# stream's own tables, so these constants only shape encoder output.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)  # fmt: skip
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)  # fmt: skip


# ---------------------------------------------------------------------------
# canonical Huffman (T.81 Annex C): BITS/HUFFVAL -> codes / decode table
# ---------------------------------------------------------------------------


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), codes assigned canonically by length."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """16-bit-peek lookup decoder: one flat Python list with
    ``(length << 8) | symbol`` packed per peek value (scalar list
    indexing beats a numpy fancy-row per symbol ~5x in the decode
    loop). Length 0 marks an invalid prefix."""

    __slots__ = ("lut",)

    #: (bits, values) -> built LUT. Real corpora overwhelmingly reuse
    #: the Annex K tables, so building the 65k-entry list once per
    #: distinct table (not once per image) matters: construction is
    #: ~2 ms, a DC-only image decode is ~3 ms.
    _cache: dict = {}

    def __init__(self, bits: list[int], values: list[int]):
        key = (tuple(bits), tuple(values))
        cached = self._cache.get(key)
        if cached is not None:
            self.lut = cached
            return
        if len(self._cache) >= 64:
            # a corpus of adversarial/odd encoders could mint unlimited
            # distinct tables; 64 x ~512 KB bounds a long-lived worker
            self._cache.clear()
        lut = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                lut[lo:hi] = (length << 8) | values[k]
                code += 1
                k += 1
            code <<= 1
        self.lut = lut.tolist()
        self._cache[key] = self.lut


class _BitReader:
    """MSB-first bit reader over a destuffed entropy-coded segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        # pad so a 16-bit peek near the end never indexes out of range;
        # 0xFF padding makes runaway reads hit an invalid prefix fast
        self.data = data + b"\xff\xff\xff"
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = int.from_bytes(self.data[byte : byte + 3], "big")
        return (chunk >> (8 - (self.pos & 7))) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:
            # legal baseline magnitudes are <= 11 (DC) / 10 (AC) bits; a
            # larger size can only come from a corrupted DHT
            raise JpegFormatError(f"corrupt JPEG magnitude size {n}")
        if self.pos + n > self.nbits:
            raise JpegFormatError("JPEG entropy stream truncated")
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v

    def decode(self, table: _HuffDecoder) -> int:
        packed = table.lut[self.peek16()]
        length = packed >> 8
        if length == 0 or self.pos + length > self.nbits:
            raise JpegFormatError("invalid JPEG Huffman code")
        self.pos += length
        return packed & 0xFF


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw ``size``-bit value to its signed
    coefficient (values with a 0 MSB are negative)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JPEG bytes -> (width, height, (h, w, 3) uint8 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (precision, h, w, comps)
    i = 2
    n = len(data)
    while i < n:
        if i + 2 > n:
            raise JpegFormatError("truncated JPEG: no EOI")
        if data[i] != 0xFF:
            raise JpegFormatError(f"expected marker at offset {i}")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
        # marker code — skip them (some encoders/transcoders pad)
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 2 > n:
            raise JpegFormatError("truncated JPEG: no EOI")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RST
            continue
        if i + 2 > n:
            raise JpegFormatError("truncated marker segment")
        seglen = struct.unpack(">H", data[i : i + 2])[0]
        if seglen < 2 or i + seglen > n:
            raise JpegFormatError("truncated JPEG marker segment")
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quantization tables unsupported")
                table = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                if table.size != 64:
                    raise JpegFormatError("truncated DQT")
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = table  # stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                if len(bits) != 16:
                    raise JpegFormatError("truncated DHT")
                nv = sum(bits)
                values = list(seg[j + 17 : j + 17 + nv])
                if len(values) != nv:
                    raise JpegFormatError("truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, values)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegFormatError("truncated DRI")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (progressive)
            if len(seg) < 6:
                raise JpegFormatError("truncated SOF")
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise JpegFormatError(f"{precision}-bit JPEG unsupported (8 only)")
            if not 1 <= nc <= 4 or len(seg) < 6 + 3 * nc:
                raise JpegFormatError("bad SOF component list")
            if h == 0 or w == 0 or h * w > DECODE_MAX_PIXELS:
                raise JpegFormatError(
                    f"JPEG dimensions {w}x{h} out of range (cap "
                    f"{DECODE_MAX_PIXELS} px guards corrupted headers "
                    "from becoming allocation bombs)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 4 and 1 <= vf <= 4):
                    raise JpegFormatError(f"bad sampling factors {hf}x{vf}")
                comps.append({"id": cid, "h": hf, "v": vf, "tq": tq})
            # replication upsampling needs integer factor ratios; a
            # legal-but-exotic 3:2 ratio would otherwise escape as a
            # raw numpy broadcast error deep in plane assembly
            hm = max(c["h"] for c in comps)
            vm = max(c["v"] for c in comps)
            for c in comps:
                if hm % c["h"] or vm % c["v"]:
                    raise JpegFormatError(
                        f"non-integer sampling ratio {c['h']}x{c['v']} "
                        f"vs {hm}x{vm} unsupported"
                    )
            frame = (h, w, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"JPEG SOF{marker - 0xC0}: sequential and progressive "
                "Huffman DCT are implemented; arithmetic coding, lossless "
                "and hierarchical modes need an external codec"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            if not seg:
                raise JpegFormatError("truncated SOS")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise JpegFormatError("truncated SOS component list")
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 0x0F))
            # progression parameters (T.81 B.2.3): spectral selection
            # Ss..Se, successive-approximation high/low Ah/Al.  In a
            # sequential frame they are fixed (0, 63, 0, 0) and ignored.
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            # decode this scan's entropy data in place and continue the
            # marker walk: T.81 files may split components (sequential
            # non-interleaved) or spectral bands / coefficient bits
            # (progressive) over several scans, with DHT/DQT updates
            # between them
            if frame[3]:
                i = _decode_progressive_scan(
                    data, i + seglen, frame, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval,
                )
            else:
                i = _decode_one_scan(
                    data, i + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            continue
        # APPn / COM / anything else: skip
        i += seglen
    if frame is None:
        raise JpegFormatError("no SOF marker")
    comps = frame[2]
    missing = [c["id"] for c in comps if not c.get("scanned")]
    if len(missing) == len(comps):
        raise JpegFormatError("no SOS marker — empty JPEG")
    if missing:
        raise JpegFormatError(
            f"components {missing} never received a scan"
        )
    return _assemble(frame, qt)


def _read_block(reader, dct, act, pred, cid) -> np.ndarray:
    """Decode one data unit (8x8 coefficient block) from the reader."""
    zz = ZIGZAG
    block = np.zeros(64, dtype=np.int32)
    s = reader.decode(dct)
    diff = _extend(reader.read(s), s)
    pred[cid] += diff
    block[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegFormatError("AC coefficient overflow")
        block[zz[k]] = _extend(reader.read(s), s)
        k += 1
    return block.reshape(8, 8)


def _decode_one_scan(
    data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
) -> int:
    """Decode one SOS's entropy data into the components' coefficient
    stores and return the stream offset of the next marker. Supports
    interleaved scans of ANY component subset (T.81 A.2.3: the MCU grid
    is always derived from the FRAME's max sampling factors, whether the
    scan carries all components or a subset) and single-component
    non-interleaved scans — together, every sequential layout T.81
    allows."""
    if frame is None:
        raise JpegFormatError("SOS before SOF")
    h, w, comps, _prog = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # entropy-coded segments: destuff FF00 -> FF, split at RST markers
    segments, end = _entropy_segments(data, pos)
    order = _resolve_scan_components(frame, scan, mcux, mcuy)
    for c, _, _ in order:
        if c["tq"] not in qt:
            raise JpegFormatError(f"missing quantization table {c['tq']}")
    tables = []
    for c, td, ta in order:
        dct = huff_dc.get(td)
        act = huff_ac.get(ta)
        if dct is None or act is None:
            raise JpegFormatError("scan references missing Huffman table")
        c["scanned"] = True  # coverage check runs at EOI
        tables.append((c, dct, act))
    if len(order) == 1:
        # NON-INTERLEAVED scan (T.81 A.2.2): EVERY 1-component scan,
        # even when the frame declares sampling factors > 1 (factors
        # cancel against fmax, one data unit per MCU — libjpeg
        # behavior on e.g. jpegtran -grayscale output keeping 4:2:0
        # luma factors).  Data units are the component's own blocks in
        # raster order over its true dimensions
        # ceil(ceil(dim * f/fmax) / 8); restart intervals count
        # data units
        c, dct, act = tables[0]
        bw = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        bh = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
        n_units = bw * bh
        per_seg = restart_interval if restart_interval else n_units
        seg_idx = 0
        reader = _BitReader(segments[0]) if segments else None
        pred = {c["id"]: 0}
        for u in range(n_units):
            if u % per_seg == 0 and u > 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegFormatError("missing restart segment")
                reader = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0}
            if reader is None:
                raise JpegFormatError("JPEG has no entropy data")
            r, cc = divmod(u, bw)
            c["coef"][r * c["bx"] + cc] = _read_block(
                reader, dct, act, pred, c["id"]
            )
        return end
    # interleaved scan — all components or any subset; the MCU grid and
    # per-MCU block structure come from the scan's own component list
    n_mcu = mcux * mcuy
    mcu_per_seg = restart_interval if restart_interval else n_mcu
    seg_idx = 0
    reader = _BitReader(segments[0]) if segments else None
    pred = {c["id"]: 0 for c, _, _ in order}
    for m in range(n_mcu):
        if m % mcu_per_seg == 0 and m > 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise JpegFormatError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c, _, _ in order}
        my, mx = divmod(m, mcux)
        if reader is None:
            raise JpegFormatError("JPEG has no entropy data")
        for c, dct, act in tables:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    by = my * c["v"] + v
                    bx = mx * c["h"] + hh
                    c["coef"][by * c["bx"] + bx] = _read_block(
                        reader, dct, act, pred, c["id"]
                    )
    return end


def _resolve_scan_components(frame, scan, mcux, mcuy):
    """Map a scan's component ids to frame components, validating
    uniqueness, and allocate coefficient stores on first touch (sized
    on the interleaved grid — a superset of any non-interleaved
    grid)."""
    comps = frame[2]
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise JpegFormatError(f"scan references unknown component {cs}")
        order.append((c, td, ta))
    if len({id(c) for c, _, _ in order}) != len(order):
        raise JpegFormatError("duplicate component in scan")
    for c in comps:
        if "coef" not in c:
            c["bx"] = mcux * c["h"]
            c["by"] = mcuy * c["v"]
            # int32: coefficients are exact integers (11-bit magnitudes
            # x quantizer), and progressive successive approximation
            # needs two's-complement bitwise refinement
            c["coef"] = np.zeros((c["by"] * c["bx"], 8, 8), dtype=np.int32)
    return order


def _comp_block_dims(frame, c):
    """A component's true (non-interleaved) block-grid width/height:
    ceil(ceil(dim * f / fmax) / 8) per T.81 A.2.2."""
    h, w, comps = frame[0], frame[1], frame[2]
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    bw = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
    bh = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
    return bw, bh


def _decode_progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval,
) -> int:
    """Decode one PROGRESSIVE scan (T.81 G.2): spectral selection
    (Ss..Se bands) x successive approximation (Ah/Al bit planes) over
    the shared per-component coefficient stores; the marker walk calls
    this once per SOS and ``_assemble`` runs the one IDCT at EOI.

    Four scan kinds, dispatched on (Ss, Ah):

    * DC first (Ss=0, Ah=0): sequential DC decode, coefficient stored
      ``diff << Al``; interleaved (any subset) or single-component.
    * DC refinement (Ss=0, Ah>0): one raw bit per block ORed in at Al.
    * AC first (Ss>0, Ah=0): run-length/size decode with EOB RUNS
      (EOBn codes: r < 15, s = 0 -> skip ``(1 << r) - 1 + read(r)``
      additional blocks in the band); single-component only per T.81.
    * AC refinement (Ss>0, Ah>0): the G.1.2.3 correction procedure —
      every already-nonzero coefficient consumes a correction bit as
      the band is traversed, newly-significant coefficients arrive as
      ``+-1 << Al``, and EOB runs still append correction bits.

    Restart intervals reset DC predictors AND the EOB run, segment
    boundaries exactly as in sequential scans."""
    if not 0 <= al <= 13 or (ah and ah != al + 1):
        raise JpegFormatError(f"bad successive approximation Ah={ah} Al={al}")
    h, w, comps = frame[0], frame[1], frame[2]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    segments, end = _entropy_segments(data, pos)
    order = _resolve_scan_components(frame, scan, mcux, mcuy)
    zz = ZIGZAG

    if ss == 0:  # DC scan
        if se != 0:
            raise JpegFormatError("progressive DC scan must have Se=0")
        tables = []
        for c, td, ta in order:
            dct = None
            if ah == 0:
                dct = huff_dc.get(td)
                if dct is None:
                    raise JpegFormatError("scan references missing Huffman table")
            c["scanned"] = True
            tables.append((c, dct))

        if (
            ah > 0
            and len(comps) == 1
            and comps[0]["h"] == 1
            and comps[0]["v"] == 1
            and not restart_interval
            and len(segments) == 1
        ):
            # vectorized fast path: a grayscale DC refinement scan is
            # exactly one raw bit per block in raster order — unpack
            # the whole segment at once instead of a per-block Python
            # bit-reader loop (every real progressive file has one of
            # these scans; for DC-only fixtures it is decode-hot)
            c = comps[0]
            n_units = mcux * mcuy
            bits = np.unpackbits(np.frombuffer(segments[0], dtype=np.uint8))
            if bits.size < n_units:
                raise JpegFormatError("JPEG entropy stream truncated")
            c["coef"][:n_units, 0, 0] |= (
                bits[:n_units].astype(np.int32) << al
            )
            return end

        def dc_unit(reader, c, dct, pred, idx):
            blk = c["coef"][idx].reshape(64)
            if ah == 0:
                s = reader.decode(dct)
                pred[c["id"]] += _extend(reader.read(s), s)
                blk[0] = pred[c["id"]] << al
            else:
                if reader.read(1):
                    blk[0] |= 1 << al

        if len(order) == 1:
            # non-interleaved DC scan over the component's own grid —
            # T.81 A.2.2: every 1-component scan, regardless of the
            # frame's declared sampling factors (see the sequential
            # path)
            c, dct = tables[0]
            bw, bh = _comp_block_dims(frame, c)
            n_units = bw * bh
            per_seg = restart_interval if restart_interval else n_units
            seg_idx, reader = 0, _BitReader(segments[0]) if segments else None
            pred = {c["id"]: 0}
            for u in range(n_units):
                if u and u % per_seg == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise JpegFormatError("missing restart segment")
                    reader = _BitReader(segments[seg_idx])
                    pred = {c["id"]: 0}
                if reader is None:
                    raise JpegFormatError("JPEG has no entropy data")
                r, cc = divmod(u, bw)
                dc_unit(reader, c, dct, pred, r * c["bx"] + cc)
            return end
        n_mcu = mcux * mcuy
        per_seg = restart_interval if restart_interval else n_mcu
        seg_idx, reader = 0, _BitReader(segments[0]) if segments else None
        pred = {c["id"]: 0 for c, _ in tables}
        for m in range(n_mcu):
            if m and m % per_seg == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise JpegFormatError("missing restart segment")
                reader = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c, _ in tables}
            if reader is None:
                raise JpegFormatError("JPEG has no entropy data")
            my, mx = divmod(m, mcux)
            for c, dct in tables:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        idx = (my * c["v"] + v) * c["bx"] + mx * c["h"] + hh
                        dc_unit(reader, c, dct, pred, idx)
        return end

    # AC scan: single component, band Ss..Se
    if len(order) != 1:
        raise JpegFormatError("progressive AC scan must be single-component")
    if not ss <= se <= 63:
        raise JpegFormatError(f"bad spectral band {ss}..{se}")
    c, td, ta = order[0]
    act = huff_ac.get(ta)
    if act is None:
        raise JpegFormatError("scan references missing Huffman table")
    bw, bh = _comp_block_dims(frame, c)
    n_units = bw * bh
    per_seg = restart_interval if restart_interval else n_units
    seg_idx = 0
    reader = _BitReader(segments[0]) if segments else None
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(blk, k):
        """Append this coefficient's correction bit (G.1.2.3)."""
        if reader.read(1) and not blk[zz[k]] & p1:
            blk[zz[k]] += p1 if blk[zz[k]] >= 0 else m1

    for u in range(n_units):
        if u and u % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise JpegFormatError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            eobrun = 0
        if reader is None:
            raise JpegFormatError("JPEG has no entropy data")
        r_, cc = divmod(u, bw)
        blk = c["coef"][r_ * c["bx"] + cc].reshape(64)
        if ah == 0:  # AC first scan
            if eobrun:
                eobrun -= 1
                continue  # nothing in this block's band
            k = ss
            while k <= se:
                rs = reader.decode(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read(r)
                    break
                k += r
                if k > se:
                    raise JpegFormatError("AC coefficient overflow")
                blk[zz[k]] = _extend(reader.read(s), s) << al
                k += 1
            continue
        # AC refinement scan
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(act)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read(r)
                        break
                    # r == 15: run of 16 zero-HISTORY coefficients
                else:
                    if s != 1:
                        raise JpegFormatError(
                            "AC refinement magnitude must be 1 bit"
                        )
                    newval = p1 if reader.read(1) else m1
                # advance over r zero-history coefficients, refining
                # every nonzero one passed on the way
                while k <= se:
                    if blk[zz[k]]:
                        refine_nonzero(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[zz[k]] = newval
                k += 1
        if eobrun:
            # inside an EOB run: remaining nonzero band coefficients
            # still receive correction bits.  Only nonzero-history
            # positions consume bits, and refinement cannot create one
            # here, so jump straight to them (vectorized nonzero scan
            # instead of 63 scalar reads per block — the hot path for
            # sparse-AC corpora where whole bands ride EOB runs)
            band_pos = zz[k : se + 1]
            for p in band_pos[np.nonzero(blk[band_pos])[0]]:
                if reader.read(1) and not blk[p] & p1:
                    blk[p] += p1 if blk[p] >= 0 else m1
            eobrun -= 1
    return end


def _assemble(frame, qt):
    """Dequantize + IDCT every component's coefficient store and build
    the (h, w, 3) RGB raster."""
    h, w, comps, _prog = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["tq"] not in qt:
            raise JpegFormatError(f"missing quantization table {c['tq']}")
    # dequantize + IDCT all blocks of each component at once
    planes = []
    for c in comps:
        q = qt[c["tq"]].astype(np.float64)
        f = c["coef"] * q[None, :, :]
        # spatial = C.T @ F @ C for every block: two tensordots
        sp = np.tensordot(np.tensordot(f, _C, axes=([1], [0])), _C, axes=([1], [0]))
        sp = np.clip(np.round(sp + 128.0), 0, 255).astype(np.uint8)
        # assemble (by*8, bx*8) plane from the block grid
        plane = (
            sp.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
        # replicate-upsample to full frame resolution
        if c["h"] != hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=2)
    elif len(planes) == 3:
        rgb = _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    else:
        raise JpegFormatError(f"{len(planes)}-component JPEG unsupported")
    return w, h, rgb


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Collect destuffed entropy segments from ``pos`` to EOI; RSTn
    markers delimit segments.  Jumps between 0xFF positions with one
    vectorized scan instead of walking every byte — progressive files
    re-enter here once per SOS (six+ times), so this is decode-hot."""
    n = len(data)
    ffs = np.nonzero(np.frombuffer(data, dtype=np.uint8)[pos:] == 0xFF)[0]
    segments: list[bytes] = []
    cur = bytearray()
    start = pos
    for f in ffs:
        i = pos + int(f)
        if i < start:  # consumed by a previous FF-pair
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF: keep the FF, drop the 00
            cur += data[start : i + 1]
            start = i + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            cur += data[start:i]
            segments.append(bytes(cur))
            cur = bytearray()
            start = i + 2
        else:  # EOI / fill bytes / next marker: scan ends at this FF
            cur += data[start:i]
            segments.append(bytes(cur))
            return segments, i
    cur += data[start:]
    segments.append(bytes(cur))
    return segments, n


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    """JFIF (ITU-T T.871) inverse color transform, rounded + clipped."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures/tests only)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """coefficient -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    raw = v if v > 0 else v + (1 << size) - 1
    return size, raw


def _encode_blocks(
    wr: _BitWriter,
    blocks: np.ndarray,
    q: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    """Quantize + entropy-code a (n, 8, 8) float block stack in order."""
    zz = ZIGZAG
    for blk in blocks:
        f = _C @ (blk - 128.0) @ _C.T
        coef = np.round(f / q).astype(np.int64)
        seq = coef.reshape(64)[zz]  # zigzag scan order
        dc = int(seq[0])
        diff = dc - pred
        pred = dc
        size, raw = _magnitude(diff)
        code, length = dc_codes[size]
        wr.write(code, length)
        if size:
            wr.write(raw, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(seq[1:])[0]
        last_nz = (nz[-1] + 1) if nz.size else 0
        k = 1
        while k <= last_nz:
            v = int(seq[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                wr.write(code, length)
                run -= 16
            size, raw = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            wr.write(code, length)
            wr.write(raw, size)
            run = 0
            k += 1
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            wr.write(code, length)
    return pred


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    zig = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zig


def _dht_segment(tc: int, th: int, table) -> bytes:
    bits, values = table
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (h, w) plane to 8-multiples by edge replication and return
    the (by*bx, 8, 8) float block stack in raster block order."""
    h, w = plane.shape
    by = (h + 7) // 8
    bx = (w + 7) // 8
    padded = np.pad(
        plane.astype(np.float64),
        ((0, by * 8 - h), (0, bx * 8 - w)),
        mode="edge",
    )
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(by * bx, 8, 8)
    )
    return blocks, by, bx


def _pack_scan_bits(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Vectorized entropy-stream assembly shared by the sequential and
    progressive tile encoders: per-block MSB-first bit words
    (``values[i]`` emitted in ``nbits[i]`` bits), 1-padded to a byte
    boundary per spec, then 0x00-stuffed after every 0xFF."""
    offsets = np.concatenate([[0], np.cumsum(nbits)])
    total = int(offsets[-1])
    pad = (-total) % 8
    bits = np.ones(total + pad, dtype=np.uint8)  # pad with 1s per spec
    idx = np.repeat(np.arange(values.size), nbits)
    k = np.arange(total) - offsets[idx]
    bits[:total] = (values[idx] >> (nbits[idx] - 1 - k)) & 1
    stream = np.packbits(bits)
    ff = stream == 0xFF
    stuffed = np.zeros(stream.size + int(ff.sum()), dtype=np.uint8)
    pos = np.arange(stream.size) + np.concatenate(
        [[0], np.cumsum(ff[:-1].astype(np.int64))]
    )
    stuffed[pos] = stream
    return stuffed.tobytes()


def encode_jpeg_gray_tiles(tiles: np.ndarray) -> bytes:
    """Vectorized encoder for the constant-tile fixture shape: a
    (rows, cols) uint8 grid where cell (r, c) is an 8x8 constant block.
    Produces bytes IDENTICAL to ``encode_jpeg(np.repeat(np.repeat(
    tiles, 8, 0), 8, 1))`` (pinned by test) but with the per-block DCT
    + Huffman loop replaced by closed forms: a constant block's only
    coefficient is DC = 8*(v - 128), so each block's entropy coding is
    [DC size code][magnitude bits][EOB], assembled for ALL blocks at
    once with numpy bit packing. ~10x faster fixture synthesis — the
    general encoder stays the reference implementation."""
    if tiles.dtype != np.uint8 or tiles.ndim != 2:
        raise JpegFormatError("encode_jpeg_gray_tiles expects (r, c) uint8")
    rows, cols = tiles.shape
    h, w = rows * 8, cols * 8
    dc = 8 * (tiles.reshape(-1).astype(np.int64) - 128)
    diff = np.diff(dc, prepend=0)
    mag = np.abs(diff)
    # size = bit_length(|diff|): |diff| <= 1024 -> max size 11
    size = np.zeros(diff.shape, dtype=np.int64)
    nz = mag > 0
    size[nz] = np.floor(np.log2(mag[nz])).astype(np.int64) + 1
    raw = np.where(diff >= 0, diff, diff + (1 << size) - 1)
    codes = _huff_codes(*_DC_LUMA)
    code_arr = np.array([codes[s][0] for s in range(12)], dtype=np.int64)
    len_arr = np.array([codes[s][1] for s in range(12)], dtype=np.int64)
    eob_code, eob_len = _huff_codes(*_AC_LUMA)[0x00]
    # per-block bit word: [dc code][raw magnitude][EOB], <= 26 bits
    values = (
        ((code_arr[size] << size | raw) << eob_len)
        | eob_code
    )
    nbits = len_arr[size] + size + eob_len
    scan = _pack_scan_bits(values, nbits)
    q = np.ones((8, 8), dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += _dqt_segment(0, q)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


#: AC Huffman table for PROGRESSIVE scans.  Annex K's sequential AC
#: tables define only EOB (0x00), ZRL (0xF0) and (run, size) symbols —
#: the EOBn run codes 0x10..0xE0 that Annex G adds do not exist there,
#: so a progressive encoder must carry its own table.  This one is the
#: simplest legal construction: every needed symbol as an 8-bit code
#: (176 symbols: 160 run/size + EOB0..EOB14 + ZRL; Kraft sum 176/256
#: < 1; canonical build per Annex C, no all-ones code).  Fixture-grade,
#: not size-optimal — decode cost is identical.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)}
        | {n << 4 for n in range(15)}  # EOB0..EOB14
        | {0xF0}  # ZRL
    ),
)


def _emit_eobrun(wr, ac_codes, eobrun: int, buffered: list[int]) -> int:
    """Flush a pending EOB run (T.81 G.1.2.2 EOBn codes: symbol
    ``nbits << 4`` + ``nbits`` extra bits encodes a run of
    ``2**nbits + extra`` end-of-band occurrences) followed by any
    buffered correction bits (refinement scans)."""
    if eobrun:
        nbits = eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        wr.write(code, length)
        if nbits:
            wr.write(eobrun - (1 << nbits), nbits)
    for b in buffered:
        wr.write(b, 1)
    buffered.clear()
    return 0


def _forward_coefs(plane: np.ndarray, qf: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficient rows, one per block — the SAME
    forward path as the sequential encoder."""
    zz = ZIGZAG
    blocks, _, _ = _plane_blocks(plane)
    coefs = np.empty((blocks.shape[0], 64), dtype=np.int64)
    for i, blk in enumerate(blocks):
        f = _C @ (blk - 128.0) @ _C.T
        coefs[i] = np.round(f / qf).astype(np.int64).reshape(64)[zz]
    return coefs


def _prog_write_dc_first(wr, dc: int, pred: int, dc_codes) -> int:
    """One block's DC-first contribution: Huffman-coded diff of the
    point-transformed DC (G.1.2.1).  Returns the new predictor."""
    size, raw = _magnitude(dc - pred)
    code, length = dc_codes[size]
    wr.write(code, length)
    if size:
        wr.write(raw, size)
    return dc


def _prog_ac_first_scan(
    coefs: np.ndarray, ss: int, se: int, al: int, ac_codes
) -> bytes:
    """One AC-first scan over the band Ss..Se at point transform Al:
    run/size coding with EOB runs (truncate-toward-zero per G.1.2.2)."""
    wr = _BitWriter()
    eobrun = 0
    for i in range(coefs.shape[0]):
        band = coefs[i, ss : se + 1]
        v = np.sign(band) * (np.abs(band) >> al)
        nz = np.nonzero(v)[0]
        if nz.size == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(wr, ac_codes, eobrun, [])
            continue
        eobrun = _emit_eobrun(wr, ac_codes, eobrun, [])
        run = 0
        for k in range(int(nz[-1]) + 1):
            val = int(v[k])
            if val == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                wr.write(code, length)
                run -= 16
            size, raw = _magnitude(val)
            code, length = ac_codes[(run << 4) | size]
            wr.write(code, length)
            wr.write(raw, size)
            run = 0
        if int(nz[-1]) < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(wr, ac_codes, eobrun, [])
    _emit_eobrun(wr, ac_codes, eobrun, [])
    return wr.flush()


def _prog_ac_refine_scan(
    coefs: np.ndarray, ss: int, se: int, ac_codes
) -> bytes:
    """One AC-refinement scan (Ah=1 -> Al=0): the G.1.2.3 correction
    procedure — already-significant coefficients ride as buffered
    correction bits, newly-significant ones arrive as run/1 codes."""
    wr = _BitWriter()
    eobrun = 0
    buffered: list[int] = []
    for i in range(coefs.shape[0]):
        band = coefs[i, ss : se + 1]
        absv = np.abs(band)  # Al=0: the full magnitude
        # last position that becomes newly significant in this scan
        newly = np.nonzero(absv == 1)[0]
        eob = int(newly[-1]) + 1 if newly.size else 0
        run = 0
        pending: list[int] = []
        for k in range(band.size):
            t = int(absv[k])
            if t == 0:
                run += 1
                continue
            if t > 1:
                # already significant: correction bit rides along
                pending.append(t & 1)
                continue
            # newly significant coefficient (t == 1)
            while run > 15 and k < eob:
                eobrun = _emit_eobrun(wr, ac_codes, eobrun, buffered)
                code, length = ac_codes[0xF0]
                wr.write(code, length)
                run -= 16
                for b in pending:
                    wr.write(b, 1)
                pending = []
            eobrun = _emit_eobrun(wr, ac_codes, eobrun, buffered)
            code, length = ac_codes[(run << 4) | 1]
            wr.write(code, length)
            wr.write(1 if band[k] > 0 else 0, 1)
            for b in pending:
                wr.write(b, 1)
            pending = []
            run = 0
        if run > 0 or pending:
            eobrun += 1
            buffered.extend(pending)
            if eobrun == 0x7FFF or len(buffered) > 900:
                eobrun = _emit_eobrun(wr, ac_codes, eobrun, buffered)
    _emit_eobrun(wr, ac_codes, eobrun, buffered)
    return wr.flush()


def _prog_sos(components, ss, se, ah, al) -> bytes:
    """SOS header for a progressive scan: [(component id, TdTa), ...]."""
    body = bytes([len(components)])
    for cid, td_ta in components:
        body += bytes([cid, td_ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    spectral_split: int = 6,
) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB -> PROGRESSIVE
    JPEG (SOF2, 4:4:4 for color), T.81 Annex G.

    Grayscale emits the canonical six-scan progression:

    1. DC first        (Ss=0  Se=0,  Ah=0, Al=1) — diffs of ``dc >> 1``
    2. AC first  low   (Ss=1..split-1, Ah=0, Al=1) — EOB runs + band
    3. AC first  high  (Ss=split..63,  Ah=0, Al=1)
    4. DC refinement   (Ah=1, Al=0) — one raw bit per block
    5. AC refinement low  (Ah=1, Al=0) — correction bits, newly
       significant coefficients, buffered-bit EOB runs (G.1.2.3)
    6. AC refinement high (Ah=1, Al=0)

    Color emits the eight-scan shape real encoders produce — an
    INTERLEAVED DC-first scan over all three components, one full-band
    AC-first scan per component, an interleaved DC refinement, and one
    AC refinement per component (AC progression scans must be
    single-component per T.81).

    With the default all-ones quantization table the decoded raster is
    IDENTICAL to ``decode_jpeg(encode_jpeg(pixels))`` — the scans carry
    the same coefficients, just sliced by band and bit plane — which is
    what makes progressive fixtures oracle-checkable."""
    if pixels.dtype != np.uint8:
        raise JpegFormatError("encode_jpeg_progressive expects uint8")
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise JpegFormatError(
            "encode_jpeg_progressive expects (h, w) or (h, w, 3)"
        )
    if not 2 <= spectral_split <= 63:
        raise JpegFormatError("spectral_split must be in 2..63")
    q = (
        np.ones((8, 8), dtype=np.int32)
        if quant is None
        else np.asarray(quant, dtype=np.int32).reshape(8, 8)
    )
    qf = q.astype(np.float64)
    h, w = pixels.shape[:2]
    dc_l = _huff_codes(*_DC_LUMA)
    ac_codes = _huff_codes(*_AC_PROG)
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += _dqt_segment(0, q)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_PROG)

    if gray:
        coefs = _forward_coefs(pixels.astype(np.float64), qf)
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
        out += bytes([1, 0x11, 0])
        # scan 1: DC first, Al=1 (arithmetic shift per G.1.2.1)
        out += _prog_sos([(1, 0x00)], 0, 0, 0, 1)
        wr = _BitWriter()
        pred = 0
        for i in range(coefs.shape[0]):
            pred = _prog_write_dc_first(
                wr, int(coefs[i, 0]) >> 1, pred, dc_l
            )
        out += wr.flush()
        # scans 2+3: AC first per band
        for ss, se in ((1, spectral_split - 1), (spectral_split, 63)):
            out += _prog_sos([(1, 0x10)], ss, se, 0, 1)
            out += _prog_ac_first_scan(coefs, ss, se, 1, ac_codes)
        # scan 4: DC refinement (bit 0 of each block's DC)
        out += _prog_sos([(1, 0x00)], 0, 0, 1, 0)
        wr = _BitWriter()
        for i in range(coefs.shape[0]):
            wr.write(int(coefs[i, 0]) & 1, 1)
        out += wr.flush()
        # scans 5+6: AC refinement per band
        for ss, se in ((1, spectral_split - 1), (spectral_split, 63)):
            out += _prog_sos([(1, 0x10)], ss, se, 1, 0)
            out += _prog_ac_refine_scan(coefs, ss, se, ac_codes)
        out += b"\xff\xd9"
        return bytes(out)

    # color 4:4:4 — one quant table, luma/chroma DC tables, shared
    # progressive AC table
    dc_c = _huff_codes(*_DC_CHROMA)
    out += _dht_segment(0, 1, _DC_CHROMA)
    y, cb, cr = _rgb_to_ycbcr(pixels)
    comp_coefs = [_forward_coefs(p.astype(np.float64), qf) for p in (y, cb, cr)]
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    n_mcu = comp_coefs[0].shape[0]
    # scan 1: INTERLEAVED DC first (per 4:4:4 MCU: one block of each
    # component, separate predictors, luma/chroma DC tables)
    out += _prog_sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    wr = _BitWriter()
    preds = [0, 0, 0]
    tabs = [dc_l, dc_c, dc_c]
    for m in range(n_mcu):
        for ci in range(3):
            preds[ci] = _prog_write_dc_first(
                wr, int(comp_coefs[ci][m, 0]) >> 1, preds[ci], tabs[ci]
            )
    out += wr.flush()
    # scans 2-4: one full-band AC first per component
    for cid, coefs in zip((1, 2, 3), comp_coefs):
        out += _prog_sos([(cid, 0x10)], 1, 63, 0, 1)
        out += _prog_ac_first_scan(coefs, 1, 63, 1, ac_codes)
    # scan 5: interleaved DC refinement
    out += _prog_sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    wr = _BitWriter()
    for m in range(n_mcu):
        for ci in range(3):
            wr.write(int(comp_coefs[ci][m, 0]) & 1, 1)
    out += wr.flush()
    # scans 6-8: one AC refinement per component
    for cid, coefs in zip((1, 2, 3), comp_coefs):
        out += _prog_sos([(cid, 0x10)], 1, 63, 1, 0)
        out += _prog_ac_refine_scan(coefs, 1, 63, ac_codes)
    out += b"\xff\xd9"
    return bytes(out)



def encode_jpeg_gray_tiles_progressive(
    tiles: np.ndarray, spectral_split: int = 6
) -> bytes:
    """Vectorized PROGRESSIVE twin of ``encode_jpeg_gray_tiles``:
    byte-identical to ``encode_jpeg_progressive`` on the expanded
    raster (pinned by test), with the closed-form shortcut a constant
    tile allows — its only coefficient is the DC, so the six-scan
    progression collapses to [vectorized DC-diff scan at Al=1]
    [all-zero AC bands = pure EOB runs] [one raw DC bit per block]
    [EOB runs again, no correction bits]."""
    if tiles.dtype != np.uint8 or tiles.ndim != 2:
        raise JpegFormatError(
            "encode_jpeg_gray_tiles_progressive expects (r, c) uint8"
        )
    rows, cols = tiles.shape
    h, w = rows * 8, cols * 8
    dc = 8 * (tiles.reshape(-1).astype(np.int64) - 128)
    n_blocks = dc.size
    dc_codes = _huff_codes(*_DC_LUMA)
    ac_codes = _huff_codes(*_AC_PROG)

    def vector_dc_scan(vals: np.ndarray, extra_bit: bool) -> bytes:
        """Assemble a whole scan's bits at once: per-block words of
        either [DC size code][magnitude bits] (first scan, ``vals`` are
        the diffs) or a single raw bit (refinement scan)."""
        if extra_bit:
            nbits = np.ones(vals.shape, dtype=np.int64)
            values = vals
        else:
            mag = np.abs(vals)
            size = np.zeros(vals.shape, dtype=np.int64)
            nz = mag > 0
            size[nz] = np.floor(np.log2(mag[nz])).astype(np.int64) + 1
            raw = np.where(vals >= 0, vals, vals + (1 << size) - 1)
            code_arr = np.array([dc_codes[s][0] for s in range(12)], np.int64)
            len_arr = np.array([dc_codes[s][1] for s in range(12)], np.int64)
            values = code_arr[size] << size | raw
            nbits = len_arr[size] + size
        return _pack_scan_bits(values, nbits)

    def eob_run_scan(n: int) -> bytes:
        """An all-zero AC band over ``n`` blocks: EOB runs chunked at
        the 0x7FFF cap exactly as the general encoder flushes them."""
        wr = _BitWriter()
        while n:
            chunk = min(n, 0x7FFF)
            n -= chunk
            _emit_eobrun(wr, ac_codes, chunk, [])
        return wr.flush()

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += _dqt_segment(0, np.ones((8, 8), dtype=np.int32))
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_PROG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])

    def sos(td_ta, ss, se, ah, al):
        return (
            b"\xff\xda"
            + struct.pack(">HB", 8, 1)
            + bytes([1, td_ta, ss, se, (ah << 4) | al])
        )

    out += sos(0x00, 0, 0, 0, 1)
    out += vector_dc_scan(np.diff(dc >> 1, prepend=0), extra_bit=False)
    for ss, se in ((1, spectral_split - 1), (spectral_split, 63)):
        out += sos(0x10, ss, se, 0, 1)
        out += eob_run_scan(n_blocks)
    out += sos(0x00, 0, 0, 1, 0)
    out += vector_dc_scan(dc & 1, extra_bit=True)
    for ss, se in ((1, spectral_split - 1), (spectral_split, 63)):
        out += sos(0x10, ss, se, 1, 0)
        out += eob_run_scan(n_blocks)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    interleaved: bool = True,
) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB -> baseline JPEG.

    ``quant``: an (8, 8) uint8 quantization table applied to every
    component (default all-ones = max fidelity). ``subsampling``:
    ``"444"`` or ``"420"`` (ignored for grayscale).
    ``interleaved=False`` (444 color only) emits one single-component
    SOS per channel — the spec-legal multi-scan sequential layout, used
    to fixture the decoder's non-interleaved path."""
    if pixels.dtype != np.uint8:
        raise JpegFormatError("encode_jpeg expects uint8 pixels")
    q = (
        np.ones((8, 8), dtype=np.int32)
        if quant is None
        else np.asarray(quant, dtype=np.int32).reshape(8, 8)
    )
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise JpegFormatError("encode_jpeg expects (h, w) or (h, w, 3)")
    h, w = pixels.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += _dqt_segment(0, q)
    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    qf = q.astype(np.float64)
    if gray:
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
        out += bytes([1, 0x11, 0])
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
        wr = _BitWriter()
        blocks, _, _ = _plane_blocks(pixels)
        _encode_blocks(wr, blocks, qf, dc_l, ac_l, 0)
        out += wr.flush()
        out += b"\xff\xd9"
        return bytes(out)
    if subsampling not in ("444", "420"):
        raise JpegFormatError(f"unsupported subsampling {subsampling!r}")
    out += _dqt_segment(1, q)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)
    out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    y, cb, cr = _rgb_to_ycbcr(pixels)
    if subsampling == "420":
        hv_y = 0x22
        # 2x2 box-average subsample (pad odd dims by edge replication)
        def sub(p):
            hh = (p.shape[0] + 1) // 2 * 2
            ww = (p.shape[1] + 1) // 2 * 2
            pp = np.pad(
                p.astype(np.float64),
                ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                mode="edge",
            )
            return np.clip(
                np.round(
                    (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2])
                    / 4.0
                ),
                0,
                255,
            ).astype(np.uint8)

        cb, cr = sub(cb), sub(cr)
    else:
        hv_y = 0x11
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    if not interleaved:
        if subsampling != "444":
            raise JpegFormatError(
                "non-interleaved encoding implemented for 444 only"
            )
        # one single-component scan per channel, own DC predictor each
        for cid, plane, dc_t, ac_t in (
            (1, y, dc_l, ac_l),
            (2, cb, dc_c, ac_c),
            (3, cr, dc_c, ac_c),
        ):
            out += (
                b"\xff\xda"
                + struct.pack(">HB", 8, 1)
                + bytes([cid, 0x00 if cid == 1 else 0x11, 0, 63, 0])
            )
            wr = _BitWriter()
            blocks, _, _ = _plane_blocks(plane)
            _encode_blocks(wr, blocks, qf, dc_t, ac_t, 0)
            out += wr.flush()
        out += b"\xff\xd9"
        return bytes(out)
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 12, 3)
        + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    wr = _BitWriter()
    if subsampling == "444":
        yb, by, bx = _plane_blocks(y)
        cbb, _, _ = _plane_blocks(cb)
        crb, _, _ = _plane_blocks(cr)
        preds = [0, 0, 0]
        for m in range(by * bx):
            preds[0] = _encode_blocks(wr, yb[m : m + 1], qf, dc_l, ac_l, preds[0])
            preds[1] = _encode_blocks(wr, cbb[m : m + 1], qf, dc_c, ac_c, preds[1])
            preds[2] = _encode_blocks(wr, crb[m : m + 1], qf, dc_c, ac_c, preds[2])
    else:
        # MCU = 16x16 luma (4 blocks) + 1 block each chroma
        yb, yby, ybx = _plane_blocks(y)
        cbb, cby, cbx = _plane_blocks(cb)
        crb, _, _ = _plane_blocks(cr)
        # luma block grid padded to even dims so MCUs are complete
        if yby % 2 or ybx % 2:
            g = yb.reshape(yby, ybx, 8, 8)
            g = np.pad(g, ((0, yby % 2), (0, ybx % 2), (0, 0), (0, 0)), mode="edge")
            yby += yby % 2
            ybx += ybx % 2
            yb = g.reshape(yby * ybx, 8, 8)
        mcuy, mcux = yby // 2, ybx // 2
        assert (cby, cbx) == (mcuy, mcux), "chroma grid mismatch"
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(2):
                    for hh in range(2):
                        idx = (my * 2 + v) * ybx + mx * 2 + hh
                        preds[0] = _encode_blocks(
                            wr, yb[idx : idx + 1], qf, dc_l, ac_l, preds[0]
                        )
                idx = my * cbx + mx
                preds[1] = _encode_blocks(wr, cbb[idx : idx + 1], qf, dc_c, ac_c, preds[1])
                preds[2] = _encode_blocks(wr, crb[idx : idx + 1], qf, dc_c, ac_c, preds[2])
    out += wr.flush()
    out += b"\xff\xd9"
    return bytes(out)
