"""Dependency-free WebP-lossless (VP8L) codec.

Implements the PUBLIC "WebP Lossless Bitstream Specification"
(datatracker RFC 9649 / Google's webp-lossless-bitstream-spec) with
stdlib + numpy:

* **Decoder** — RIFF/WEBP/VP8L container walk; LSB-first bit reader;
  both prefix-code forms (the 1-or-2-symbol "simple" form and the
  full DEFLATE-style form: code-length code in the spec's reordered
  alphabet, 16/17/18 repeat codes, canonical construction); the five
  per-group codes (green+length+cache, red, blue, alpha, distance);
  meta-prefix images (per-tile code-group selection); LZ77
  backward references with the 120-entry 2-D distance-neighbor map
  and the (xsize-scaled) distance decoding; color cache (the 0x1e35a7bd
  multiplicative hash); and ALL FOUR transforms undone in reverse
  order — predictor (14 modes incl. the clamped-gradient Select and
  averages), color transform (signed 3.5 fixed-point cross-channel
  deltas), subtract-green, and color indexing (palette, incl. the
  sub-byte pixel-bundling widths for palettes <= 16).
* **Encoder** — fixture/test construction: palette (color-indexing)
  mode for small-alphabet rasters and plain literal mode otherwise,
  optional subtract-green, color cache off, simple-or-full prefix
  codes as the histogram requires.  Real VP8L files from other
  encoders exercise every remaining path via the transform tests'
  hand-built streams.

Out of scope (``WebpFormatError``): lossy VP8 chunks, VP8X extended
features (animation/EXIF), cropped/scaled decoding.
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import DBPSInvalidInputError


class WebpFormatError(DBPSInvalidInputError):
    """Raised for malformed or unsupported WebP bytes."""


DECODE_MAX_PIXELS = 1 << 26

#: spec: the order in which code-length-code lengths are stored
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

def _build_dist_map() -> list[tuple[int, int]]:
    """The spec's 120-entry 2-D distance-neighbor table, generated from
    its construction rule rather than transcribed: the (dx, dy) pixel
    offsets with dy in 0..7, dx in -7..8 (dx > 0 when dy == 0) —
    exactly 7*16 + 8 = 120 candidates, no truncation — ordered by
    squared Euclidean distance, ties by larger dy then smaller |dx|
    then positive dx first.  An earlier revision generated dx in
    -8..8 and truncated 127 -> 120, which silently shifted every code
    from 103 on and dropped the legal (7,7)/(-7,7)/(8,6)/(8,7)
    offsets; the FULL published table is now pinned
    literal-for-literal in the test suite."""
    cand = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    cand.sort(
        key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], abs(p[0]), p[0] < 0)
    )
    return cand


#: spec: (xoffset, yoffset) neighbor map for distance codes 1..120
_DIST_MAP = _build_dist_map()


class _BitReader:
    """LSB-first bit reader (VP8L, opposite of JPEG's MSB-first)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise WebpFormatError("VP8L bitstream truncated")
        byte = self.pos >> 3
        # read up to n+7 bits worth of bytes
        chunk = int.from_bytes(
            self.data[byte : byte + ((self.pos & 7) + n + 7) // 8 ], "little"
        )
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return v


class _PrefixCode:
    """Canonical prefix decoder over (bits, symbol) pairs."""

    __slots__ = ("lut", "max_len", "single")

    def __init__(self, lengths: list[int]):
        # canonical code assignment exactly as DEFLATE/VP8L specify
        self.single = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise WebpFormatError("empty prefix code")
        if len(nz) == 1:
            # one symbol: zero bits consumed per spec
            self.single = nz[0][1]
            self.max_len = 0
            self.lut = None
            return
        max_len = max(l for l, _ in nz)
        if max_len > 15:
            raise WebpFormatError("prefix length > 15")
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for b in range(1, max_len + 1):
            code = (code + bl_count[b - 1]) << 1
            next_code[b] = code
        if next_code[max_len] + bl_count[max_len] > (1 << max_len):
            raise WebpFormatError("over-subscribed prefix code")
        # LUT over max_len bits; codes are read MSB-first within the
        # canonical space but the stream is LSB-first, so reverse bits
        lut = np.zeros(1 << max_len, dtype=np.int32)
        lut_len = np.zeros(1 << max_len, dtype=np.int8)
        for l, s in sorted(nz):
            c = next_code[l]
            next_code[l] += 1
            rev = int(f"{c:0{l}b}"[::-1], 2)
            step = 1 << l
            for fill in range(rev, 1 << max_len, step):
                lut[fill] = s
                lut_len[fill] = l
        self.lut = (lut, lut_len)
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        lut, lut_len = self.lut
        byte = br.pos >> 3
        navail = br.nbits - br.pos
        need = self.max_len
        chunk = int.from_bytes(
            br.data[byte : byte + ((br.pos & 7) + need + 7) // 8], "little"
        )
        bits = (chunk >> (br.pos & 7)) & ((1 << need) - 1)
        length = int(lut_len[bits])
        if length == 0 or length > navail:
            raise WebpFormatError("invalid prefix code in stream")
        br.pos += length
        return int(lut[bits])


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        n_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise WebpFormatError("simple-code symbol out of alphabet")
        if n_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise WebpFormatError("simple-code symbol out of alphabet")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # full code: code-length code first
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    # optional limit on the number of coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise WebpFormatError("code lengths overrun alphabet")
    return _PrefixCode(lengths)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _cache_hash(argb: int, bits: int) -> int:
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially-coded VP8L image to (h, w) uint32 ARGB."""
    cache_bits = 0
    if br.read(1):  # color cache present
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpFormatError(f"bad color-cache bits {cache_bits}")
    meta_codes = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):  # meta prefix image
        meta_bits = br.read(3) + 2
        mw = _subsample_size(w, meta_bits)
        mh = _subsample_size(h, meta_bits)
        meta_img = _decode_image(br, mw, mh, allow_meta=False)
        # group index = (red << 8) | green
        meta_codes = ((meta_img >> 8) & 0xFFFF).astype(np.int32)
        n_groups = int(meta_codes.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta_codes is not None:
            x = pos % w
            y = pos // w
            gidx = int(meta_codes[y >> meta_bits, x >> meta_bits])
            if gidx >= n_groups:
                raise WebpFormatError("meta group out of range")
            gc, rc, bc, ac, dc = groups[gidx]
        else:
            gc, rc, bc, ac, dc = groups[0]
        s = gc.decode(br)
        if s < 256:  # literal
            red = rc.decode(br)
            blue = bc.decode(br)
            alpha = ac.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_hash(px, cache_bits)] = px
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            dist_sym = dc.decode(br)
            dist_code = _lz77_value(br, dist_sym)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise WebpFormatError("LZ77 distance before image start")
            if pos + length > total:
                raise WebpFormatError("LZ77 copy overruns image")
            for i in range(length):
                px = int(out[pos - dist + i])
                out[pos + i] = px
                if cache_size:
                    cache[_cache_hash(px, cache_bits)] = px
            pos += length
        else:  # color-cache reference
            idx = s - 280
            if idx >= cache_size:
                raise WebpFormatError("color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w)


def _lz77_value(br: _BitReader, prefix_sym: int) -> int:
    """Length/distance prefix symbol -> value (spec: 4 direct, then
    extra bits)."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + br.read(extra) + 1


# ---------------------------------------------------------------------------
# transforms (decoder side: applied in reverse order)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)


def _undo_predictor(argb: np.ndarray, pred_img: np.ndarray, bits: int) -> np.ndarray:
    """Undo the predictor transform: residual + prediction per channel
    mod 256, predictions computed from ALREADY-RECONSTRUCTED pixels in
    scan order (spec: first pixel predicts black, first row mode L,
    first column mode T; TR off the right edge wraps to the FIRST
    pixel of the CURRENT row — the spec's 1-D addressing ``data[y*w]``,
    matching libwebp; already reconstructed by the time x==w-1).

    Pure-int scan loop with SWAR byte arithmetic: the per-byte
    mod-256 add is ``t = (a&0x7f7f7f7f)+(b&0x7f7f7f7f);
    t ^ ((a^b)&0x80808080)`` and the per-byte floor average is
    ``(a&b) + (((a^b)&0xfefefefe)>>1)`` (libwebp's Average2), so the
    common predictor modes run with zero per-pixel allocations —
    ~20x the earlier per-pixel-numpy loop, which made foreign
    predictor-coded files (virtually every real lossless WebP)
    decode in tens of seconds per megapixel."""
    h, w = argb.shape
    resl = argb.reshape(-1).tolist()
    out = [0] * (h * w)
    pred_l = pred_img.tolist()
    M7 = 0x7F7F7F7F
    M8 = 0x80808080
    MFE = 0xFEFEFEFE

    for y in range(h):
        base = y * w
        prow = pred_l[y >> bits] if y else None
        for x in range(w):
            i = base + x
            if y == 0:
                p = 0xFF000000 if x == 0 else out[i - 1]
            elif x == 0:
                p = out[i - w]  # first column: mode T forced
            else:
                mode = (prow[x >> bits] >> 8) & 0xFF
                L = out[i - 1]
                T = out[i - w]
                if mode == 1:
                    p = L
                elif mode == 2:
                    p = T
                elif mode == 0:
                    p = 0xFF000000
                elif mode == 3:
                    p = out[i - w + 1] if x + 1 < w else out[base]
                elif mode == 4:
                    p = out[i - w - 1]
                elif mode == 5:
                    TR = out[i - w + 1] if x + 1 < w else out[base]
                    a = ((L & TR) + (((L ^ TR) & MFE) >> 1))
                    p = (a & T) + (((a ^ T) & MFE) >> 1)
                elif mode == 6:
                    TL = out[i - w - 1]
                    p = (L & TL) + (((L ^ TL) & MFE) >> 1)
                elif mode == 7:
                    p = (L & T) + (((L ^ T) & MFE) >> 1)
                elif mode == 8:
                    TL = out[i - w - 1]
                    p = (TL & T) + (((TL ^ T) & MFE) >> 1)
                elif mode == 9:
                    TR = out[i - w + 1] if x + 1 < w else out[base]
                    p = (T & TR) + (((T ^ TR) & MFE) >> 1)
                elif mode == 10:
                    TL = out[i - w - 1]
                    TR = out[i - w + 1] if x + 1 < w else out[base]
                    a = (L & TL) + (((L ^ TL) & MFE) >> 1)
                    b = (T & TR) + (((T ^ TR) & MFE) >> 1)
                    p = (a & b) + (((a ^ b) & MFE) >> 1)
                elif mode == 11:  # Select: Manhattan-closer of L and T
                    TL = out[i - w - 1]
                    p_l = 0  # |pred - L| where pred = L+T-TL per channel
                    p_t = 0
                    for sh in (24, 16, 8, 0):
                        tc = (T >> sh) & 0xFF
                        lc = (L >> sh) & 0xFF
                        tlc = (TL >> sh) & 0xFF
                        d1 = tc - tlc
                        p_l += d1 if d1 >= 0 else -d1
                        d2 = lc - tlc
                        p_t += d2 if d2 >= 0 else -d2
                    p = L if p_l < p_t else T
                elif mode == 12:  # ClampAddSubtractFull
                    TL = out[i - w - 1]
                    p = 0
                    for sh in (24, 16, 8, 0):
                        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - (
                            (TL >> sh) & 0xFF
                        )
                        if v < 0:
                            v = 0
                        elif v > 255:
                            v = 255
                        p |= v << sh
                elif mode == 13:  # ClampAddSubtractHalf
                    TL = out[i - w - 1]
                    p = 0
                    for sh in (24, 16, 8, 0):
                        ave = (((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)) // 2
                        d1 = ave - ((TL >> sh) & 0xFF)
                        # C-style (x / 2): truncation toward ZERO
                        v = ave + (d1 // 2 if d1 >= 0 else -((-d1) // 2))
                        if v < 0:
                            v = 0
                        elif v > 255:
                            v = 255
                        p |= v << sh
                else:
                    raise WebpFormatError(f"predictor mode {mode} invalid")
            d = resl[i]
            t = (d & M7) + (p & M7)
            out[i] = t ^ ((d ^ p) & M8)
    return np.asarray(out, dtype=np.int64).astype(np.uint32).reshape(h, w)


def _undo_color_transform(argb: np.ndarray, cimg: np.ndarray, bits: int) -> np.ndarray:
    h, w = argb.shape
    out = argb.copy()
    ys, xs = np.mgrid[0:h, 0:w]
    elems = cimg[ys >> bits, xs >> bits]
    g2r = (elems & 0xFF).astype(np.int8).astype(np.int32)
    g2b = ((elems >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    r2b = ((elems >> 16) & 0xFF).astype(np.int8).astype(np.int32)
    a = (out >> 24) & 0xFF
    r = ((out >> 16) & 0xFF).astype(np.int32)
    g = ((out >> 8) & 0xFF).astype(np.int32)
    b = (out & 0xFF).astype(np.int32)
    gs = g.astype(np.int8).astype(np.int32)  # signed green for the mult
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = r.astype(np.uint8).astype(np.int8).astype(np.int32)
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return (a << 24) | (r.astype(np.uint32) << 16) | (g.astype(np.uint32) << 8) | b.astype(np.uint32)


def _undo_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & 0xFF00FF00) | (r << 16) | b


def decode_webp(data: bytes) -> tuple[int, int, np.ndarray]:
    """WebP-lossless bytes -> (width, height, (h, w, 3) uint8 RGB)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpFormatError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WebpFormatError("RIFF chunk truncated")
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise WebpFormatError(
                f"{fourcc.decode('latin1').strip()} (lossy/extended) WebP "
                "unsupported — only VP8L lossless decodes here"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise WebpFormatError("no VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise WebpFormatError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise WebpFormatError("VP8L version must be 0")
    if w * h > DECODE_MAX_PIXELS:
        raise WebpFormatError(f"WebP dimensions {w}x{h} out of range")
    # transforms, recorded in stream order then undone in reverse
    transforms = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 3:  # color indexing
            n_colors = br.read(8) + 1
            palette_img = _decode_image(br, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded left-to-right
            pal = palette_img[0].astype(np.int64)
            for i in range(1, n_colors):
                a = (pal[i - 1] >> 24) + (pal[i] >> 24)
                r = ((pal[i - 1] >> 16) & 0xFF) + ((pal[i] >> 16) & 0xFF)
                g = ((pal[i - 1] >> 8) & 0xFF) + ((pal[i] >> 8) & 0xFF)
                b = (pal[i - 1] & 0xFF) + (pal[i] & 0xFF)
                pal[i] = (
                    ((a & 0xFF) << 24) | ((r & 0xFF) << 16)
                    | ((g & 0xFF) << 8) | (b & 0xFF)
                )
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(("palette", pal.astype(np.uint32), width_bits))
            xsize = _subsample_size(xsize, width_bits)
        elif ttype == 2:
            transforms.append(("subtract_green",))
        elif ttype in (0, 1):
            bits = br.read(3) + 2
            tw = _subsample_size(xsize, bits)
            th = _subsample_size(h, bits)
            timg = _decode_image(br, tw, th, allow_meta=False)
            transforms.append(
                ("predictor" if ttype == 0 else "color", timg, bits)
            )
        else:
            raise WebpFormatError("invalid transform type")
    argb = _decode_image(br, xsize, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == "predictor":
            argb = _undo_predictor(argb, t[1], t[2])
        elif t[0] == "color":
            argb = _undo_color_transform(argb, t[1], t[2])
        elif t[0] == "subtract_green":
            argb = _undo_subtract_green(argb)
        else:  # palette
            pal, width_bits = t[1], t[2]
            if width_bits == 0:
                idx = (argb >> 8) & 0xFF
            else:
                per_byte = 1 << width_bits  # pixels packed per green byte
                ibits = 8 >> width_bits  # bits per pixel index
                packed = ((argb >> 8) & 0xFF).astype(np.uint32)
                cols = []
                for k in range(per_byte):
                    cols.append((packed >> (k * ibits)) & ((1 << ibits) - 1))
                idx = np.stack(cols, axis=2).reshape(argb.shape[0], -1)[:, :w]
            if int(idx.max(initial=0)) >= pal.size:
                raise WebpFormatError("palette index out of range")
            argb = pal[idx]
    hh, ww = argb.shape
    if (ww, hh) != (w, h):
        raise WebpFormatError("decoded size mismatch after transforms")
    rgb = np.stack(
        [
            ((argb >> 16) & 0xFF).astype(np.uint8),
            ((argb >> 8) & 0xFF).astype(np.uint8),
            (argb & 0xFF).astype(np.uint8),
        ],
        axis=2,
    )
    return w, h, rgb


# ---------------------------------------------------------------------------
# encoder (fixtures/tests)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit writer (mirror of the reader)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (MSB-canonical code, length), DEFLATE construction."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for l in lengths.values():
        bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def _write_code(wr: _BitWriter, code: int, length: int) -> None:
    """Emit an MSB-canonical code into the LSB-first stream (reversed,
    exactly inverse to the decoder's LUT fill)."""
    rev = int(f"{code:0{length}b}"[::-1], 2) if length else 0
    wr.write(rev, length)


def _emit_prefix_code(wr: _BitWriter, symbols: list[int], alphabet: int):
    """Write a prefix-code definition for the given symbol population
    and return symbol -> (MSB code, length) for the data pass.

    <= 2 distinct symbols (with 8-bit-representable values) use the
    simple form; otherwise every present symbol gets a flat
    ceil(log2(k))-bit code — an incomplete-but-decodable canonical
    code whose length series costs ONE bit per alphabet entry via a
    two-symbol code-length code ({0, L}, both 1-bit)."""
    present = sorted(set(symbols)) or [0]
    if len(present) == 1 and present[0] < 256:
        wr.write(1, 1)  # simple form
        wr.write(0, 1)  # one symbol
        s = present[0]
        if s < 2:
            wr.write(0, 1)
            wr.write(s, 1)
        else:
            wr.write(1, 1)
            wr.write(s, 8)
        return {s: (0, 0)}
    if len(present) == 2 and present[0] < 256 and present[1] < 256:
        wr.write(1, 1)
        wr.write(1, 1)  # two symbols
        s0, s1 = present
        if s0 < 2:
            wr.write(0, 1)
            wr.write(s0, 1)
        else:
            wr.write(1, 1)
            wr.write(s0, 8)
        wr.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # full form: flat length L over present symbols
    L = max(1, (len(present) - 1).bit_length())
    if L > 15:
        raise WebpFormatError("alphabet too wide for flat coding")
    wr.write(0, 1)  # full form
    positions = {sym: i for i, sym in enumerate(_CLC_ORDER)}
    need = max(positions[0], positions[L]) + 1
    wr.write(need - 4, 4)
    for i in range(need):
        sym = _CLC_ORDER[i]
        wr.write(1 if sym in (0, L) else 0, 3)
    wr.write(0, 1)  # no max-symbol cap: code all alphabet entries
    # two-symbol clc: canonical gives 0 -> '0', L -> '1'
    present_set = set(present)
    for i in range(alphabet):
        wr.write(1 if i in present_set else 0, 1)
    codes = _canonical_codes({s: L for s in present})
    return codes


def _emit_spatial_literals(
    wr: _BitWriter, argb: np.ndarray, green_alphabet: int = 280,
    allow_meta: bool = True,
) -> None:
    """Spatially-coded image, literal pixels only: no color cache, no
    meta prefix, one code group.  ``allow_meta=False`` for transform /
    palette sub-images, which carry a color-cache field but NO
    meta-prefix bit (spec: only the main image may have meta codes)."""
    h, w = argb.shape
    a = ((argb >> 24) & 0xFF).reshape(-1).tolist()
    r = ((argb >> 16) & 0xFF).reshape(-1).tolist()
    g = ((argb >> 8) & 0xFF).reshape(-1).tolist()
    b = (argb & 0xFF).reshape(-1).tolist()
    wr.write(0, 1)  # no color cache
    if allow_meta:
        wr.write(0, 1)  # no meta prefix image
    gcodes = _emit_prefix_code(wr, g, green_alphabet)
    rcodes = _emit_prefix_code(wr, r, 256)
    bcodes = _emit_prefix_code(wr, b, 256)
    acodes = _emit_prefix_code(wr, a, 256)
    _emit_prefix_code(wr, [0], 40)  # distance code (unused)
    for i in range(len(g)):
        _write_code(wr, *gcodes[g[i]])
        _write_code(wr, *rcodes[r[i]])
        _write_code(wr, *bcodes[b[i]])
        _write_code(wr, *acodes[a[i]])


def encode_webp(pixels: np.ndarray, subtract_green: bool = False) -> bytes:
    """(h, w) uint8 gray or (h, w, 3) uint8 RGB -> lossless WebP.

    Rasters with <= 256 distinct colors take the color-indexing
    (palette) path, including sub-byte index bundling for palettes
    <= 16; wider rasters are coded as plain literals, optionally
    behind the subtract-green transform."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise WebpFormatError("encode_webp expects uint8 (h, w[, 3])")
    if pixels.ndim == 2:
        pixels = np.repeat(pixels[:, :, None], 3, axis=2)
    if pixels.shape[2] != 3:
        raise WebpFormatError("encode_webp expects 3 channels")
    h, w = pixels.shape[:2]
    argb = (
        (np.uint32(0xFF) << 24)
        | (pixels[:, :, 0].astype(np.uint32) << 16)
        | (pixels[:, :, 1].astype(np.uint32) << 8)
        | pixels[:, :, 2].astype(np.uint32)
    )
    wr = _BitWriter()
    wr.write(w - 1, 14)
    wr.write(h - 1, 14)
    wr.write(0, 1)  # alpha hint
    wr.write(0, 3)  # version
    colors = np.unique(argb.reshape(-1))
    if colors.size <= 256 and not subtract_green:
        # color-indexing transform
        n = int(colors.size)
        wr.write(1, 1)  # a transform follows
        wr.write(3, 2)  # color indexing
        wr.write(n - 1, 8)
        # palette image: 1 x n, DELTA-coded left to right
        pal = colors.astype(np.int64)
        deltas = np.empty(n, dtype=np.uint32)
        prev = 0
        for i in range(n):
            cur = int(pal[i])
            deltas[i] = (
                ((((cur >> 24) - (prev >> 24)) & 0xFF) << 24)
                | ((((cur >> 16) & 0xFF) - ((prev >> 16) & 0xFF) & 0xFF) << 16)
                | ((((cur >> 8) & 0xFF) - ((prev >> 8) & 0xFF) & 0xFF) << 8)
                | (((cur & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = cur
        _emit_spatial_literals(wr, deltas.reshape(1, n), allow_meta=False)
        wr.write(0, 1)  # no more transforms
        # index image, bundled per the palette width rule
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.vectorize(lambda v: lut[int(v)])(argb).astype(np.uint32)
        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per_byte = 1 << width_bits
            ibits = 8 >> width_bits
            pw = _subsample_size(w, width_bits)
            packed = np.zeros((h, pw), dtype=np.uint32)
            for k in range(per_byte):
                cols = idx[:, k::per_byte]
                packed[:, : cols.shape[1]] |= cols << (k * ibits)
            green = packed
        else:
            green = idx
        img = (np.uint32(0xFF) << 24) | (green << 8)
        _emit_spatial_literals(wr, img)
    else:
        if subtract_green:
            wr.write(1, 1)
            wr.write(2, 2)  # subtract green
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) - g) & 0xFF
            b = ((argb & 0xFF) - g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        wr.write(0, 1)  # no (more) transforms
        _emit_spatial_literals(wr, argb)
    payload = b"\x2f" + wr.flush()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
