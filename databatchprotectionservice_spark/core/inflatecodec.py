"""DEFLATE decoder from scratch — RFC 1951, with the RFC 1950 (zlib)
and RFC 1952 (gzip) wrappers.

The engine's production paths keep CPython's zlib as the kernel (it
is public stdlib, and the point of those paths is the CONTAINER
format); this module is the spec twin that removes the last black box
from the byte stack — the same role ``snappycodec.py`` plays beside
the C snappy in ``compression.py``.  Everything below derives from
the public RFCs alone:

* RFC 1951 §3.2: LSB-first bit packing, the three block types
  (stored with LEN/NLEN complement check, fixed Huffman, dynamic
  Huffman), the code-length code with its fixed symbol order and the
  16/17/18 repeat codes, the length/distance extra-bit tables, and
  canonical Huffman code construction (§3.2.2's algorithm verbatim);
* RFC 1950: 2-byte header (CM/CINFO/FCHECK/FDICT/FLEVEL) and the
  Adler-32 trailer, Adler-32 implemented from its definition;
* RFC 1952: gzip member header (magic, CM, FLG with FEXTRA/FNAME/
  FCOMMENT/FHCRC), CRC-32 (reflected 0xEDB88320) and ISIZE trailer.

The referee in tests is stdlib zlib itself: every stream zlib emits
(all levels, both strategies) must decode byte-exact, and our
decoder's strictness is pinned by hand-assembled hostile streams
plus the mutation battery.
"""

from __future__ import annotations

import struct

from .errors import DBPSInvalidInputError

#: decompressed-size cap: a hostile stream must not balloon memory
MAX_OUTPUT = 1 << 28


class InflateError(DBPSInvalidInputError):
    """Malformed DEFLATE/zlib/gzip data."""


# RFC 1951 §3.2.5 length codes 257-285: (extra bits, base length)
_LEN_TABLE = [
    (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9), (0, 10),
    (1, 11), (1, 13), (1, 15), (1, 17), (2, 19), (2, 23), (2, 27),
    (2, 31), (3, 35), (3, 43), (3, 51), (3, 59), (4, 67), (4, 83),
    (4, 99), (4, 115), (5, 131), (5, 163), (5, 195), (5, 227), (0, 258),
]
# distance codes 0-29: (extra bits, base distance)
_DIST_TABLE = [
    (0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 7), (2, 9), (2, 13),
    (3, 17), (3, 25), (4, 33), (4, 49), (5, 65), (5, 97), (6, 129),
    (6, 193), (7, 257), (7, 385), (8, 513), (8, 769), (9, 1025),
    (9, 1537), (10, 2049), (10, 3073), (11, 4097), (11, 6145),
    (12, 8193), (12, 12289), (13, 16385), (13, 24577),
]
# RFC 1951 §3.2.7: the code-length code's fixed symbol order
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)


class _Bits:
    """LSB-first bit reader over bytes (RFC 1951 §3.1.1)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def need(self, n: int) -> None:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise InflateError("unexpected end of DEFLATE stream")
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self.need(n)
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return v

    def align_byte(self) -> None:
        self.buf = 0
        self.nbits = 0

    def byte_pos(self) -> int:
        """Position of the next unread byte (after align)."""
        return self.pos


class _Huffman:
    """Canonical Huffman decoder built from code LENGTHS alone
    (RFC 1951 §3.2.2).  Decoding walks bit-by-bit through the
    canonical first-code/count arrays — O(code length) per symbol
    with no table blowup on hostile length sets."""

    __slots__ = ("counts", "symbols", "first_code", "first_sym", "maxlen")

    def __init__(self, lengths: list[int]):
        maxlen = max(lengths) if lengths else 0
        if maxlen == 0:
            raise InflateError("Huffman code with no symbols")
        if maxlen > 15:
            raise InflateError(f"code length {maxlen} exceeds 15")
        counts = [0] * (maxlen + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        # over-subscription check (§3.2.2's implicit completeness):
        # an over-full code is invalid; incomplete codes appear in
        # legal streams only for the 1-symbol distance case, which
        # zlib emits — accept incomplete, reject over-full
        left = 1
        for ln in range(1, maxlen + 1):
            left = (left << 1) - counts[ln]
            if left < 0:
                raise InflateError("over-subscribed Huffman code")
        # canonical ordering: symbols sorted by (length, symbol)
        self.maxlen = maxlen
        self.counts = counts
        offs = [0] * (maxlen + 2)
        for ln in range(1, maxlen + 1):
            offs[ln + 1] = offs[ln] + counts[ln]
        self.symbols = [0] * offs[maxlen + 1]
        next_off = offs[:]
        for sym, ln in enumerate(lengths):
            if ln:
                self.symbols[next_off[ln]] = sym
                next_off[ln] += 1
        # first canonical code and first symbol index per length
        self.first_code = [0] * (maxlen + 1)
        self.first_sym = [0] * (maxlen + 1)
        code = 0
        idx = 0
        for ln in range(1, maxlen + 1):
            self.first_code[ln] = code
            self.first_sym[ln] = idx
            code = (code + counts[ln]) << 1
            idx += counts[ln]

    def decode(self, bits: _Bits) -> int:
        code = 0
        for ln in range(1, self.maxlen + 1):
            code |= bits.take(1)
            n = self.counts[ln]
            d = code - self.first_code[ln]
            if 0 <= d < n:
                return self.symbols[self.first_sym[ln] + d]
            code <<= 1
        raise InflateError("invalid Huffman code in stream")


_FIXED_LIT = None
_FIXED_DIST = None


def _fixed_tables() -> tuple[_Huffman, _Huffman]:
    global _FIXED_LIT, _FIXED_DIST
    if _FIXED_LIT is None:
        lengths = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
        _FIXED_LIT = _Huffman(lengths)
        _FIXED_DIST = _Huffman([5] * 30)
    return _FIXED_LIT, _FIXED_DIST


def _dynamic_tables(bits: _Bits) -> tuple[_Huffman, _Huffman]:
    hlit = bits.take(5) + 257
    hdist = bits.take(5) + 1
    hclen = bits.take(4) + 4
    if hlit > 286 or hdist > 30:
        raise InflateError(f"HLIT/HDIST out of range: {hlit}/{hdist}")
    clc_lengths = [0] * 19
    for i in range(hclen):
        clc_lengths[_CLC_ORDER[i]] = bits.take(3)
    clc = _Huffman(clc_lengths)
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        sym = clc.decode(bits)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise InflateError("repeat code with no previous length")
            lengths.extend([lengths[-1]] * (3 + bits.take(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + bits.take(3)))
        else:
            lengths.extend([0] * (11 + bits.take(7)))
    if len(lengths) != hlit + hdist:
        raise InflateError("code-length run overflows HLIT+HDIST")
    lit = _Huffman(lengths[:hlit])
    dist = _Huffman(lengths[hlit:])
    return lit, dist


def inflate_raw(data: bytes, start: int = 0) -> tuple[bytes, int]:
    """Decode one complete raw-DEFLATE stream starting at byte
    ``start``; returns (decompressed bytes, next byte position)."""
    bits = _Bits(bytes(data), start)
    out = bytearray()
    while True:
        bfinal = bits.take(1)
        btype = bits.take(2)
        if btype == 0:  # stored
            bits.align_byte()
            p = bits.byte_pos()
            if p + 4 > len(bits.data):
                raise InflateError("truncated stored-block header")
            ln, nln = struct.unpack_from("<HH", bits.data, p)
            if ln ^ nln != 0xFFFF:
                raise InflateError("stored block LEN/NLEN mismatch")
            if p + 4 + ln > len(bits.data):
                raise InflateError("truncated stored block")
            out += bits.data[p + 4 : p + 4 + ln]
            bits.pos = p + 4 + ln
        elif btype in (1, 2):
            lit, dist = (
                _fixed_tables() if btype == 1 else _dynamic_tables(bits)
            )
            while True:
                sym = lit.decode(bits)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise InflateError(f"invalid length code {sym}")
                    eb, base = _LEN_TABLE[sym - 257]
                    length = base + bits.take(eb)
                    dsym = dist.decode(bits)
                    if dsym > 29:
                        raise InflateError(f"invalid distance code {dsym}")
                    deb, dbase = _DIST_TABLE[dsym]
                    distance = dbase + bits.take(deb)
                    if distance > len(out):
                        raise InflateError(
                            "back-reference before stream start"
                        )
                    # overlapping copy byte-by-byte (RFC allows
                    # distance < length: the run replicates)
                    s = len(out) - distance
                    for i in range(length):
                        out.append(out[s + i])
                if len(out) > MAX_OUTPUT:
                    raise InflateError("output exceeds decoder cap")
        else:
            raise InflateError("reserved block type 3")
        if len(out) > MAX_OUTPUT:
            raise InflateError("output exceeds decoder cap")
        if bfinal:
            break
    bits.align_byte()
    return bytes(out), bits.byte_pos()


def adler32(data: bytes) -> int:
    """RFC 1950 §8: two mod-65521 running sums."""
    a, b = 1, 0
    for i in range(0, len(data), 4096):
        for byte in data[i : i + 4096]:
            a += byte
            b += a
        a %= 65521
        b %= 65521
    return (b << 16) | a


def inflate_zlib(data: bytes) -> bytes:
    """RFC 1950 wrapper: header checks + Adler-32 trailer verify."""
    if len(data) < 6:
        raise InflateError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise InflateError(f"zlib CM {cmf & 0x0F} is not DEFLATE")
    if (cmf >> 4) > 7:
        raise InflateError("zlib CINFO window exceeds 32 KiB")
    if (cmf * 256 + flg) % 31 != 0:
        raise InflateError("zlib FCHECK failed")
    if flg & 0x20:
        raise InflateError("zlib FDICT preset dictionaries not supported")
    out, pos = inflate_raw(data, 2)
    if pos + 4 > len(data):
        raise InflateError("zlib stream missing Adler-32 trailer")
    want = struct.unpack_from(">I", data, pos)[0]
    got = adler32(out)
    if want != got:
        raise InflateError(f"Adler-32 mismatch: {got:#x} != {want:#x}")
    return out


_CRC_TABLE = None


def crc32(data: bytes, crc: int = 0) -> int:
    """RFC 1952 §8 CRC-32 (reflected 0xEDB88320), table-driven."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    c = crc ^ 0xFFFFFFFF
    for byte in data:
        c = _CRC_TABLE[(c ^ byte) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def inflate_gzip(data: bytes) -> bytes:
    """RFC 1952 single-member gzip: header walk (FEXTRA/FNAME/
    FCOMMENT/FHCRC), raw inflate, CRC-32 + ISIZE trailer verify."""
    if len(data) < 18 or data[0] != 0x1F or data[1] != 0x8B:
        raise InflateError("missing gzip magic")
    if data[2] != 8:
        raise InflateError(f"gzip CM {data[2]} is not DEFLATE")
    flg = data[3]
    if flg & 0xE0:
        raise InflateError("gzip reserved FLG bits set")
    pos = 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(data):
            raise InflateError("truncated FEXTRA length")
        xlen = struct.unpack_from("<H", data, pos)[0]
        pos += 2 + xlen
    for bit in (0x08, 0x10):  # FNAME, FCOMMENT: nul-terminated
        if flg & bit:
            end = data.find(b"\x00", pos)
            if end < 0:
                raise InflateError("unterminated gzip header string")
            pos = end + 1
    if flg & 0x02:  # FHCRC
        if pos + 2 > len(data):
            raise InflateError("truncated FHCRC")
        want = struct.unpack_from("<H", data, pos)[0]
        if crc32(data[:pos]) & 0xFFFF != want:
            raise InflateError("gzip header CRC16 mismatch")
        pos += 2
    out, pos = inflate_raw(data, pos)
    if pos + 8 > len(data):
        raise InflateError("gzip stream missing CRC32/ISIZE trailer")
    want_crc, want_isize = struct.unpack_from("<II", data, pos)
    if crc32(out) != want_crc:
        raise InflateError("gzip CRC-32 mismatch")
    if len(out) % (1 << 32) != want_isize:
        raise InflateError("gzip ISIZE mismatch")
    if pos + 8 != len(data):
        # single-member contract is pinned strict: bytes after the
        # trailer are garbage here, not a second member (gzip_members
        # is the multi-stream entry point)
        raise InflateError("trailing garbage after gzip trailer")
    return out


# ---------------------------------------------------------------------------
# Encode direction: fixed-Huffman DEFLATE with greedy LZ77 (+ stored
# fallback), zlib/gzip wrappers.  The decode referee in tests is
# stdlib zlib — streams this encoder emits must inflate byte-exact
# there AND through this module's own decoder.
# ---------------------------------------------------------------------------

#: greedy matcher bounds (RFC limits: length <= 258, distance <= 32768)
_MIN_MATCH = 3
_MAX_MATCH = 258
_WINDOW = 32768


class _BitWriter:
    """LSB-first bit packer (the inverse of _Bits)."""

    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        self.buf |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def put_code(self, code: int, n: int) -> None:
        """Huffman codes pack MSB-first (RFC 1951 §3.1.1)."""
        for i in range(n - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


def _put_fixed_literal(w: _BitWriter, sym: int) -> None:
    if sym < 144:
        w.put_code(0x30 + sym, 8)
    elif sym < 256:
        w.put_code(0x190 + sym - 144, 9)
    elif sym < 280:
        w.put_code(sym - 256, 7)
    else:
        w.put_code(0xC0 + sym - 280, 8)


def _length_symbol(length: int) -> tuple[int, int, int]:
    """length -> (symbol, extra bits, extra value)."""
    for sym in range(len(_LEN_TABLE) - 1, -1, -1):
        eb, base = _LEN_TABLE[sym]
        if length >= base:
            return 257 + sym, eb, length - base
    raise InflateError(f"length {length} below minimum match")


def _dist_symbol(distance: int) -> tuple[int, int, int]:
    for sym in range(len(_DIST_TABLE) - 1, -1, -1):
        eb, base = _DIST_TABLE[sym]
        if distance >= base:
            return sym, eb, distance - base
    raise InflateError(f"distance {distance} below 1")


def _lz77_tokens(data: bytes) -> list[tuple[int, int]]:
    """Greedy hash-head LZ77 parse (single-slot 3-byte hash, the same
    greedy discipline as the LZ4 encoder; correctness never depends
    on match quality).  Tokens are (literal_byte, 0) or
    (length, distance) with distance > 0."""
    head: dict[int, int] = {}
    tokens: list[tuple[int, int]] = []
    i, n = 0, len(data)
    while i < n:
        match_len = 0
        match_dist = 0
        if i + _MIN_MATCH <= n:
            key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            cand = head.get(key)
            head[key] = i
            if cand is not None and i - cand <= _WINDOW:
                limit = min(_MAX_MATCH, n - i)
                ln = 0
                while ln < limit and data[cand + ln] == data[i + ln]:
                    ln += 1
                if ln >= _MIN_MATCH:
                    match_len, match_dist = ln, i - cand
        if match_len:
            tokens.append((match_len, match_dist))
            # seed the hash along the match so later data can refer
            # into it (head slots, not chains: greedy single-slot)
            end = i + match_len
            j = i + 1
            while j < min(end, n - _MIN_MATCH + 1):
                k = data[j] | (data[j + 1] << 8) | (data[j + 2] << 16)
                head[k] = j
                j += 1
            i = end
        else:
            tokens.append((data[i], 0))
            i += 1
    return tokens


def _emit_tokens(w, tokens, put_litlen, put_dist) -> None:
    """Serialize the token stream through per-alphabet emitters."""
    for a, b in tokens:
        if b == 0:
            put_litlen(w, a)
        else:
            sym, eb, ev = _length_symbol(a)
            put_litlen(w, sym)
            w.put(ev, eb)
            dsym, deb, dev = _dist_symbol(b)
            put_dist(w, dsym)
            w.put(dev, deb)
    put_litlen(w, 256)  # end of block


def deflate_fixed(data: bytes) -> bytes:
    """One final fixed-Huffman block over the greedy LZ77 parse."""
    data = bytes(data)
    w = _BitWriter()
    w.put(1, 1)  # BFINAL
    w.put(1, 2)  # fixed Huffman
    _emit_tokens(
        w,
        _lz77_tokens(data),
        _put_fixed_literal,
        lambda wr, dsym: wr.put_code(dsym, 5),
    )
    return w.finish()


def deflate_stored(data: bytes) -> bytes:
    """Stored (uncompressed) blocks — the incompressible fallback."""
    data = bytes(data)
    out = bytearray()
    pos = 0
    while True:
        chunk = data[pos : pos + 0xFFFF]
        final = 1 if pos + len(chunk) >= len(data) else 0
        out.append(final)  # BFINAL + BTYPE=00, byte-aligned
        out += struct.pack("<HH", len(chunk), len(chunk) ^ 0xFFFF)
        out += chunk
        pos += len(chunk)
        if final:
            return bytes(out)


def deflate(data: bytes) -> bytes:
    """Block-type election, cost-aware: dynamic tables only pay off
    once the payload amortizes their serialization (~200 bytes —
    below that fixed codes win or tie within a few bytes), and the
    stored fallback is only worth COMPUTING when the Huffman stream
    failed to compress at all.  One encode pass in the common case
    instead of three (the naive try-everything election tripled the
    per-document cost of the gzip shard gate)."""
    best = deflate_dynamic(data) if len(data) >= 200 else deflate_fixed(data)
    if len(best) >= len(data):
        stored = deflate_stored(data)
        if len(stored) < len(best):
            best = stored
    return best


def zlib_compress(data: bytes) -> bytes:
    """RFC 1950 framing around :func:`deflate` (32K window, FCHECK
    balanced, no dictionary)."""
    cmf = 0x78
    flg = 0x9C  # level-2 FLEVEL; (0x78*256 + 0x9C) % 31 == 0
    return (
        bytes([cmf, flg])
        + deflate(data)
        + struct.pack(">I", adler32(data))
    )


def gzip_compress(data: bytes, fname: str | None = None) -> bytes:
    """RFC 1952 single-member framing around :func:`deflate`."""
    flg = 0x08 if fname else 0
    hdr = bytearray(b"\x1f\x8b\x08" + bytes([flg]) + b"\x00" * 6)
    if fname:
        hdr += fname.encode("latin-1") + b"\x00"
    return (
        bytes(hdr)
        + deflate(data)
        + struct.pack("<II", crc32(data), len(data) % (1 << 32))
    )


def gzip_members(data: bytes) -> list[bytes]:
    """Walk CONCATENATED gzip members (RFC 1952 §2.2 allows a file to
    be a sequence of members — the Common Crawl warc.gz layout) and
    return each member's decompressed payload, trailer-verified."""
    data = bytes(data)
    out: list[bytes] = []
    pos = 0
    while pos < len(data):
        if pos + 18 > len(data) or data[pos] != 0x1F or data[pos + 1] != 0x8B:
            raise InflateError(f"missing gzip member magic at {pos}")
        # find this member's extent by decoding it in place: reuse the
        # single-member path on the remaining bytes, then compute how
        # many bytes it consumed from the raw-stream end position
        if data[pos + 2] != 8:
            raise InflateError(f"gzip CM {data[pos + 2]} is not DEFLATE")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise InflateError("gzip reserved FLG bits set")
        p = pos + 10
        if flg & 0x04:
            if p + 2 > len(data):
                raise InflateError("truncated FEXTRA length")
            p += 2 + struct.unpack_from("<H", data, p)[0]
        for bit in (0x08, 0x10):
            if flg & bit:
                end = data.find(b"\x00", p)
                if end < 0:
                    raise InflateError("unterminated gzip header string")
                p = end + 1
        if flg & 0x02:
            if p + 2 > len(data):
                raise InflateError("truncated FHCRC")
            want = struct.unpack_from("<H", data, p)[0]
            if crc32(data[pos:p]) & 0xFFFF != want:
                raise InflateError("gzip header CRC16 mismatch")
            p += 2
        payload, p = inflate_raw(data, p)
        if p + 8 > len(data):
            raise InflateError("gzip member missing CRC32/ISIZE trailer")
        want_crc, want_isize = struct.unpack_from("<II", data, p)
        if crc32(payload) != want_crc:
            raise InflateError("gzip member CRC-32 mismatch")
        if len(payload) % (1 << 32) != want_isize:
            raise InflateError("gzip member ISIZE mismatch")
        out.append(payload)
        pos = p + 8
    return out


# ---------------------------------------------------------------------------
# Dynamic-Huffman blocks: package-merge length-limited codes + the
# RFC 1951 §3.2.7 code-length-code serialization.
# ---------------------------------------------------------------------------


def _package_merge(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited Huffman code lengths (the public
    package-merge / coin-collector algorithm): lengths are the leaf
    multiplicities in the cheapest ``2n-2`` items of the L-th merged
    list.  Returns {symbol: length}; a single-symbol alphabet gets
    length 1 (the legal incomplete code both decoders accept)."""
    leaves = sorted((f, s) for s, f in freqs.items() if f > 0)
    n = len(leaves)
    if n == 0:
        return {}
    if n == 1:
        return {leaves[0][1]: 1}
    if (1 << limit) < n:
        raise InflateError(f"{n} symbols cannot fit {limit}-bit codes")
    lengths = {s: 0 for _, s in leaves}
    prev: list[tuple[int, tuple[int, ...]]] = []
    leaf_items = [(f, (s,)) for f, s in leaves]
    for level in range(limit):
        items = sorted(leaf_items + prev, key=lambda x: x[0])
        if level == limit - 1:
            for _, syms in items[: 2 * n - 2]:
                for s in syms:
                    lengths[s] += 1
            return lengths
        prev = [
            (
                items[i][0] + items[i + 1][0],
                items[i][1] + items[i + 1][1],
            )
            for i in range(0, len(items) - 1, 2)
        ]
    raise AssertionError("unreachable")


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """Code lengths -> canonical (code, length) per symbol, the
    §3.2.2 next_code construction (the encoder-side mirror of
    ``_Huffman``)."""
    maxlen = max(lengths) if lengths else 0
    counts = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            counts[ln] += 1
    next_code = [0] * (maxlen + 2)
    code = 0
    for ln in range(1, maxlen + 1):
        code = (code + counts[ln - 1]) << 1
        next_code[ln] = code
    out = []
    for ln in lengths:
        if ln == 0:
            out.append((0, 0))
        else:
            out.append((next_code[ln], ln))
            next_code[ln] += 1
    return out


def _clc_runs(lengths: list[int]):
    """Run-length encode a code-length array with the 16/17/18
    repeat codes (RFC 1951 §3.2.7); yields (symbol, extra_bits,
    extra_value)."""
    i, n = 0, len(lengths)
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        if v == 0:
            while run >= 3:
                take = min(run, 138)
                if take > 10:
                    yield 18, 7, take - 11
                else:
                    yield 17, 3, take - 3
                run -= take
                i += take
            for _ in range(run):
                yield 0, 0, 0
                i += 1
        else:
            yield v, 0, 0
            i += 1
            run -= 1
            while run >= 3:
                take = min(run, 6)
                yield 16, 2, take - 3
                run -= take
                i += take
            for _ in range(run):
                yield v, 0, 0
                i += 1


def deflate_dynamic(data: bytes) -> bytes:
    """One final dynamic-Huffman block: per-payload package-merge
    codes over the greedy LZ77 token stream, tables serialized with
    the §3.2.7 code-length code."""
    data = bytes(data)
    tokens = _lz77_tokens(data)
    lit_freq: dict[int, int] = {256: 1}
    dist_freq: dict[int, int] = {}
    for a, b in tokens:
        if b == 0:
            lit_freq[a] = lit_freq.get(a, 0) + 1
        else:
            sym, _, _ = _length_symbol(a)
            lit_freq[sym] = lit_freq.get(sym, 0) + 1
            dsym, _, _ = _dist_symbol(b)
            dist_freq[dsym] = dist_freq.get(dsym, 0) + 1
    lit_len_map = _package_merge(lit_freq, 15)
    dist_len_map = _package_merge(dist_freq, 15) or {0: 1}
    hlit = max(257, max(lit_len_map) + 1)
    hdist = max(1, max(dist_len_map) + 1)
    lit_lengths = [lit_len_map.get(s, 0) for s in range(hlit)]
    dist_lengths = [dist_len_map.get(s, 0) for s in range(hdist)]

    runs = list(_clc_runs(lit_lengths + dist_lengths))
    clc_freq: dict[int, int] = {}
    for sym, _, _ in runs:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_len_map = _package_merge(clc_freq, 7)
    clc_lengths = [clc_len_map.get(s, 0) for s in range(19)]
    hclen = max(
        4,
        max(
            i + 1
            for i, sym in enumerate(_CLC_ORDER)
            if clc_lengths[sym] or i < 4
        ),
    )

    lit_codes = _canonical_codes(lit_lengths)
    dist_codes = _canonical_codes(dist_lengths)
    clc_codes = _canonical_codes(clc_lengths)

    w = _BitWriter()
    w.put(1, 1)  # BFINAL
    w.put(2, 2)  # dynamic
    w.put(hlit - 257, 5)
    w.put(hdist - 1, 5)
    w.put(hclen - 4, 4)
    for i in range(hclen):
        w.put(clc_lengths[_CLC_ORDER[i]], 3)
    for sym, eb, ev in runs:
        code, ln = clc_codes[sym]
        w.put_code(code, ln)
        if eb:
            w.put(ev, eb)
    _emit_tokens(
        w,
        tokens,
        lambda wr, s: wr.put_code(*lit_codes[s]),
        lambda wr, s: wr.put_code(*dist_codes[s]),
    )
    return w.finish()
