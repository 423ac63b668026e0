"""JPEG-LS (ITU-T T.87 / ISO 14495-1, LOCO-I) lossless image codec.

The last major fully-public integer image codec missing from the
from-scratch family (PNG/JPEG/GIF/TIFF/WebP-VP8L): context-modeling
prediction (median edge detector + per-context bias cancellation),
limited-length Golomb-Rice coding, and run mode with interruption
contexts — every step integer-exact, making decoded rasters
oracle-checkable with no float tolerance.

SUPPORTED SUBSET (each bound validated, out-of-subset input raises a
named error, the same discipline as the other codecs): lossless only
(NEAR=0), 8-bit precision, single component (ILV=0), default
thresholds T1=3 T2=7 T3=21 RESET=64 (no LSE marker).  This is the
shape the fixture corpus uses; near-lossless and multi-component
interleave are documented seams.

Encoder and decoder share ONE state implementation (`_JlsState`:
context arrays, gradient quantizer, predictor, Golomb parameter, and
the A/B/C/N update rules), so the two directions cannot silently
mirror-diverge on the adaptive state — only the bit-level map/unmap
pair differs, and the tests invert those exhaustively.

Provenance: written from the public ITU-T T.87 specification; the
wire layout (SOI/SOF55/SOS/EOI markers, FF bit-stuffing) and a full
hand-traced bitstream are pinned byte-for-byte in
``tests/test_jlscodec.py``.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageFormatError


class JlsFormatError(ImageFormatError):
    """Raised for malformed or out-of-subset JPEG-LS bytes."""


MAXVAL = 255
RANGE = 256
QBPP = 8
LIMIT = 32  # 2 * (bpp + max(8, bpp))
T1, T2, T3 = 3, 7, 21
RESET = 64

#: run-length code order table (T.87 A.7.1.1)
J = (
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)


# ---------------------------------------------------------------------------
# bit I/O with the T.87 marker-avoidance rule: a byte following an 0xFF
# carries only 7 payload bits (its MSB is 0), so no 0xFF 0x80+ marker
# can appear inside entropy-coded data
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._cur = 0
        self._width = 8  # 7 right after an 0xFF byte (stuffed slot)
        self._room = 8

    def put(self, nbits: int, value: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._cur = (self._cur << 1) | ((value >> i) & 1)
            self._room -= 1
            if self._room == 0:
                self.out.append(self._cur)
                # a 7-bit stuffed byte has MSB 0, so it is never 0xFF
                self._width = 7 if self._cur == 0xFF else 8
                self._room = self._width
                self._cur = 0

    def unary(self, zeros: int) -> None:
        self.put(zeros + 1, 1)  # `zeros` 0-bits then a 1

    def close(self) -> bytes:
        # pad iff bits were actually written into the current slot —
        # _room alone cannot tell "empty 7-bit post-FF slot" apart from
        # "one significant 0-bit in a fresh 8-bit byte"
        if self._room < self._width:
            self.put(self._room, 0)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._cur = 0
        self._left = 0
        self._prev_ff = False

    def _load(self) -> None:
        if self._pos >= len(self._data):
            raise JlsFormatError("entropy data exhausted mid-sample")
        b = self._data[self._pos]
        self._pos += 1
        if self._prev_ff:
            if b & 0x80:
                raise JlsFormatError(
                    "marker inside entropy data (missing bit stuffing)"
                )
            self._cur = b
            self._left = 7
        else:
            self._cur = b
            self._left = 8
        self._prev_ff = b == 0xFF

    def getbit(self) -> int:
        if self._left == 0:
            self._load()
        self._left -= 1
        return (self._cur >> self._left) & 1

    def get(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.getbit()
        return v

    def bytes_consumed(self) -> int:
        return self._pos


# ---------------------------------------------------------------------------
# shared adaptive state (both directions run EXACTLY this code)
# ---------------------------------------------------------------------------


def _quantize(d: int) -> int:
    if d <= -T3:
        return -4
    if d <= -T2:
        return -3
    if d <= -T1:
        return -2
    if d < 0:
        return -1
    if d == 0:
        return 0
    if d < T1:
        return 1
    if d < T2:
        return 2
    if d < T3:
        return 3
    return 4


def _predict(ra: int, rb: int, rc: int) -> int:
    if rc >= max(ra, rb):
        return min(ra, rb)
    if rc <= min(ra, rb):
        return max(ra, rb)
    return ra + rb - rc


class _JlsState:
    def __init__(self) -> None:
        init_a = max(2, (RANGE + 32) // 64)  # = 4 for 8-bit
        self.A = [init_a] * 367
        self.B = [0] * 365
        self.C = [0] * 365
        self.N = [1] * 367
        self.Nn = [0, 0]  # run-interruption negatives (ctx 365, 366)
        self.run_index = 0

    def context(self, ra: int, rb: int, rc: int, rd: int):
        """(q, sign) with q in 0..364; q == 0 selects run mode."""
        q = (
            _quantize(rd - rb) * 81
            + _quantize(rb - rc) * 9
            + _quantize(rc - ra)
        )
        if q < 0:
            return -q, -1
        return q, 1

    def golomb_k(self, q: int) -> int:
        k = 0
        while (self.N[q] << k) < self.A[q]:
            k += 1
        return k

    def ri_golomb_k(self, ritype: int) -> int:
        q = 365 + ritype
        temp = self.A[q] + ((self.N[q] >> 1) if ritype else 0)
        k = 0
        while (self.N[q] << k) < temp:
            k += 1
        return k

    def inverted_map(self, q: int, k: int) -> bool:
        """The k==0 bias-driven mapping flip (T.87 A.5.2, NEAR=0)."""
        return k == 0 and 2 * self.B[q] <= -self.N[q]

    def update_regular(self, q: int, errval: int) -> None:
        self.B[q] += errval
        self.A[q] += abs(errval)
        if self.N[q] == RESET:
            self.A[q] >>= 1
            self.B[q] = self.B[q] >> 1 if self.B[q] >= 0 else -((1 - self.B[q]) >> 1)
            self.N[q] >>= 1
        self.N[q] += 1
        if self.B[q] <= -self.N[q]:
            if self.C[q] > -128:
                self.C[q] -= 1
            self.B[q] += self.N[q]
            if self.B[q] <= -self.N[q]:
                self.B[q] = -self.N[q] + 1
        elif self.B[q] > 0:
            if self.C[q] < 127:
                self.C[q] += 1
            self.B[q] -= self.N[q]
            if self.B[q] > 0:
                self.B[q] = 0

    def update_run_interrupt(
        self, ritype: int, errval: int, emerrval: int
    ) -> None:
        q = 365 + ritype
        if errval < 0:
            self.Nn[ritype] += 1
        self.A[q] += (emerrval + 1 - ritype) >> 1
        if self.N[q] == RESET:
            self.A[q] >>= 1
            self.N[q] >>= 1
            self.Nn[ritype] >>= 1
        self.N[q] += 1


def _reduce(errval: int) -> int:
    """Modulo-RANGE reduction into [-128, 127] (T.87 A.4.5)."""
    if errval < 0:
        errval += RANGE
    if errval >= (RANGE + 1) // 2:
        errval -= RANGE
    return errval


def _fix(x: int) -> int:
    """Decoder-side modulo correction into [0, MAXVAL] (A.4.2)."""
    if x < 0:
        return x + RANGE
    if x > MAXVAL:
        return x - RANGE
    return x


def _golomb_write(bw: _BitWriter, val: int, k: int, limit: int) -> None:
    high = val >> k
    if high < limit - QBPP - 1:
        bw.unary(high)
        if k:
            bw.put(k, val & ((1 << k) - 1))
    else:
        bw.unary(limit - QBPP - 1)
        bw.put(QBPP, val - 1)


def _golomb_read(br: _BitReader, k: int, limit: int) -> int:
    high = 0
    while br.getbit() == 0:
        high += 1
        if high > limit:
            raise JlsFormatError("runaway unary prefix in Golomb code")
    if high >= limit - QBPP - 1:
        return br.get(QBPP) + 1
    return (high << k) | br.get(k) if k else high


# ---------------------------------------------------------------------------
# scan codec
# ---------------------------------------------------------------------------


def _encode_scan(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    st = _JlsState()
    bw = _BitWriter()
    prev = [0] * (w + 2)  # index 0 is the [-1] slot, w+1 the Rd spill
    for row in range(h):
        line = pixels[row]
        cur = [0] * (w + 2)
        cur[0] = prev[1]  # Ra for col 0 = Rb (T.87 A.2.1)
        prev[w + 1] = prev[w]  # Rd at the last column = Rb
        col = 0
        while col < w:
            i = col + 1
            ra, rb, rc, rd = cur[i - 1], prev[i], prev[i - 1], prev[i + 1]
            q, sign = st.context(ra, rb, rc, rd)
            if q == 0:
                # ---- run mode (A.7) ----
                run = 0
                while col + run < w and int(line[col + run]) == ra:
                    cur[col + run + 1] = ra
                    run += 1
                cnt = run
                while cnt >= (1 << J[st.run_index]):
                    bw.put(1, 1)
                    cnt -= 1 << J[st.run_index]
                    if st.run_index < 31:
                        st.run_index += 1
                col += run
                if col >= w:
                    if cnt > 0:
                        bw.put(1, 1)  # EOL partial block (no increment)
                    break
                bw.put(1, 0)
                if J[st.run_index]:
                    bw.put(J[st.run_index], cnt)
                # interruption sample
                i = col + 1
                ra, rb = cur[i - 1], prev[i]
                x = int(line[col])
                ritype = 1 if ra == rb else 0
                px = ra if ritype else rb
                errval = x - px
                s = 1
                if ritype == 0 and ra > rb:
                    errval = -errval
                    s = -1
                errval = _reduce(errval)
                k = st.ri_golomb_k(ritype)
                qri = 365 + ritype
                mapped = (
                    (k == 0 and errval > 0 and 2 * st.Nn[ritype] < st.N[qri])
                    or (errval < 0 and 2 * st.Nn[ritype] >= st.N[qri])
                    or (errval < 0 and k != 0)
                )
                emerrval = 2 * abs(errval) - ritype - int(mapped)
                _golomb_write(bw, emerrval, k, LIMIT - J[st.run_index] - 1)
                st.update_run_interrupt(ritype, errval, emerrval)
                if st.run_index > 0:
                    st.run_index -= 1
                cur[i] = _fix(px + s * errval)
                if cur[i] != x:  # lossless invariant
                    raise JlsFormatError("internal: lossless violation")
                col += 1
                continue
            # ---- regular mode (A.4-A.6) ----
            x = int(line[col])
            px = _predict(ra, rb, rc) + sign * st.C[q]
            px = 0 if px < 0 else (MAXVAL if px > MAXVAL else px)
            errval = x - px
            if sign < 0:
                errval = -errval
            errval = _reduce(errval)
            k = st.golomb_k(q)
            if st.inverted_map(q, k):
                merrval = (
                    2 * errval + 1 if errval >= 0 else -2 * (errval + 1)
                )
            else:
                merrval = 2 * errval if errval >= 0 else -2 * errval - 1
            _golomb_write(bw, merrval, k, LIMIT)
            st.update_regular(q, errval)
            cur[i] = _fix(px + sign * errval)
            if cur[i] != x:
                raise JlsFormatError("internal: lossless violation")
            col += 1
        prev = cur
    return bw.close()


def _decode_scan(data: bytes, w: int, h: int) -> tuple[np.ndarray, int]:
    st = _JlsState()
    br = _BitReader(data)
    out = np.zeros((h, w), dtype=np.uint8)
    prev = [0] * (w + 2)
    for row in range(h):
        cur = [0] * (w + 2)
        cur[0] = prev[1]
        prev[w + 1] = prev[w]
        col = 0
        while col < w:
            i = col + 1
            ra, rb, rc, rd = cur[i - 1], prev[i], prev[i - 1], prev[i + 1]
            q, sign = st.context(ra, rb, rc, rd)
            if q == 0:
                # ---- run mode ----
                ended_by_interrupt = False
                while True:
                    if br.getbit() == 1:
                        n = 1 << J[st.run_index]
                        if n <= w - col:
                            for _ in range(n):
                                cur[col + 1] = ra
                                col += 1
                            if st.run_index < 31:
                                st.run_index += 1
                            if col >= w:
                                break
                        else:
                            while col < w:  # EOL partial block
                                cur[col + 1] = ra
                                col += 1
                            break
                    else:
                        cnt = (
                            br.get(J[st.run_index])
                            if J[st.run_index]
                            else 0
                        )
                        # a valid stream always leaves room for the
                        # interruption sample, so == is malformed too
                        if cnt >= w - col:
                            raise JlsFormatError("run overruns the line")
                        for _ in range(cnt):
                            cur[col + 1] = ra
                            col += 1
                        ended_by_interrupt = True
                        break
                if not ended_by_interrupt:
                    break  # line consumed by the run
                # interruption sample
                i = col + 1
                ra, rb = cur[i - 1], prev[i]
                ritype = 1 if ra == rb else 0
                px = ra if ritype else rb
                s = -1 if (ritype == 0 and ra > rb) else 1
                k = st.ri_golomb_k(ritype)
                qri = 365 + ritype
                emerrval = _golomb_read(
                    br, k, LIMIT - J[st.run_index] - 1
                )
                temp = emerrval + ritype
                mapped = temp & 1
                errabs = (temp + mapped) >> 1
                if (k != 0 or 2 * st.Nn[ritype] >= st.N[qri]) == bool(
                    mapped
                ):
                    errval = -errabs
                else:
                    errval = errabs
                # hostile escape codes can exceed the mod-RANGE domain;
                # T.87 decoding applies modulo reduction (F.2.2.4)
                errval = _reduce(errval % RANGE)
                st.update_run_interrupt(ritype, errval, emerrval)
                if st.run_index > 0:
                    st.run_index -= 1
                cur[i] = _fix(px + s * errval)
                col += 1
                continue
            # ---- regular mode ----
            px = _predict(ra, rb, rc) + sign * st.C[q]
            px = 0 if px < 0 else (MAXVAL if px > MAXVAL else px)
            k = st.golomb_k(q)
            merrval = _golomb_read(br, k, LIMIT)
            if st.inverted_map(q, k):
                errval = (
                    (merrval - 1) >> 1
                    if merrval & 1
                    else -(merrval >> 1) - 1
                )
            else:
                errval = (
                    merrval >> 1 if not merrval & 1 else -((merrval + 1) >> 1)
                )
            errval = _reduce(errval % RANGE)  # hostile-domain clamp
            st.update_regular(q, errval)
            cur[i] = _fix(px + sign * errval)
            col += 1
        out[row] = cur[1 : w + 1]
        prev = cur
    return out, br.bytes_consumed()


# ---------------------------------------------------------------------------
# marker framing (T.87 annex C subset)
# ---------------------------------------------------------------------------


def encode_jls(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale raster -> JPEG-LS bytes (lossless,
    single component, default thresholds)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise JlsFormatError("encode_jls expects a 2-D uint8 raster")
    h, w = pixels.shape
    if h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise JlsFormatError(f"raster {w}x{h} outside the 16-bit frame")
    sof = struct.pack(
        ">HBHHB", 11, 8, h, w, 1
    ) + bytes([1, 0x11, 0])
    sos = struct.pack(">HB", 8, 1) + bytes([1, 0, 0, 0, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xf7"
        + sof
        + b"\xff\xda"
        + sos
        + _encode_scan(pixels)
        + b"\xff\xd9"
    )


def decode_jls(data: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG-LS bytes -> (w, h, (h, w) uint8 raster)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JlsFormatError("not a JPEG-LS stream (missing SOI)")
    pos = 2
    w = h = None
    while True:
        if pos + 2 > len(data):
            raise JlsFormatError("truncated marker segment")
        if data[pos] != 0xFF:
            raise JlsFormatError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xF7:  # SOF55
            if pos + 4 > len(data):
                raise JlsFormatError("truncated SOF55 segment")
            (lf,) = struct.unpack_from(">H", data, pos + 2)
            if lf < 8 or pos + 2 + lf > len(data):
                raise JlsFormatError("truncated SOF55 segment")
            (lf, p, h, w, nf) = struct.unpack_from(">HBHHB", data, pos + 2)
            if p != 8:
                raise JlsFormatError(
                    f"unsupported JPEG-LS precision {p} (8-bit subset)"
                )
            if nf != 1:
                raise JlsFormatError(
                    f"unsupported component count {nf} (single-component "
                    "subset; ILV interleave is a documented seam)"
                )
            if lf != 8 + 3 * nf:
                raise JlsFormatError(f"bad SOF55 length {lf}")
            if w < 1 or h < 1:
                raise JlsFormatError(f"bad frame dimensions {w}x{h}")
            pos += 2 + lf
        elif marker == 0xDA:  # SOS
            if w is None:
                raise JlsFormatError("SOS before SOF55")
            if pos + 4 > len(data):
                raise JlsFormatError("truncated SOS segment")
            (ls,) = struct.unpack_from(">H", data, pos + 2)
            if ls < 3 or pos + 2 + ls > len(data):
                raise JlsFormatError("truncated SOS segment")
            (ls, ns) = struct.unpack_from(">HB", data, pos + 2)
            if ns != 1 or ls != 6 + 2 * ns:
                raise JlsFormatError("unsupported SOS layout")
            near = data[pos + 2 + 3 + 2 * ns]
            ilv = data[pos + 2 + 4 + 2 * ns]
            if near != 0:
                raise JlsFormatError(
                    f"near-lossless NEAR={near} is a documented seam "
                    "(lossless subset)"
                )
            if ilv != 0:
                raise JlsFormatError(f"unsupported interleave mode {ilv}")
            pos += 2 + ls
            pixels, used = _decode_scan(data[pos:], w, h)
            pos += used
            # zero-padding to alignment is inside `used`; EOI must follow
            if data[pos : pos + 2] != b"\xff\xd9":
                raise JlsFormatError("missing EOI after entropy data")
            return w, h, pixels
        elif marker == 0xF8:  # LSE
            raise JlsFormatError(
                "LSE preset parameters unsupported (default-threshold "
                "subset)"
            )
        elif marker == 0xD9:
            raise JlsFormatError("EOI before any scan")
        elif 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # parameterless markers
        elif marker in (0xC4, 0xC8, 0xCC) or 0xC0 <= marker <= 0xCF:
            raise JlsFormatError(
                f"not a JPEG-LS SOF (marker 0xFF{marker:02X}); "
                "baseline/progressive JPEG belongs to jpegcodec"
            )
        else:  # skippable segment (APPn, COM, ...)
            if pos + 4 > len(data):
                raise JlsFormatError("truncated marker segment")
            (seg,) = struct.unpack_from(">H", data, pos + 2)
            if seg < 2 or pos + 2 + seg > len(data):
                raise JlsFormatError("truncated marker segment")
            pos += 2 + seg
