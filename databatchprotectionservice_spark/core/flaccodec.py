"""Dependency-free FLAC codec (lossless audio).

From-scratch implementation of the PUBLIC FLAC bitstream format
(RFC 9639 / the xiph.org format spec) — like the ADPCM state machine it
is pure integer arithmetic end to end, so decoded samples are EXACT and
every downstream statistic is oracle-checkable with no float tolerance.
Closes the lossless-compression seam on the audio path; perceptual
codecs (MP3/AAC/OGG) remain at the documented library seam.

Decoder coverage: STREAMINFO metadata walk (unknown blocks skipped),
frame sync + CRC-8 header / CRC-16 frame validation, all blocksize and
sample-rate header codes, CONSTANT / VERBATIM / FIXED(0-4) / LPC
subframes, Rice + Rice2 residual partitions including escape codes,
wasted bits, independent multi-channel and the three stereo
decorrelation modes (left-side / right-side / mid-side), STREAMINFO
MD5 verification.  The encoder exists for fixture construction (mono
int16, FIXED order search + quantized order-2 LPC chosen by residual
cost, CONSTANT short-circuit, single-partition Rice with optimal
parameter) and is round-trip tested; it is not a Spark sink.

Bit-level access uses an ASCII '0'/'1' expansion of the stream: unary
runs decode with C-speed ``str.index`` and fixed-width fields with
``int(s, 2)``, which keeps the per-sample Python cost at two C calls —
the same trick as a bit-LUT, without one.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacFormatError(ValueError):
    """Raised for malformed or unsupported FLAC bytes."""


# ---------------------------------------------------------------------------
# CRCs (spec: CRC-8 poly x^8+x^2+x+1 = 0x07, CRC-16 poly 0x8005, both
# init 0, MSB-first, no reflection)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# ---------------------------------------------------------------------------
# coded number (the UTF-8-shaped frame/sample index, up to 36 bits)
# ---------------------------------------------------------------------------


def _encode_coded_number(val: int) -> bytes:
    if val < 0x80:
        return bytes([val])
    for n_cont, lead in ((1, 0xC0), (2, 0xE0), (3, 0xF0), (4, 0xF8),
                         (5, 0xFC), (6, 0xFE)):
        # lead byte carries (6 - n_cont) payload bits, each
        # continuation byte 6 more
        if val < 1 << (6 + 5 * n_cont):
            out = [lead | (val >> (6 * n_cont))]
            for i in range(n_cont - 1, -1, -1):
                out.append(0x80 | ((val >> (6 * i)) & 0x3F))
            return bytes(out)
    raise FlacFormatError("coded number out of range")


# ---------------------------------------------------------------------------
# bit cursor over an ASCII '0'/'1' expansion
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("s", "arr", "pos", "_ones")

    def __init__(self, data: bytes):
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.arr = bits
        self.s = (bits + ord("0")).astype(np.uint8).tobytes().decode("ascii")
        self.pos = 0
        self._ones = None

    @property
    def ones(self) -> np.ndarray:
        """Positions of all set bits (lazy; lets the k=0 Rice path and
        truncation checks run as one vectorized pass)."""
        if self._ones is None:
            self._ones = np.flatnonzero(self.arr)
        return self._ones

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.s):
            raise FlacFormatError("bitstream truncated")
        self.pos = p + n
        return int(self.s[p : p + n], 2) if n else 0

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        try:
            idx = self.s.index("1", self.pos)
        except ValueError:
            raise FlacFormatError("bitstream truncated in unary run") from None
        q = idx - self.pos
        self.pos = idx + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLE_RATE_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SAMPLE_SIZE_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24,
                      0b111: 32}

#: FIXED-predictor restore: s[i] = residual[i] + dot(coefs, previous)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    """Rice/Rice2 residual partitions -> int64 ndarray.

    The three partition shapes each take their fastest exact path:
    escape partitions batch-convert fixed-width fields with one
    matrix product; k=0 partitions have NO remainder bits, so every
    set bit in range is a unary terminator and the whole partition is
    ``diff`` over the precomputed ones index; k>0 partitions keep the
    sequential scan (remainder bits can contain ones) but fused into
    one local-variable loop — one ``str.index`` + one ``int(_, 2)``
    per sample, zigzag unfolded vectorized per partition."""
    method = br.read(2)
    if method > 1:
        raise FlacFormatError(f"reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts or blocksize // nparts <= order and po:
        raise FlacFormatError("invalid rice partition order")
    s = br.s
    slen = len(s)
    pos = br.pos
    chunks: list[np.ndarray] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise FlacFormatError("partition smaller than predictor order")
        if pos + plen > slen:
            raise FlacFormatError("bitstream truncated")
        k = int(s[pos : pos + plen], 2)
        pos += plen
        if k == escape:
            if pos + 5 > slen:
                raise FlacFormatError("bitstream truncated")
            width = int(s[pos : pos + 5], 2)
            pos += 5
            if width and n:
                end = pos + n * width
                if end > slen:
                    raise FlacFormatError("bitstream truncated")
                seg = br.arr[pos:end].reshape(n, width).astype(np.int64)
                pw = np.int64(1) << np.arange(
                    width - 1, -1, -1, dtype=np.int64
                )
                vals = seg @ pw
                sign = np.int64(1) << np.int64(width - 1)
                vals = np.where(
                    vals & sign, vals - (np.int64(1) << np.int64(width)), vals
                )
                chunks.append(vals)
                pos = end
            else:
                chunks.append(np.zeros(n, dtype=np.int64))
            continue
        if n == 0:
            continue
        if k == 0:
            ones = br.ones
            j = int(np.searchsorted(ones, pos))
            if j + n > len(ones):
                raise FlacFormatError("bitstream truncated in unary run")
            term = ones[j : j + n]
            u = np.empty(n, dtype=np.int64)
            u[0] = int(term[0]) - pos
            if n > 1:
                u[1:] = np.diff(term) - 1
            pos = int(term[-1]) + 1
        else:
            find = s.index
            vals_l: list[int] = []
            ap = vals_l.append
            try:
                for _ in range(n):
                    i1 = find("1", pos)
                    ap(((i1 - pos) << k) | int(s[i1 + 1 : i1 + 1 + k], 2))
                    pos = i1 + 1 + k
            except ValueError:
                raise FlacFormatError(
                    "bitstream truncated in unary run"
                ) from None
            if pos > slen:
                raise FlacFormatError("bitstream truncated")
            u = np.asarray(vals_l, dtype=np.int64)
        chunks.append((u >> 1) ^ -(u & 1))
    br.pos = pos
    if not chunks:
        return np.zeros(0, dtype=np.int64)
    return chunks[0] if len(chunks) == 1 else np.concatenate(chunks)


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    """One subframe -> int64 sample ndarray (length ``blocksize``).

    FIXED restore is the order-``o`` inverse difference, i.e. ``o``
    iterated ``cumsum`` passes seeded from the warmup samples — exact
    int64 and fully vectorized (every intermediate value is a genuine
    (j-1)-th difference of the signal, so no accumulation blowup).
    LPC stays sequential (true IIR with a floor shift) but runs with
    rolling scalars for the common orders 1/2."""
    if br.read(1):
        raise FlacFormatError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if bps <= 0:
        raise FlacFormatError("wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        end = br.pos + blocksize * bps
        if end > len(br.s):
            raise FlacFormatError("bitstream truncated")
        seg = br.arr[br.pos : end].reshape(blocksize, bps).astype(np.int64)
        pw = np.int64(1) << np.arange(bps - 1, -1, -1, dtype=np.int64)
        vals = seg @ pw
        sign = np.int64(1) << np.int64(bps - 1)
        out = np.where(
            vals & sign, vals - (np.int64(1) << np.int64(bps)), vals
        )
        br.pos = end
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        if order > blocksize:
            raise FlacFormatError("predictor order exceeds blocksize")
        warm = np.array(
            [br.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        res = _decode_residual(br, blocksize, order)
        if order == 0:
            out = res
        else:
            # res holds the order-th differences; integrate back one
            # order per pass, each pass seeded with the last warmup
            # value of that difference order (np.diff(warm, 0) = warm)
            cur = res
            for j in range(order, 0, -1):
                seed = int(np.diff(warm, j - 1)[-1])
                cur = np.cumsum(cur) + seed
            out = np.concatenate([warm, cur])
    elif t >= 32:  # LPC
        order = t - 31
        if order > blocksize:
            raise FlacFormatError("predictor order exceeds blocksize")
        outl = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0b1111:
            raise FlacFormatError("invalid lpc precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacFormatError("negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order).tolist()
        if order == 1:
            c0 = coefs[0]
            p1 = outl[-1]
            for r in res:
                p1 = r + ((c0 * p1) >> shift)
                outl.append(p1)
        elif order == 2:
            c0, c1 = coefs
            p1, p2 = outl[-1], outl[-2]
            for r in res:
                v = r + ((c0 * p1 + c1 * p2) >> shift)
                outl.append(v)
                p2 = p1
                p1 = v
        else:
            for r in res:
                m = len(outl)
                acc = 0
                for j in range(order):
                    acc += coefs[j] * outl[m - 1 - j]
                outl.append(r + (acc >> shift))
        try:
            out = np.asarray(outl, dtype=np.int64)
        except OverflowError:
            # corrupt LPC coefficients make the IIR feedback diverge;
            # genuine samples are bounded by bps (<= 33 bits)
            raise FlacFormatError("lpc reconstruction out of range") from None
    else:
        raise FlacFormatError(f"reserved subframe type {t}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes -> (rate, channels, samples) with samples an
    ``(n_frames, channels)`` int16 ndarray (int32 above 16 bps)."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise FlacFormatError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacFormatError("metadata overruns stream")
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise FlacFormatError("metadata block truncated")
        if btype == 0:
            if len(body) != 34:
                raise FlacFormatError("bad STREAMINFO length")
            b = int.from_bytes(body[10:18], "big")
            info = {
                "rate": b >> 44,
                "channels": ((b >> 41) & 0x7) + 1,
                "bps": ((b >> 36) & 0x1F) + 1,
                "total": b & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise FlacFormatError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise FlacFormatError("missing STREAMINFO")
    if not info["rate"]:
        raise FlacFormatError("invalid sample rate 0")

    nch = info["channels"]
    channels_out: list[list[np.ndarray]] = [[] for _ in range(nch)]
    decoded = 0
    frame_data = data[pos:]
    br = _Bits(frame_data)
    total_bits = len(br.s)
    while total_bits - br.pos >= 16:
        frame_start_bit = br.pos
        if br.read(14) != 0b11111111111110:
            raise FlacFormatError("lost frame sync")
        if br.read(1):
            raise FlacFormatError("frame header reserved bit set")
        br.read(1)  # blocking strategy (number semantics only)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise FlacFormatError("frame header reserved bit set")
        # coded number: validate shape, value unused for reassembly
        lead = br.read(8)
        n_cont = 0
        while n_cont < 7 and lead & (0x80 >> n_cont):
            n_cont += 1
        if n_cont == 1 or n_cont > 7:
            raise FlacFormatError("bad coded frame number")
        for _ in range(max(n_cont - 1, 0)):
            if br.read(8) & 0xC0 != 0x80:
                raise FlacFormatError("bad coded frame number continuation")
        if bs_code == 0b0000:
            raise FlacFormatError("reserved blocksize code")
        elif bs_code == 0b0110:
            blocksize = br.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0b0000:
            rate = info["rate"]
        elif sr_code == 0b1100:
            rate = br.read(8) * 1000
        elif sr_code == 0b1101:
            rate = br.read(16)
        elif sr_code == 0b1110:
            rate = br.read(16) * 10
        elif sr_code == 0b1111:
            raise FlacFormatError("invalid sample rate code")
        else:
            rate = _SAMPLE_RATE_TABLE[sr_code]
        if ss_code == 0b000:
            bps = info["bps"]
        elif ss_code == 0b011:
            raise FlacFormatError("reserved sample size code")
        else:
            bps = _SAMPLE_SIZE_TABLE[ss_code]
        hdr_bytes = frame_data[frame_start_bit // 8 : br.pos // 8]
        if crc8(hdr_bytes) != br.read(8):
            raise FlacFormatError("frame header CRC-8 mismatch")

        if ch_code <= 0b0111:
            frame_nch = ch_code + 1
            sub_bps = [bps] * frame_nch
        elif ch_code in (0b1000, 0b1001, 0b1010):
            frame_nch = 2
            # the SIDE channel carries one extra bit
            sub_bps = {
                0b1000: [bps, bps + 1],  # left-side
                0b1001: [bps + 1, bps],  # right-side
                0b1010: [bps, bps + 1],  # mid-side
            }[ch_code]
        else:
            raise FlacFormatError(f"reserved channel assignment {ch_code}")
        if frame_nch != nch:
            raise FlacFormatError("frame channel count != STREAMINFO")

        subs = [
            _decode_subframe(br, blocksize, sub_bps[c])
            for c in range(frame_nch)
        ]
        if ch_code == 0b1000:  # left-side: right = left - side
            subs = [subs[0], subs[0] - subs[1]]
        elif ch_code == 0b1001:  # right-side: left = right + side
            subs = [subs[1] + subs[0], subs[1]]
        elif ch_code == 0b1010:  # mid-side
            # l+r = (mid<<1)|(side&1) and l-r = side, so 2l is exact
            # and the floor shift loses nothing
            side = subs[1]
            left = (((subs[0] << 1) | (side & 1)) + side) >> 1
            subs = [left, left - side]
        br.align()
        frame_bytes = frame_data[frame_start_bit // 8 : br.pos // 8]
        if crc16(frame_bytes) != br.read(16):
            raise FlacFormatError("frame CRC-16 mismatch")
        for c in range(nch):
            channels_out[c].append(subs[c])
        decoded += blocksize
        if info["total"] and decoded >= info["total"]:
            break

    n = info["total"] or decoded
    if decoded < n:
        raise FlacFormatError("stream ends before total_samples")
    dtype = np.int16 if info["bps"] <= 16 else np.int32
    out = np.empty((n, nch), dtype=dtype)
    for c in range(nch):
        parts_c = channels_out[c] or [np.zeros(0, dtype=np.int64)]
        full = np.concatenate(parts_c) if len(parts_c) != 1 else parts_c[0]
        out[:, c] = full[:n].astype(dtype)
    if info["md5"] != b"\x00" * 16 and info["bps"] == 16:
        le = out.astype("<i2").tobytes()
        if hashlib.md5(le).digest() != info["md5"]:
            raise FlacFormatError("decoded audio MD5 mismatch")
    return info["rate"], nch, out


# ---------------------------------------------------------------------------
# encode (fixture builder: mono 16-bit, FIXED order search)
# ---------------------------------------------------------------------------


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (k + 1)


def _emit_residual(parts: list[str], res: np.ndarray) -> None:
    u = (np.abs(res.astype(np.int64)) << 1) - (res < 0).astype(np.int64)
    # u = zigzag fold; pick the 4-bit rice parameter with minimum cost
    best_k = min(range(15), key=lambda k: _rice_cost(u, k))
    parts.append("00")  # method: rice, 4-bit parameters
    parts.append("0000")  # partition order 0
    parts.append(format(best_k, "04b"))
    # assemble the whole partition as one bit array: sample i is
    # q_i zeros, a terminator one, then k remainder bits (k == 0
    # carries NO remainder bits)
    k = best_k
    q = u >> k
    n = len(u)
    if n == 0:
        return
    step = q + 1 + k
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        starts[1:] = np.cumsum(step[:-1])
    total = int(starts[-1] + step[-1])
    bits = np.zeros(total, dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    if k:
        r = u & ((1 << k) - 1)
        shifts = np.arange(k - 1, -1, -1, dtype=np.int64)
        rem = ((r[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        idx = term[:, None] + 1 + np.arange(k, dtype=np.int64)[None, :]
        bits[idx.ravel()] = rem.ravel()
    parts.append((bits + ord("0")).astype(np.uint8).tobytes().decode("ascii"))


def _signed_bits(v: int, n: int) -> str:
    return format(v & ((1 << n) - 1), f"0{n}b")


#: LPC encoder parameters (quantized-coefficient linear prediction;
#: the decode side is exact integer arithmetic, so ANY coefficients
#: round-trip — better ones just shrink the residuals)
_LPC_ORDER = 2
_LPC_PRECISION = 12  # coefficient bits
_LPC_SHIFT = 10  # right-shift applied to the prediction sum


def _lpc_analyze(block: np.ndarray):
    """Order-2 quantized LPC via autocorrelation + Levinson-Durbin.
    Returns (coefs, residual) with residual computed by the EXACT
    integer rule the decoder applies, or None when the block is too
    short or numerically degenerate."""
    n = len(block)
    if n <= _LPC_ORDER:
        return None
    x = block.astype(np.float64)
    r = [float(np.dot(x, x)), float(np.dot(x[:-1], x[1:])),
         float(np.dot(x[:-2], x[2:]))]
    if r[0] == 0:
        return None
    # Levinson-Durbin, order 2: reflection k2 then coefficient update
    a1 = r[1] / r[0]
    err = r[0] * (1 - a1 * a1)
    if err <= 0:
        return None
    k2 = (r[2] - a1 * r[1]) / err
    c1 = a1 - k2 * a1
    c2 = k2
    # quantize to _LPC_PRECISION-bit signed ints at _LPC_SHIFT
    lim = 1 << (_LPC_PRECISION - 1)
    q1 = max(-lim, min(lim - 1, int(round(c1 * (1 << _LPC_SHIFT)))))
    q2 = max(-lim, min(lim - 1, int(round(c2 * (1 << _LPC_SHIFT)))))
    if q1 == 0 and q2 == 0:
        return None
    # exact-integer residual, the decoder's rule in reverse
    pred = (q1 * block[1:-1] + q2 * block[:-2]) >> _LPC_SHIFT
    res = block[2:] - pred
    return (q1, q2), res


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    blocksize: int = 4096,
    use_lpc: bool = True,
) -> bytes:
    """(n,) int16 mono -> FLAC bytes (lossless; decode_flac inverts
    bit-exactly).  Each block is tried at FIXED orders 0-4 (sum-of-
    |residual| heuristic, the classic estimator) and, when it wins, a
    quantized order-2 LPC (autocorrelation + Levinson-Durbin, the
    real-codec path — the residual is computed by the decoder's exact
    integer rule, so ANY quantized coefficients round-trip); CONSTANT
    short-circuit; residuals are Rice-coded with the cost-optimal
    parameter.  ``use_lpc=False`` restricts to the FIXED family."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise FlacFormatError("encode_flac expects 1-D int16 samples")
    # FLAC's maximum blocksize is 65535 (STREAMINFO packs it in u16
    # and the frame header codes blocksize-1 in 16 bits)
    if not 16 <= blocksize <= 65535:
        raise FlacFormatError("blocksize out of range")
    n = len(samples)
    frames = bytearray()
    for fi, start in enumerate(range(0, max(n, 1), blocksize)):
        block = samples[start : start + blocksize].astype(np.int64)
        bs = len(block)
        if bs == 0:
            break
        hdr = bytearray()
        # sync(14) res(1) blocking(1)=0 | bs_code=0111 sr_code=0000
        hdr += bytes([0xFF, 0xF8, 0b0111_0000])
        # channel(4)=0000 mono, sample size(3)=100 (16), res(1)=0
        hdr += bytes([0b0000_100_0])
        hdr += _encode_coded_number(fi)
        hdr += struct.pack(">H", bs - 1)  # end-of-header blocksize
        hdr.append(crc8(bytes(hdr)))
        parts: list[str] = []
        if np.all(block == block[0]):
            parts.append("0" + "000000" + "0")  # CONSTANT
            parts.append(_signed_bits(int(block[0]), 16))
        else:
            orders = min(4, bs - 1)
            resids = {0: block}
            for o in range(1, orders + 1):
                resids[o] = np.diff(resids[o - 1])
            order = min(
                range(orders + 1),
                key=lambda o: int(np.abs(resids[o]).sum()) + o * 16,
            )
            lpc = _lpc_analyze(block) if use_lpc else None
            fixed_cost = int(np.abs(resids[order]).sum()) + order * 16
            if lpc is not None and (
                int(np.abs(lpc[1]).sum())
                + 2 * 16
                + 9
                + 2 * _LPC_PRECISION
                < fixed_cost
            ):
                (q1, q2), res = lpc
                # LPC order 2: type 0b100000 | (order-1)
                parts.append("0" + format(32 + 1, "06b") + "0")
                parts.append(_signed_bits(int(block[0]), 16))
                parts.append(_signed_bits(int(block[1]), 16))
                parts.append(format(_LPC_PRECISION - 1, "04b"))
                parts.append(_signed_bits(_LPC_SHIFT, 5))
                # coefs[0] multiplies the most recent sample
                parts.append(_signed_bits(q1, _LPC_PRECISION))
                parts.append(_signed_bits(q2, _LPC_PRECISION))
                _emit_residual(parts, res)
            else:
                parts.append("0" + format(8 + order, "06b") + "0")  # FIXED
                for v in block[:order].tolist():
                    parts.append(_signed_bits(v, 16))
                _emit_residual(parts, resids[order])
        bits = "".join(parts)
        bits += "0" * (-len(bits) % 8)
        body = np.packbits(
            np.frombuffer(bits.encode("ascii"), dtype=np.uint8) - ord("0")
        ).tobytes()
        frame = bytes(hdr) + body
        frames += frame + struct.pack(">H", crc16(frame))

    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    si = bytearray()
    si += struct.pack(">HH", blocksize, blocksize)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    packed = (rate << 44) | (0 << 41) | (15 << 36) | n  # mono, 16 bps
    si += packed.to_bytes(8, "big")
    si += md5
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    return header + bytes(frames)
