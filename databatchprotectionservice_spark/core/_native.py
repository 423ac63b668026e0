"""Optional C fast path for the two per-value hot loops.

The page-protection path has exactly two loops that numpy cannot fully
vectorize because each step depends on the previous one (the parquet
PLAIN ``[u32 len][bytes]`` walk) or because the access pattern is
per-element ragged (the variable-width keystream XOR). The reference
runs these at C speed (``parquet_utils.cpp``, ``basic_xor_encryptor.cpp``);
this module closes that gap by compiling a ~50-line C helper with the
system compiler at first import and binding it via ctypes.

Strictly optional: if no compiler exists (or ``DBPS_NATIVE=0``), ``LIB``
is ``None`` and callers keep their pure-numpy paths — same results,
verified by the same tests. The .so is cached per source-hash in the
user cache dir, so compilation happens once per machine, not per
executor process.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>
#include <string.h>

/* Parse `count` back-to-back [u32le len][bytes] records.
   Returns 0 ok / 1 truncated length prefix / 2 truncated element /
   3 trailing bytes — mirroring the numpy implementation's error order
   (prefix check per record; element overrun detected by final cursor).
   On success fills `flat` (size-4*count bytes) and `offsets` (count+1). */
int dbps_parse_plain(const uint8_t* src, int64_t size, int64_t count,
                     uint8_t* flat, int64_t* offsets) {
    int64_t pos = 0;
    offsets[0] = 0;
    for (int64_t i = 0; i < count; i++) {
        if (pos + 4 > size) return 1;
        uint32_t n;
        memcpy(&n, src + pos, 4);
        pos += 4 + (int64_t)n;
        offsets[i + 1] = offsets[i] + (int64_t)n;
        /* early classify on overrun: the numpy walk reports a truncated
           length prefix when a LATER record's prefix lands past the end,
           and a truncated element only when the overrun is the final
           record; bailing here also bounds pos/offsets against int64
           overflow on adversarial counts */
        if (pos > size) return (i == count - 1) ? 2 : 1;
    }
    if (pos < size) return 3;
    for (int64_t i = 0; i < count; i++) {
        memcpy(flat + offsets[i], src + offsets[i] + 4 * (i + 1),
               (size_t)(offsets[i + 1] - offsets[i]));
    }
    return 0;
}

/* Serialize to the same layout: dst must hold 4*count + flat bytes. */
void dbps_write_interleaved(const uint8_t* flat, const int64_t* offsets,
                            int64_t count, uint8_t* dst) {
    int64_t pos = 0;
    for (int64_t i = 0; i < count; i++) {
        uint32_t n = (uint32_t)(offsets[i + 1] - offsets[i]);
        memcpy(dst + pos, &n, 4);
        pos += 4;
        memcpy(dst + pos, flat + offsets[i], (size_t)n);
        pos += n;
    }
}

/* In-place per-element XOR against a keystream that restarts at every
   element (ks must cover the longest element). */
void dbps_xor_elements(uint8_t* data, const int64_t* offsets, int64_t count,
                       const uint8_t* ks) {
    for (int64_t i = 0; i < count; i++) {
        uint8_t* p = data + offsets[i];
        int64_t len = offsets[i + 1] - offsets[i];
        for (int64_t j = 0; j < len; j++) p[j] ^= ks[j];
    }
}

/* Undo PNG scanline filtering (spec filters 0-4) for a whole image.
   raw: h rows of [filter byte][stride bytes]; out: h*stride recon.
   The row above row 0 is all zeros, per spec. Returns 0 ok / 1 on an
   unknown filter type (mirrors the numpy path's error). */
int dbps_png_unfilter(const uint8_t* raw, int64_t h, int64_t stride,
                      int64_t bpp, uint8_t* out) {
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* src = raw + y * (stride + 1) + 1;
        uint8_t f = raw[y * (stride + 1)];
        uint8_t* rec = out + y * stride;
        const uint8_t* prev = y ? out + (y - 1) * stride : 0;
        int64_t x;
        switch (f) {
        case 0:
            memcpy(rec, src, (size_t)stride);
            break;
        case 1:
            for (x = 0; x < stride; x++)
                rec[x] = (uint8_t)(src[x] + (x >= bpp ? rec[x - bpp] : 0));
            break;
        case 2:
            for (x = 0; x < stride; x++)
                rec[x] = (uint8_t)(src[x] + (prev ? prev[x] : 0));
            break;
        case 3:
            for (x = 0; x < stride; x++) {
                int a = x >= bpp ? rec[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                rec[x] = (uint8_t)(src[x] + ((a + b) >> 1));
            }
            break;
        case 4:
            for (x = 0; x < stride; x++) {
                int a = x >= bpp ? rec[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
                int p = a + b - c;
                int pa = p > a ? p - a : a - p;
                int pb = p > b ? p - b : b - p;
                int pc = p > c ? p - c : c - p;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                rec[x] = (uint8_t)(src[x] + pred);
            }
            break;
        default:
            return 1;
        }
    }
    return 0;
}
"""

_U8P = ctypes.POINTER(ctypes.c_uint8)
_I64P = ctypes.POINTER(ctypes.c_int64)


def _compile() -> ctypes.CDLL | None:
    if os.environ.get("DBPS_NATIVE", "1") == "0":
        return None
    tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "dbps_native")
    so_path = os.path.join(cache_dir, f"dbps_native_{tag}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            src_path = os.path.join(cache_dir, f"dbps_native_{tag}.c")
            with open(src_path, "w") as f:
                f.write(_C_SOURCE)
            tmp_so = so_path + f".{os.getpid()}"
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-march=native", "-shared", "-fPIC",
                         "-o", tmp_so, src_path],
                        check=True,
                        capture_output=True,
                        timeout=60,
                    )
                    os.replace(tmp_so, so_path)  # atomic for racing workers
                    break
                except (OSError, subprocess.SubprocessError):
                    continue
            else:
                return None
        except OSError:
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.dbps_parse_plain.restype = ctypes.c_int
        lib.dbps_parse_plain.argtypes = [
            _U8P, ctypes.c_int64, ctypes.c_int64, _U8P, _I64P,
        ]
        lib.dbps_write_interleaved.restype = None
        lib.dbps_write_interleaved.argtypes = [
            _U8P, _I64P, ctypes.c_int64, _U8P,
        ]
        lib.dbps_xor_elements.restype = None
        lib.dbps_xor_elements.argtypes = [_U8P, _I64P, ctypes.c_int64, _U8P]
        lib.dbps_png_unfilter.restype = ctypes.c_int
        lib.dbps_png_unfilter.argtypes = [
            _U8P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _U8P,
        ]
        return lib
    except OSError:
        return None


LIB = _compile()


def _u8(a: np.ndarray) -> _U8P:
    return a.ctypes.data_as(_U8P)


def _i64(a: np.ndarray) -> _I64P:
    return a.ctypes.data_as(_I64P)


def parse_plain(
    buf: np.ndarray, count: int
) -> tuple[int, np.ndarray, np.ndarray]:
    """Returns (err_code, flat, offsets); err_code as documented in C."""
    buf = np.ascontiguousarray(buf)
    # on any error the C scan returns before its copy pass, so a
    # too-small (even empty) flat buffer is never written
    flat = np.empty(max(buf.size - 4 * count, 0), dtype=np.uint8)
    offsets = np.empty(count + 1, dtype=np.int64)
    err = LIB.dbps_parse_plain(
        _u8(buf), buf.size, count, _u8(flat), _i64(offsets)
    )
    return err, flat, offsets


def write_interleaved(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    flat = np.ascontiguousarray(flat)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    count = len(offsets) - 1
    out = np.empty(4 * count + flat.size, dtype=np.uint8)
    LIB.dbps_write_interleaved(_u8(flat), _i64(offsets), count, _u8(out))
    return out


def xor_elements(
    flat: np.ndarray, offsets: np.ndarray, ks: np.ndarray
) -> np.ndarray:
    out = np.array(flat, dtype=np.uint8, copy=True)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    LIB.dbps_xor_elements(_u8(out), _i64(offsets), len(offsets) - 1, _u8(ks))
    return out


def png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Whole-image PNG unfilter at C speed; returns the (h, stride)
    reconstruction. Raises ValueError on an unknown filter type so the
    caller maps it to its own error class."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty((h, stride), dtype=np.uint8)
    err = LIB.dbps_png_unfilter(_u8(raw), h, stride, bpp, _u8(out))
    if err:
        raise ValueError("bad PNG filter type")
    return out
