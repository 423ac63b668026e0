"""Batched AES-SIV (RFC 5297) — the per-value AEAD hot path.

``cryptography``'s ``AESSIV`` has no batch API, so the naive per-value
path pays one Python round-trip per element — the one known 100 TB
trade-off called out in SCALE.md. This module closes it by evaluating
RFC 5297 directly with numpy + AES-ECB, which IS batchable:

* **S2V / CMAC**: CBC-MAC chains are sequential per element but
  independent ACROSS elements, so round ``j`` encrypts block ``j`` of
  every still-active element in ONE ``Cipher(AES, ECB)`` update call.
  Python calls per batch = max block count, not element count.
* **CTR**: SIV's counter mode is ``AES(Q+t)`` keystream XOR plaintext;
  all counter blocks of all elements concatenate into a single ECB
  call.

Two data layouts, because the numpy bookkeeping (not AES) dominates:

* **uniform width** (every element the same length — all fixed-width
  types, and same-length string batches): pure 2D reshapes, no ragged
  index maps at all;
* **ragged**: the block-aligned scatter/gather maps are built once per
  batch and shared between S2V and CTR (their per-element block counts
  coincide for non-empty elements).

Output is byte-identical to
``cryptography.hazmat.primitives.ciphers.aead.AESSIV`` (pinned by
tests/test_aessiv_batch.py against random vectors), because RFC 5297
is fully deterministic.

Scalar reference: mirrors the semantics of the reference's pluggable
encryptor slot (``dbps_encryptor.h:87-109``); the keystream/XOR twin
lives in ``core/keystream.py``.
"""

from __future__ import annotations

import numpy as np

from .errors import DBPSInvalidInputError

_BS = 16  # AES block size


def _dbl(block: bytes) -> bytes:
    """RFC 5297 doubling in GF(2^128): shl 1, conditionally XOR 0x87."""
    n = int.from_bytes(block, "big")
    n <<= 1
    if n >> 128:
        n = (n & ((1 << 128) - 1)) ^ 0x87
    return n.to_bytes(_BS, "big")


def _pad(data: bytes) -> bytes:
    """10* padding to one block."""
    return data + b"\x80" + b"\x00" * (_BS - len(data) - 1)


_AUTH_FAIL = (
    "AES-SIV authentication failed: ciphertext tampered or wrong key"
)


def _ragged_positions(
    shift: np.ndarray, lens: np.ndarray, total: int
) -> np.ndarray:
    """``np.repeat(shift, lens) + np.arange(total)``, repeat-free:
    within an element positions step by 1, at each boundary they jump
    by the shift delta — one boundary scatter + one cumsum. int32 and
    calloc throughout: the repeat kernel and filled 8-byte-per-payload-
    byte allocations dominate the batch-SIV bookkeeping otherwise (an
    Arrow batch is always < 2^31 bytes, so int32 indexes it)."""
    out = np.zeros(total, dtype=np.int32)
    if total == 0:
        return out
    nz = lens > 0
    if not nz.all():
        shift, lens = shift[nz], lens[nz]
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # piecewise-constant expansion of shift (boundary-scatter + cumsum),
    # then the per-byte arange on top
    out[0] = shift[0]
    if len(shift) > 1:
        out[starts[1:]] = np.diff(shift).astype(np.int32)
    np.cumsum(out, out=out)
    out += np.arange(total, dtype=np.int32)
    return out


def _block_index_maps(
    n_blocks: np.ndarray, bstarts: np.ndarray, total_blocks: int
) -> tuple[np.ndarray, np.ndarray]:
    """(element index, within-element block index) per global block —
    ``repeat(arange(n), n_blocks)`` and ``arange(total) - bstarts[rep]``
    built repeat-free (n_blocks is always >= 1 per element)."""
    rep = np.zeros(total_blocks, dtype=np.int32)
    if total_blocks:
        rep[bstarts[1:]] = 1
        np.cumsum(rep, out=rep)
    t = np.arange(total_blocks, dtype=np.int32) - bstarts.astype(np.int32)[rep]
    return rep, t


class BatchSIV:
    """Vectorized AES-SIV over Arrow-layout batches (flat uint8 + int64
    offsets). One instance per (key, associated-data) pair; the S2V
    constants for the fixed AD are precomputed once."""

    def __init__(self, key: bytes, ad: bytes):
        if len(key) != 32:
            raise DBPSInvalidInputError("BatchSIV wants a 32-byte key")
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )

        # RFC 5297: first half is the S2V (CMAC) key, second the CTR key
        self._mac = Cipher(algorithms.AES(key[:_BS]), modes.ECB()).encryptor()
        self._ctr = Cipher(algorithms.AES(key[_BS:]), modes.ECB()).encryptor()
        # CMAC subkeys
        zero = b"\x00" * _BS
        self._k1 = np.frombuffer(_dbl(self._mac.update(zero)), np.uint8)
        self._k2 = np.frombuffer(_dbl(self._k1.tobytes()), np.uint8)
        # S2V accumulator after the AD: D = dbl(CMAC(0^16)) ^ CMAC(ad)
        d = _dbl(self._cmac_scalar(zero))
        self._d_ad = np.frombuffer(
            bytes(a ^ b for a, b in zip(d, self._cmac_scalar(ad))),
            dtype=np.uint8,
        )
        self._d_ad_dbl = np.frombuffer(_dbl(self._d_ad.tobytes()), np.uint8)

    # -- scalar CMAC (setup constants only; data path is batched) ------
    def _cmac_scalar(self, msg: bytes) -> bytes:
        k1, k2 = self._k1.tobytes(), self._k2.tobytes()
        if len(msg) % _BS == 0 and msg:
            last = bytes(a ^ b for a, b in zip(msg[-_BS:], k1))
            body = msg[:-_BS]
        else:
            tail = msg[len(msg) // _BS * _BS :]
            last = bytes(a ^ b for a, b in zip(_pad(tail), k2))
            body = msg[: len(msg) // _BS * _BS]
        x = b"\x00" * _BS
        for i in range(0, len(body), _BS):
            x = self._mac.update(
                bytes(a ^ c for a, c in zip(x, body[i : i + _BS]))
            )
        return self._mac.update(bytes(a ^ c for a, c in zip(x, last)))

    # -- uniform-width kernels (pure 2D, no ragged maps) ---------------
    def _s2v_uniform(self, flat: np.ndarray, n: int, w: int) -> np.ndarray:
        """S2V of n elements of identical width w >= 0."""
        tw = max(w, _BS)  # short elements pad to one block
        nb = -(-tw // _BS)
        blocks = np.zeros((n, nb * _BS), dtype=np.uint8)
        if w:
            blocks[:, :w] = flat.reshape(n, w)
        if w < _BS:
            # T = dbl(D_ad) ^ pad(P): one complete block
            blocks[:, w] = 0x80
            blocks[:, :_BS] ^= self._d_ad_dbl
        else:
            # T = P xorend D_ad
            blocks[:, w - _BS : w] ^= self._d_ad
        # CMAC finalization on the last block
        if tw % _BS == 0:
            blocks[:, (nb - 1) * _BS :] ^= self._k1
        else:
            blocks[:, tw] = 0x80
            blocks[:, (nb - 1) * _BS :] ^= self._k2
        x = np.zeros((n, _BS), dtype=np.uint8)
        for j in range(nb):
            inp = x ^ blocks[:, j * _BS : (j + 1) * _BS]
            x = np.frombuffer(
                self._mac.update(inp.tobytes()), np.uint8
            ).reshape(n, _BS)
        return x

    def _ctr_xor_uniform(
        self, sivs: np.ndarray, flat: np.ndarray, n: int, w: int
    ) -> np.ndarray:
        if w == 0:
            return flat.copy()
        hi, lo = self._q_words(sivs)
        nb = -(-w // _BS)
        t = np.arange(nb, dtype=np.uint64)
        with np.errstate(over="ignore"):
            lo_t = lo[:, None] + t
            hi_t = hi[:, None] + (lo_t < t).astype(np.uint64)
        ks = self._ks_from_words(hi_t.reshape(-1), lo_t.reshape(-1))
        return (
            flat.reshape(n, w) ^ ks.reshape(n, nb * _BS)[:, :w]
        ).reshape(-1)

    # -- shared CTR helpers --------------------------------------------
    @staticmethod
    def _q_words(sivs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hi, lo) native-uint64 halves of Q = SIV with the two
        reserved bits cleared (RFC 5297 §2.5)."""
        q = sivs.copy()
        q[:, 8] &= 0x7F
        q[:, 12] &= 0x7F
        hi = q[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)
        lo = q[:, 8:].copy().view(">u8").reshape(-1).astype(np.uint64)
        return hi, lo

    def _ks_from_words(self, hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        counters = np.empty((hi.size, _BS), dtype=np.uint8)
        counters[:, :8] = hi.astype(">u8").view(np.uint8).reshape(-1, 8)
        counters[:, 8:] = lo.astype(">u8").view(np.uint8).reshape(-1, 8)
        return np.frombuffer(self._ctr.update(counters.tobytes()), np.uint8)

    # -- ragged kernels -------------------------------------------------
    def _ragged_maps(self, offsets: np.ndarray):
        """Shared block-layout maps for non-empty ragged elements:
        (lens, n_blocks, block_starts, byte->block position map)."""
        lens = np.diff(offsets)
        n_blocks = np.maximum(-(-lens // _BS), 1)
        bstarts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(n_blocks[:-1], out=bstarts[1:])
        # position of each flat byte inside the block-aligned buffer —
        # built once and reused by S2V + CTR
        shift = bstarts * _BS - offsets[:-1]
        pos = _ragged_positions(shift, lens, int(offsets[-1]))
        return lens, n_blocks, bstarts, pos

    def _s2v_ragged(
        self,
        flat: np.ndarray,
        offsets: np.ndarray,
        lens: np.ndarray,
        n_blocks: np.ndarray,
        bstarts: np.ndarray,
        pos: np.ndarray,
    ) -> np.ndarray:
        n = len(lens)
        long = lens >= _BS
        t_lens = np.where(long, lens, _BS)
        blocks = np.zeros((int(n_blocks.sum()), _BS), dtype=np.uint8)
        blk = blocks.reshape(-1)
        blk[pos] = flat
        last_rows = bstarts + n_blocks - 1
        short = ~long
        if short.any():
            # short: T = dbl(D_ad) ^ pad(P), a single complete block
            blk[bstarts[short] * _BS + lens[short]] = 0x80
            blocks[bstarts[short]] ^= self._d_ad_dbl
        if long.any():
            # long: T = P xorend D_ad — the last 16 plaintext bytes may
            # straddle two blocks, so XOR via the byte position map
            tail_base = (bstarts * _BS - offsets[:-1] + offsets[1:] - _BS)[
                long
            ]
            tail_pos = (tail_base[:, None] + np.arange(_BS)).reshape(-1)
            blk[tail_pos] ^= np.tile(self._d_ad, int(long.sum()))
        complete = t_lens % _BS == 0
        if complete.any():
            blocks[last_rows[complete]] ^= self._k1
        ragged = ~complete
        if ragged.any():
            blk[last_rows[ragged] * _BS + (t_lens % _BS)[ragged]] ^= 0x80
            blocks[last_rows[ragged]] ^= self._k2
        x = np.zeros((n, _BS), dtype=np.uint8)
        for j in range(int(n_blocks.max())):
            active = n_blocks > j
            if active.all():
                inp = x ^ blocks[bstarts + j]
                # bytearray: keeps x writable for later partial rounds
                x = np.frombuffer(
                    bytearray(self._mac.update(inp.tobytes())), np.uint8
                ).reshape(n, _BS)
            else:
                inp = x[active] ^ blocks[bstarts[active] + j]
                out = self._mac.update(inp.tobytes())
                x[active] = np.frombuffer(out, np.uint8).reshape(-1, _BS)
        return x

    def _ctr_xor_ragged(
        self,
        sivs: np.ndarray,
        flat: np.ndarray,
        lens: np.ndarray,
        n_blocks: np.ndarray,
        bstarts: np.ndarray,
        pos: np.ndarray,
    ) -> np.ndarray:
        if flat.size == 0:
            return flat.copy()
        hi, lo = self._q_words(sivs)
        rep, t = _block_index_maps(n_blocks, bstarts, int(n_blocks.sum()))
        t = t.astype(np.uint64)
        with np.errstate(over="ignore"):
            lo_t = lo[rep] + t
            hi_t = hi[rep] + (lo_t < t).astype(np.uint64)
        ks = self._ks_from_words(hi_t, lo_t)
        return flat ^ ks[pos]

    def _s2v_and_ctr(
        self, flat: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(sivs, ctr_of_flat) for non-empty elements, choosing the
        uniform or ragged layout. S2V runs on the plaintext for encrypt;
        decrypt calls the pieces separately."""
        lens = np.diff(offsets)
        n = len(lens)
        w = int(lens[0]) if n else 0
        if n and int(lens.min()) == int(lens.max()):
            sivs = self._s2v_uniform(flat, n, w)
            return sivs, self._ctr_xor_uniform(sivs, flat, n, w)
        maps = self._ragged_maps(offsets)
        sivs = self._s2v_ragged(flat, offsets, *maps)
        return sivs, self._ctr_xor_ragged(sivs, flat, *maps)

    # -- public batch API ----------------------------------------------
    def encrypt_batch(
        self, flat: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Element-wise ``AESSIV.encrypt(P, [ad])``: each output element
        is ``V || CTR(P)`` (16-byte SIV prepended). Empty elements pass
        through empty (the engine's documented null/empty bypass)."""
        lens = np.diff(offsets)
        new_offsets = np.zeros_like(offsets)
        np.cumsum(np.where(lens > 0, lens + _BS, 0), out=new_offsets[1:])
        nonempty = lens > 0
        if not nonempty.any():
            return np.empty(0, dtype=np.uint8), new_offsets
        if nonempty.all():
            sub_flat, sub_off = flat, offsets
        else:
            sub_flat = flat[np.repeat(nonempty, lens)]
            sub_off = np.zeros(int(nonempty.sum()) + 1, dtype=np.int64)
            np.cumsum(lens[nonempty], out=sub_off[1:])
        sivs, body = self._s2v_and_ctr(sub_flat, sub_off)
        out = np.empty(int(new_offsets[-1]), dtype=np.uint8)
        ne_starts = new_offsets[:-1][nonempty]
        sub_lens = np.diff(sub_off)
        if int(sub_lens.min()) == int(sub_lens.max()):
            w = int(sub_lens[0])
            o2 = out.reshape(-1, _BS + w)
            o2[:, :_BS] = sivs
            o2[:, _BS:] = body.reshape(-1, w)
        else:
            iv_pos = (ne_starts[:, None] + np.arange(_BS)).reshape(-1)
            out[iv_pos] = sivs.reshape(-1)
            body_pos = _ragged_positions(
                ne_starts + _BS - sub_off[:-1], sub_lens, body.size
            )
            out[body_pos] = body
        return out, new_offsets

    def decrypt_batch(
        self, flat: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Element-wise ``AESSIV.decrypt``; raises on any authentication
        failure (tampered ciphertext or wrong key), matching the scalar
        path's error contract."""
        lens = np.diff(offsets)
        if ((lens > 0) & (lens < _BS)).any():
            raise DBPSInvalidInputError(_AUTH_FAIL)
        new_offsets = np.zeros_like(offsets)
        np.cumsum(np.where(lens > 0, lens - _BS, 0), out=new_offsets[1:])
        nonempty = lens > 0
        if not nonempty.any():
            return np.empty(0, dtype=np.uint8), new_offsets
        starts = offsets[:-1][nonempty]
        ne_lens = lens[nonempty]
        body_lens = ne_lens - _BS
        sub_off = np.zeros(len(body_lens) + 1, dtype=np.int64)
        np.cumsum(body_lens, out=sub_off[1:])
        if int(ne_lens.min()) == int(ne_lens.max()):
            w = int(ne_lens[0])
            if nonempty.all():
                ct2 = flat.reshape(-1, w)
            else:
                ct2 = flat[np.repeat(nonempty, lens)].reshape(-1, w)
            sivs = np.ascontiguousarray(ct2[:, :_BS])
            body = np.ascontiguousarray(ct2[:, _BS:]).reshape(-1)
        else:
            iv_pos = (starts[:, None] + np.arange(_BS)).reshape(-1)
            sivs = flat[iv_pos].reshape(-1, _BS)
            body_pos = _ragged_positions(
                starts + _BS - sub_off[:-1], body_lens, int(sub_off[-1])
            )
            body = flat[body_pos]
        # CTR then re-derive S2V of the recovered plaintext; it must
        # equal the transmitted IV (for a 16-byte ciphertext that's S2V
        # of the empty string, matching AESSIV.decrypt's acceptance of
        # a valid empty encryption and InvalidTag otherwise)
        n = len(body_lens)
        if int(body_lens.min()) == int(body_lens.max()):
            w = int(body_lens[0])
            plain = self._ctr_xor_uniform(sivs, body, n, w)
            check = self._s2v_uniform(plain, n, w)
        else:
            maps = self._ragged_maps(sub_off)
            plain = self._ctr_xor_ragged(sivs, body, *maps)
            check = self._s2v_ragged(plain, sub_off, *maps)
        if not np.array_equal(check, sivs):
            raise DBPSInvalidInputError(_AUTH_FAIL)
        return plain, new_offsets
