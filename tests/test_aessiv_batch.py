"""BatchSIV must be byte-identical to cryptography's AESSIV.

RFC 5297 is fully deterministic, so the batched evaluation (per-round
ECB over all elements) and the scalar library must agree exactly —
checked here over block-boundary lengths, random batches, and the
authentication failure modes."""

import hashlib

import numpy as np
import pytest

from databatchprotectionservice_spark.core.aessiv_batch import BatchSIV
from databatchprotectionservice_spark.core.errors import DBPSInvalidInputError
from databatchprotectionservice_spark.core.keystream import AesSivEncryptor

KEY = hashlib.sha256(b"dbps-key:key_T").digest()
AD = b"value"


def _ref():
    from cryptography.hazmat.primitives.ciphers.aead import AESSIV

    return AESSIV(KEY)


def _arrow(elems):
    flat = np.frombuffer(b"".join(elems), dtype=np.uint8)
    off = np.zeros(len(elems) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in elems], out=off[1:])
    return flat, off


def _elems(flat, off):
    return [
        flat[off[i] : off[i + 1]].tobytes() for i in range(len(off) - 1)
    ]


BOUNDARY_LENS = [0, 1, 15, 16, 17, 31, 32, 33, 47, 48, 100, 1000]


def test_encrypt_matches_cryptography_on_boundary_lengths():
    rng = np.random.default_rng(3)
    elems = [
        bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for n in BOUNDARY_LENS
    ]
    b = BatchSIV(KEY, AD)
    ref = _ref()
    ct_flat, ct_off = b.encrypt_batch(*_arrow(elems))
    for pt, ct in zip(elems, _elems(ct_flat, ct_off)):
        assert ct == (ref.encrypt(pt, [AD]) if pt else b"")


def test_random_batch_parity_and_roundtrip():
    rng = np.random.default_rng(11)
    elems = [
        bytes(rng.integers(0, 256, int(rng.integers(0, 64)), dtype=np.uint8))
        for _ in range(400)
    ]
    b = BatchSIV(KEY, AD)
    ref = _ref()
    ct_flat, ct_off = b.encrypt_batch(*_arrow(elems))
    assert _elems(ct_flat, ct_off) == [
        ref.encrypt(pt, [AD]) if pt else b"" for pt in elems
    ]
    pt_flat, pt_off = b.decrypt_batch(ct_flat, ct_off)
    assert _elems(pt_flat, pt_off) == elems


def test_tamper_and_wrong_key_raise():
    b = BatchSIV(KEY, AD)
    ct_flat, ct_off = b.encrypt_batch(*_arrow([b"attack at dawn, eh"]))
    bad = ct_flat.copy()
    bad[20] ^= 1
    with pytest.raises(DBPSInvalidInputError, match="authentication"):
        b.decrypt_batch(bad, ct_off)
    other = BatchSIV(hashlib.sha256(b"other").digest(), AD)
    with pytest.raises(DBPSInvalidInputError, match="authentication"):
        other.decrypt_batch(ct_flat, ct_off)


def test_truncated_ciphertext_raises():
    b = BatchSIV(KEY, AD)
    with pytest.raises(DBPSInvalidInputError, match="authentication"):
        b.decrypt_batch(
            np.frombuffer(b"short", dtype=np.uint8),
            np.array([0, 5], dtype=np.int64),
        )


def test_encryptor_batch_and_scalar_paths_agree(monkeypatch):
    """AesSivEncryptor with and without the batch engine produce the
    same bytes and the same offsets (empty-element bypass included)."""
    rng = np.random.default_rng(5)
    elems = [b"", b"x", bytes(rng.integers(0, 256, 40, dtype=np.uint8)), b""]
    flat, off = _arrow(elems)
    fast = AesSivEncryptor("key_T")
    assert fast._batch is not None
    monkeypatch.setenv("DBPS_SIV_BATCH", "0")
    slow = AesSivEncryptor("key_T")
    assert slow._batch is None
    f_flat, f_off = fast.encrypt_elements(flat, off)
    s_flat, s_off = slow.encrypt_elements(flat, off)
    assert f_flat.tobytes() == s_flat.tobytes()
    assert list(f_off) == list(s_off)
    d_flat, d_off = fast.decrypt_elements(f_flat, f_off)
    assert d_flat.tobytes() == flat.tobytes()
    assert list(d_off) == list(off)
