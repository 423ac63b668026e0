"""Property-based round-trip tests (hypothesis) for the core layers.

The reference's test discipline is exhaustive hand-written round-trips;
hypothesis generalizes it: for arbitrary element lists, keys, and page
shapes, decrypt(encrypt(x)) == x and every wire codec inverts exactly.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core import wire
from databatchprotectionservice_spark.core.keystream import make_encryptor
from databatchprotectionservice_spark.core.pagecodec import (
    PageAttributes,
    PageProtector,
)
from databatchprotectionservice_spark.core.types import (
    CompressionCodec,
    PhysicalType,
)
from tests.pagebuilders import build_v1_page, build_v2_page

keys = st.text(min_size=1, max_size=20)
element_lists = st.lists(st.binary(min_size=0, max_size=300), max_size=80)


@settings(max_examples=60, deadline=None)
@given(values=element_lists, key=keys)
def test_keystream_elements_roundtrip(values, key):
    enc = make_encryptor("keystream_xor", key)
    flat, offsets = wire.bytes_list_to_arrow(values)
    ct_flat, ct_offsets = enc.encrypt_elements(flat, offsets)
    assert np.array_equal(ct_offsets, offsets)  # length-preserving
    pt_flat, pt_offsets = enc.decrypt_elements(ct_flat, ct_offsets)
    assert wire.arrow_to_bytes_list(pt_flat, pt_offsets) == values


@settings(max_examples=30, deadline=None)
@given(values=element_lists, key=keys)
def test_aes_siv_elements_roundtrip(values, key):
    enc = make_encryptor("aes_siv", key)
    flat, offsets = wire.bytes_list_to_arrow(values)
    ct_flat, ct_offsets = enc.encrypt_elements(flat, offsets)
    pt_flat, pt_offsets = enc.decrypt_elements(ct_flat, ct_offsets)
    assert wire.arrow_to_bytes_list(pt_flat, pt_offsets) == values


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096), key=keys)
def test_block_roundtrip_and_key_sensitivity(data, key):
    enc = make_encryptor("keystream_xor", key)
    ct = enc.encrypt_block(data)
    assert enc.decrypt_block(ct) == data
    if data:
        other = make_encryptor("keystream_xor", key + "x")
        assert other.encrypt_block(data) != ct or data == b""


@settings(max_examples=60, deadline=None)
@given(values=element_lists)
def test_wire_value_list_roundtrip_variable(values):
    flat, offsets = wire.bytes_list_to_arrow(values)
    blob = wire.write_value_list(flat, offsets, None)
    flat2, offsets2, fixed = wire.read_value_list(blob)
    assert fixed is None
    assert wire.arrow_to_bytes_list(flat2, offsets2) == values


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=50),
    width=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**32),
)
def test_wire_value_list_roundtrip_fixed(n, width, seed):
    rng = np.random.default_rng(seed)
    flat = rng.integers(0, 256, size=n * width, dtype=np.uint8)
    offsets = np.arange(n + 1, dtype=np.int64) * width
    blob = wire.write_value_list(flat, offsets, width)
    flat2, offsets2, fixed = wire.read_value_list(blob)
    assert fixed == width
    assert np.array_equal(flat2, flat) and np.array_equal(offsets2, offsets)


@settings(max_examples=40, deadline=None)
@given(first=st.binary(max_size=500), second=st.binary(max_size=500))
def test_length_prefix_join_split(first, second):
    assert wire.split_with_length_prefix(
        wire.join_with_length_prefix(first, second)
    ) == (first, second)


_page_values = st.lists(
    st.text(max_size=40), min_size=1, max_size=60
)


@settings(max_examples=25, deadline=None)
@given(
    values=_page_values,
    key=keys,
    snappy=st.booleans(),
    v2=st.booleans(),
    encryptor=st.sampled_from(["keystream_xor", "aes_siv"]),
)
def test_page_roundtrip_byte_array(values, key, snappy, v2, encryptor):
    codec = CompressionCodec.SNAPPY if snappy else CompressionCodec.UNCOMPRESSED
    build = build_v2_page if v2 else build_v1_page
    page, attrs = build(values, PhysicalType.BYTE_ARRAY, codec)
    protector = PageProtector(
        "col",
        key,
        PhysicalType.BYTE_ARRAY,
        compression=codec,
        encryptor_name=encryptor,
    )
    pa_ = PageAttributes.from_string_map(attrs)
    ct, meta = protector.encrypt(page, pa_)
    assert meta["encrypt_mode_data_page"] == "per_value"
    assert protector.decrypt(ct, pa_, meta) == page


@settings(max_examples=25, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=100,
    ),
    key=keys,
    nullable=st.booleans(),
)
def test_page_roundtrip_int64_nullable(values, key, nullable):
    mask = [i % 3 != 0 for i in range(len(values) + 2)] if nullable else None
    if mask is not None:
        # mask must have exactly len(values) True slots
        mask = ([True] * len(values)) + [False, False]
    page, attrs = build_v1_page(
        values, PhysicalType.INT64, CompressionCodec.UNCOMPRESSED, nullable_mask=mask
    )
    protector = PageProtector("col", key, PhysicalType.INT64)
    pa_ = PageAttributes.from_string_map(attrs)
    ct, meta = protector.encrypt(page, pa_)
    assert protector.decrypt(ct, pa_, meta) == page


@settings(max_examples=40, deadline=None)
@given(
    count=st.integers(min_value=0, max_value=30),
    junk=st.binary(min_size=0, max_size=64),
)
def test_parse_length_prefixed_rejects_garbage(count, junk):
    """Arbitrary truncation/garbage either parses consistently or raises
    DBPSInvalidInputError — never crashes or mis-sizes."""
    from databatchprotectionservice_spark.core.errors import DBPSError

    try:
        flat, offsets = wire.parse_length_prefixed(junk, count)
    except DBPSError:
        return
    rebuilt = b"".join(
        len(v).to_bytes(4, "little") + v
        for v in wire.arrow_to_bytes_list(flat, offsets)
    )
    assert rebuilt == junk
    assert len(offsets) == count + 1


@pytest.mark.parametrize("encryptor", ["keystream_xor", "aes_siv"])
def test_empty_elements_and_offsets_edge(encryptor):
    enc = make_encryptor(encryptor, "k")
    flat, offsets = wire.bytes_list_to_arrow([b"", b"", b""])
    ct_flat, ct_offsets = enc.encrypt_elements(flat, offsets)
    pt_flat, pt_offsets = enc.decrypt_elements(ct_flat, ct_offsets)
    assert wire.arrow_to_bytes_list(pt_flat, pt_offsets) == [b"", b"", b""]


@settings(max_examples=40, deadline=None)
@given(values=element_lists, k1=keys, k2=keys)
def test_rotation_identity_at_element_level(values, k1, k2):
    """rotate = decrypt(old) . encrypt(new): for ANY element list and any
    key pair, decrypt-with-new of rotate equals the original — the
    element-level law behind functions.protect.rotate_key_column."""
    old = make_encryptor("keystream_xor", k1)
    new = make_encryptor("keystream_xor", k2)
    flat, offsets = wire.bytes_list_to_arrow(values)
    ct_flat, ct_offsets = old.encrypt_elements(flat, offsets)
    # the rotation pass
    pt_flat, pt_offsets = old.decrypt_elements(ct_flat, ct_offsets)
    rot_flat, rot_offsets = new.encrypt_elements(pt_flat, pt_offsets)
    # reads under the new key restore the original values
    back_flat, back_offsets = new.decrypt_elements(rot_flat, rot_offsets)
    assert wire.arrow_to_bytes_list(back_flat, back_offsets) == values
    # and under the old key they do not (unless the keystreams collide)
    if k1 != k2 and any(len(v) for v in values):
        stale_flat, stale_offsets = old.decrypt_elements(rot_flat, rot_offsets)
        stale = wire.arrow_to_bytes_list(stale_flat, stale_offsets)
        ks1 = old.encrypt_block(b"\x00" * 64)
        ks2 = new.encrypt_block(b"\x00" * 64)
        if ks1 != ks2:
            assert stale != values


# --- int8 scalar quantization (operators/similarity.py) -------------------

finite_vecs = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=1,
    max_size=64,
)


@settings(max_examples=200, deadline=None)
@given(vec=finite_vecs)
def test_int8_quantization_error_bound_and_range(vec):
    """Numpy twin of the `qi8` kernel: codes stay in [-127, 127], the
    max |x| element always maps to ±127, and dequantization error is
    bounded by half a step (scale / 254) per element."""
    import math

    import numpy as np

    x = np.asarray(vec, dtype=np.float32).astype(np.float64)
    s = np.abs(x).max()
    if s == 0:
        codes = np.zeros(len(x), dtype=np.int32)
    else:
        codes = np.floor(x / s * 127.0 + 0.5).astype(np.int32)
    assert codes.min() >= -127 and codes.max() <= 127
    if s > 0:
        assert np.abs(codes).max() == 127
        # one reconstruction step is s/127; round-half-up => error <= half
        recon = codes.astype(np.float64) * s / 127.0
        step = s / 127.0
        assert np.abs(recon - x).max() <= step / 2.0 + 1e-9 * s
        # per-element twin of the scalar expression used in the oracle
        for xi, ci in zip(x, codes):
            assert ci == int(math.floor(xi / s * 127.0 + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=2000,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    blocksize=st.sampled_from([16, 192, 4096]),
)
def test_flac_roundtrip_property(samples, rate, blocksize):
    """decode(encode(x)) == x bit-exactly for arbitrary int16 signals
    across blocksize regimes (multi-frame, short-last-frame, and the
    minimum legal blocksize)."""
    from databatchprotectionservice_spark.core.flaccodec import (
        decode_flac,
        encode_flac,
    )

    s = np.array(samples, dtype=np.int16)
    got_rate, ch, out = decode_flac(encode_flac(s, rate=rate, blocksize=blocksize))
    assert (got_rate, ch) == (rate, 1)
    assert np.array_equal(out[:, 0], s)
