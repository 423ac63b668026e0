"""Page codec + sequencer tests.

Ports the round-trip matrices of ``encryption_sequencer_test.cpp``
(encrypt/decrypt per page type & datatype incl. nullable V1/V2 pages,
per-block fallback for BOOLEAN/RLE_DICTIONARY/unsupported codecs, version
and mode validation) and the V1 definition-level decoding vectors of
``parquet_utils_test.cpp:256-435``.
"""

import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.pagecodec import (
    DBPS_VERSION_KEY,
    MODE_KEY_DATA_PAGE,
    MODE_KEY_DICT_PAGE,
    MODE_PER_BLOCK,
    MODE_PER_VALUE,
    PageAttributes,
    PageProtector,
    count_present_values_v1,
    decompress_and_split,
)
from databatchprotectionservice_spark.core.types import (
    CompressionCodec,
    Encoding,
    PhysicalType,
)

from .pagebuilders import (
    bitpacked_def_levels,
    build_dict_page,
    build_v1_page,
    build_v2_page,
    rle_def_levels,
)

SAMPLES = {
    PhysicalType.INT32: [0, 1, -1, 2**31 - 1, -(2**31)],
    PhysicalType.INT64: [0, 42, -42, 2**63 - 1, -(2**63)],
    PhysicalType.FLOAT: [0.0, -0.0, 1.5, float("inf"), 3.14],
    PhysicalType.DOUBLE: [0.0, -1e300, 2.718281828, float("-inf")],
    PhysicalType.INT96: [b"abc", b"x" * 12, b""],
    PhysicalType.BYTE_ARRAY: ["hello", "", "héllo wörld", "x" * 5000],
    PhysicalType.FIXED_LEN_BYTE_ARRAY: [b"Hello123", b"12345678"],
}
LENGTHS = {PhysicalType.FIXED_LEN_BYTE_ARRAY: 8}


def protector(datatype, codec=CompressionCodec.UNCOMPRESSED, **kw):
    return PageProtector(
        column_name="c",
        key_id="key_A",
        datatype=datatype,
        datatype_length=LENGTHS.get(datatype),
        compression=codec,
        **kw,
    )


# ---------------------------------------------------------------------------
# V1 definition-level decoding
# ---------------------------------------------------------------------------


def test_count_present_rle():
    payload = rle_def_levels([1, 1, 0, 1, 0, 0, 1, 1], 1)
    assert count_present_values_v1(payload, 8, 1) == 5


def test_count_present_bitpacked():
    levels = [1, 0, 1, 1, 0, 1, 1, 1, 1, 0]  # 10 values -> 2 groups w/ padding
    payload = bitpacked_def_levels(levels, 1)
    assert count_present_values_v1(payload, 10, 1) == 7


def test_count_present_wide_levels():
    # max_def_level=3 -> bit_width=2; only level==3 is present
    payload = rle_def_levels([3, 3, 2, 0, 3], 3)
    assert count_present_values_v1(payload, 5, 3) == 3


def test_count_present_truncated_rejected():
    payload = rle_def_levels([1] * 8, 1)
    with pytest.raises(DBPSInvalidInputError):
        count_present_values_v1(payload[:-1] + b"", 9, 1)  # demands more values
    with pytest.raises(DBPSInvalidInputError):
        count_present_values_v1(payload + b"\x00", 8, 1)  # trailing bytes


def test_count_present_overflow_level_rejected():
    payload = rle_def_levels([2], 1)  # level 2 > max_def_level 1
    with pytest.raises(DBPSInvalidInputError):
        count_present_values_v1(payload, 1, 1)


# ---------------------------------------------------------------------------
# decompress_and_split
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", [CompressionCodec.UNCOMPRESSED, CompressionCodec.SNAPPY])
def test_split_v1_nullable(codec):
    mask = [True, False, True, True, False]
    page, attrs = build_v1_page([1, 2, 3], PhysicalType.INT32, codec, mask)
    split = decompress_and_split(page, codec, PageAttributes.from_string_map(attrs))
    assert split.num_elements == 3
    assert len(split.value_bytes) == 12
    assert len(split.level_bytes) > 0


def test_split_v2_num_nulls():
    mask = [True, False, True]
    page, attrs = build_v2_page([10, 20], PhysicalType.INT64, CompressionCodec.SNAPPY, mask)
    split = decompress_and_split(
        page, CompressionCodec.SNAPPY, PageAttributes.from_string_map(attrs)
    )
    assert split.num_elements == 2
    assert len(split.value_bytes) == 16


def test_split_dict_page():
    page, attrs = build_dict_page(["a", "bb"], PhysicalType.BYTE_ARRAY, CompressionCodec.UNCOMPRESSED)
    split = decompress_and_split(
        page, CompressionCodec.UNCOMPRESSED, PageAttributes.from_string_map(attrs)
    )
    assert split.num_elements == 2
    assert split.level_bytes == b""


def test_missing_attribute_rejected():
    with pytest.raises(DBPSInvalidInputError):
        PageAttributes.from_string_map({"page_type": "DATA_PAGE_V1"})
    with pytest.raises(DBPSInvalidInputError):
        PageAttributes.from_string_map({"page_type": "PAGE_V3"})


# ---------------------------------------------------------------------------
# Sequencer round-trips (per page type x datatype x codec)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("datatype", list(SAMPLES))
@pytest.mark.parametrize("codec", [CompressionCodec.UNCOMPRESSED, CompressionCodec.SNAPPY])
@pytest.mark.parametrize("builder", [build_v1_page, build_v2_page])
def test_data_page_roundtrip(datatype, codec, builder):
    page, attrs_map = builder(SAMPLES[datatype], datatype, codec, length=LENGTHS.get(datatype))
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(datatype, codec)
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DATA_PAGE] == MODE_PER_VALUE
    assert meta[DBPS_VERSION_KEY] == "v0.01"
    assert ct != page
    assert p.decrypt(ct, attrs, meta) == page


@pytest.mark.parametrize("builder,packed", [(build_v1_page, False), (build_v1_page, True), (build_v2_page, False)])
def test_nullable_page_roundtrip(builder, packed):
    mask = [True, False, True, False, True, True, False, True, True, True]
    values = ["a", "", "ccc", "dddd", "e" * 100, "f", "g"]
    kw = {"packed_levels": packed} if builder is build_v1_page else {}
    page, attrs_map = builder(values, PhysicalType.BYTE_ARRAY, CompressionCodec.SNAPPY, mask, **kw)
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.BYTE_ARRAY, CompressionCodec.SNAPPY)
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DATA_PAGE] == MODE_PER_VALUE
    assert p.decrypt(ct, attrs, meta) == page


def test_dictionary_page_roundtrip():
    page, attrs_map = build_dict_page(
        ["apple", "banana", ""], PhysicalType.BYTE_ARRAY, CompressionCodec.SNAPPY
    )
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.BYTE_ARRAY, CompressionCodec.SNAPPY)
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DICT_PAGE] == MODE_PER_VALUE
    assert p.decrypt(ct, attrs, meta) == page


def test_aes_siv_page_roundtrip():
    page, attrs_map = build_v1_page(
        ["alpha", "", "gamma"], PhysicalType.BYTE_ARRAY, CompressionCodec.SNAPPY
    )
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.BYTE_ARRAY, CompressionCodec.SNAPPY, encryptor_name="aes_siv")
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DATA_PAGE] == MODE_PER_VALUE
    assert p.decrypt(ct, attrs, meta) == page


# ---------------------------------------------------------------------------
# Fallback matrix (encryption_sequencer.cpp:160-195)
# ---------------------------------------------------------------------------


def test_boolean_falls_back_per_block():
    # BOOLEAN is bit-packed; page bytes are opaque here
    page = b"\xaa\x55\x0f"
    attrs = PageAttributes.from_string_map(
        {
            "page_type": "DATA_PAGE_V1",
            "data_page_num_values": "24",
            "data_page_max_definition_level": "0",
            "data_page_max_repetition_level": "0",
            "page_v1_definition_level_encoding": "RLE",
            "page_v1_repetition_level_encoding": "RLE",
        }
    )
    p = protector(PhysicalType.BOOLEAN)
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DATA_PAGE] == MODE_PER_BLOCK
    assert p.decrypt(ct, attrs, meta) == page


def test_rle_dictionary_falls_back_per_block():
    page, attrs_map = build_v1_page([1, 2, 3], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.INT32, encoding=Encoding.RLE_DICTIONARY)
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DATA_PAGE] == MODE_PER_BLOCK
    assert p.decrypt(ct, attrs, meta) == page


def test_unsupported_codec_falls_back_per_block():
    # LZO is unsupported for decompression -> legal per-block fallback
    page = b"pretend-lzo-compressed-bytes"
    attrs = PageAttributes.from_string_map(
        {
            "page_type": "DATA_PAGE_V1",
            "data_page_num_values": "3",
            "data_page_max_definition_level": "0",
            "data_page_max_repetition_level": "0",
            "page_v1_definition_level_encoding": "RLE",
            "page_v1_repetition_level_encoding": "RLE",
        }
    )
    p = protector(PhysicalType.INT32, CompressionCodec.LZO)
    ct, meta = p.encrypt(page, attrs)
    assert meta[MODE_KEY_DATA_PAGE] == MODE_PER_BLOCK
    assert p.decrypt(ct, attrs, meta) == page


def test_invalid_input_not_masked_by_fallback():
    """A supported combo with malformed bytes must raise, not fall back."""
    page, attrs_map = build_v1_page([1, 2, 3], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.INT64)  # wrong width for the page -> invalid
    with pytest.raises(DBPSInvalidInputError):
        p.encrypt(page, attrs)


# ---------------------------------------------------------------------------
# Validation (version/mode/params)
# ---------------------------------------------------------------------------


def test_empty_plaintext_rejected():
    attrs = PageAttributes.from_string_map(
        {"page_type": "DICTIONARY_PAGE", "dict_page_num_values": "0"}
    )
    with pytest.raises(DBPSInvalidInputError):
        protector(PhysicalType.INT32).encrypt(b"", attrs)


def test_fixed_len_requires_length():
    with pytest.raises(DBPSInvalidInputError):
        PageProtector(
            column_name="c", key_id="k", datatype=PhysicalType.FIXED_LEN_BYTE_ARRAY
        )
    with pytest.raises(DBPSInvalidInputError):
        PageProtector(
            column_name="c",
            key_id="k",
            datatype=PhysicalType.FIXED_LEN_BYTE_ARRAY,
            datatype_length=0,
        )


def test_empty_key_rejected():
    with pytest.raises(DBPSInvalidInputError):
        PageProtector(column_name="c", key_id="", datatype=PhysicalType.INT32)


def test_decrypt_version_and_mode_validation():
    page, attrs_map = build_v1_page([1, 2], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.INT32)
    ct, meta = p.encrypt(page, attrs)

    with pytest.raises(DBPSInvalidInputError):
        p.decrypt(ct, attrs, {MODE_KEY_DATA_PAGE: MODE_PER_VALUE})  # no version
    with pytest.raises(DBPSInvalidInputError):
        p.decrypt(ct, attrs, {**meta, DBPS_VERSION_KEY: "v9.99"})
    with pytest.raises(DBPSInvalidInputError):
        p.decrypt(ct, attrs, {DBPS_VERSION_KEY: "v0.01"})  # no mode
    with pytest.raises(DBPSInvalidInputError):
        p.decrypt(ct, attrs, {**meta, MODE_KEY_DATA_PAGE: "per_page"})


def test_decrypt_truncated_ciphertext_rejected():
    page, attrs_map = build_v1_page(["abc"], PhysicalType.BYTE_ARRAY, CompressionCodec.UNCOMPRESSED)
    attrs = PageAttributes.from_string_map(attrs_map)
    p = protector(PhysicalType.BYTE_ARRAY)
    ct, meta = p.encrypt(page, attrs)
    with pytest.raises(DBPSInvalidInputError):
        p.decrypt(ct[:3], attrs, meta)


def test_different_keys_different_ciphertext():
    page, attrs_map = build_v1_page([7, 8, 9], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    attrs = PageAttributes.from_string_map(attrs_map)
    ct_a, _ = protector(PhysicalType.INT32).encrypt(page, attrs)
    p_b = PageProtector(column_name="c", key_id="key_B", datatype=PhysicalType.INT32)
    ct_b, _ = p_b.encrypt(page, attrs)
    assert ct_a != ct_b
