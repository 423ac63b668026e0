"""Agent contract tests — ports the intent of ``dbpa_local_test.cpp``
(init/encrypt/decrypt contract incl. uninitialized-use errors) and
``dbpa_utils_test.cpp`` (user_id / page_encoding extraction)."""

import pytest

from databatchprotectionservice_spark.agent import (
    LocalProtectionAgent,
    create_new_instance,
    extract_page_encoding,
    extract_user_id,
)
from databatchprotectionservice_spark.core.errors import DBPSInvalidInputError
from databatchprotectionservice_spark.core.types import (
    CompressionCodec,
    Encoding,
    PhysicalType,
)

from .pagebuilders import build_v1_page

APP_CONTEXT = '{"user_id": "demo_user_123"}'


def make_agent(datatype=PhysicalType.INT32, metadata=None, **kw):
    agent = create_new_instance()
    agent.init(
        column_name="c1",
        configuration_map=kw.pop("configuration_map", {}),
        app_context=APP_CONTEXT,
        column_key_id="key_A",
        datatype=datatype,
        datatype_length=kw.pop("datatype_length", None),
        compression_type=kw.pop("compression", CompressionCodec.UNCOMPRESSED),
        column_encryption_metadata=metadata,
    )
    return agent


def attrs_with_encoding(attrs_map, encoding="PLAIN"):
    return {**attrs_map, "page_encoding": encoding}


def test_extract_user_id():
    assert extract_user_id(APP_CONTEXT) == "demo_user_123"
    assert extract_user_id("{}") is None
    assert extract_user_id('{"user_id": ""}') is None
    assert extract_user_id("not json") is None
    assert extract_user_id('{"user_id": 42}') is None


def test_extract_page_encoding():
    assert extract_page_encoding({"page_encoding": "PLAIN"}) == Encoding.PLAIN
    assert (
        extract_page_encoding({"page_encoding": "RLE_DICTIONARY"})
        == Encoding.RLE_DICTIONARY
    )
    assert extract_page_encoding({}) is None
    assert extract_page_encoding({"page_encoding": "NOPE"}) is None


def test_uninitialized_agent_errors_without_raising():
    agent = LocalProtectionAgent()
    res = agent.encrypt(b"data", {"page_encoding": "PLAIN"})
    assert not res.success and "init" in res.error_message
    res = agent.decrypt(b"data", {"page_encoding": "PLAIN"})
    assert not res.success


def test_agent_encrypt_decrypt_roundtrip():
    page, attrs_map = build_v1_page([1, 2, 3], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    agent = make_agent()
    enc = agent.encrypt(page, attrs_with_encoding(attrs_map))
    assert enc.success, enc.error_message
    assert enc.encryption_metadata["encrypt_mode_data_page"] == "per_value"
    assert enc.size == len(enc.ciphertext) > 0

    # decrypt requires a fresh agent initialized WITH the metadata
    dec_agent = make_agent(metadata=enc.encryption_metadata)
    dec = dec_agent.decrypt(enc.ciphertext, attrs_with_encoding(attrs_map))
    assert dec.success, dec.error_message
    assert dec.plaintext == page


def test_agent_user_id_extracted():
    agent = make_agent()
    assert agent.user_id == "demo_user_123"


def test_agent_missing_page_encoding_is_error_not_exception():
    page, attrs_map = build_v1_page([1], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    agent = make_agent()
    res = agent.encrypt(page, attrs_map)  # no page_encoding key
    assert not res.success
    assert res.error_fields.get("field") == "page_encoding"


def test_agent_empty_plaintext_is_error_not_exception():
    agent = make_agent()
    res = agent.encrypt(b"", {"page_encoding": "PLAIN", "page_type": "DICTIONARY_PAGE", "dict_page_num_values": "0"})
    assert not res.success
    assert "plaintext" in res.error_message


def test_agent_decrypt_without_metadata_is_error():
    page, attrs_map = build_v1_page([1], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    agent = make_agent()
    enc = agent.encrypt(page, attrs_with_encoding(attrs_map))
    res = agent.decrypt(enc.ciphertext, attrs_with_encoding(attrs_map))
    assert not res.success
    assert res.error_fields.get("field") == "column_encryption_metadata"


def test_agent_wrong_version_metadata_is_error():
    page, attrs_map = build_v1_page([1], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    enc = make_agent().encrypt(page, attrs_with_encoding(attrs_map))
    bad_meta = {**enc.encryption_metadata, "dbps_agent_version": "v9.99"}
    dec = make_agent(metadata=bad_meta).decrypt(
        enc.ciphertext, attrs_with_encoding(attrs_map)
    )
    assert not dec.success
    assert "version" in dec.error_message


def test_agent_init_empty_key_raises():
    agent = create_new_instance()
    with pytest.raises(DBPSInvalidInputError):
        agent.init(
            column_name="c",
            configuration_map={},
            app_context="{}",
            column_key_id="",
            datatype=PhysicalType.INT32,
            datatype_length=None,
            compression_type=CompressionCodec.UNCOMPRESSED,
        )


def test_agent_rle_dictionary_falls_back():
    page, attrs_map = build_v1_page([5, 6], PhysicalType.INT32, CompressionCodec.UNCOMPRESSED)
    agent = make_agent()
    enc = agent.encrypt(page, attrs_with_encoding(attrs_map, "RLE_DICTIONARY"))
    assert enc.success
    assert enc.encryption_metadata["encrypt_mode_data_page"] == "per_block"
    dec = make_agent(metadata=enc.encryption_metadata).decrypt(
        enc.ciphertext, attrs_with_encoding(attrs_map, "RLE_DICTIONARY")
    )
    assert dec.success and dec.plaintext == page


def test_agent_aes_siv_configuration():
    page, attrs_map = build_v1_page(["x", "yy"], PhysicalType.BYTE_ARRAY, CompressionCodec.UNCOMPRESSED)
    agent = make_agent(
        datatype=PhysicalType.BYTE_ARRAY, configuration_map={"encryptor": "aes_siv"}
    )
    enc = agent.encrypt(page, attrs_with_encoding(attrs_map))
    assert enc.success
    dec_agent = make_agent(
        datatype=PhysicalType.BYTE_ARRAY,
        configuration_map={"encryptor": "aes_siv"},
        metadata=enc.encryption_metadata,
    )
    dec = dec_agent.decrypt(enc.ciphertext, attrs_with_encoding(attrs_map))
    assert dec.success and dec.plaintext == page
