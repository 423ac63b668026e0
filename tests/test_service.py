"""Service layer: JWT auth, JSON model validation, HTTP round-trips."""

import json
import time
import urllib.request

import pytest

from databatchprotectionservice_spark.core.types import (
    CompressionCodec,
    PhysicalType,
)
from databatchprotectionservice_spark.service import (
    ClientCredentialStore,
    DecryptJsonRequest,
    EncryptJsonRequest,
    ProtectionApiServer,
    RemoteProtectionAgent,
)
from databatchprotectionservice_spark.service.auth import issue_jwt, verify_jwt
from tests.pagebuilders import build_v1_page

SECRET = "test-secret"


@pytest.fixture(scope="module")
def store():
    s = ClientCredentialStore(jwt_secret_key=SECRET)
    s.add_credential("client1", "key1")
    return s


@pytest.fixture(scope="module")
def server(store):
    srv = ProtectionApiServer(store)
    srv.start()
    yield srv
    srv.stop()


def _post(url, payload, token=None):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode() or "{}")


# -- auth ----------------------------------------------------------------


def test_jwt_roundtrip():
    now = int(time.time())
    tok = issue_jwt({"client_id": "c", "iat": now, "exp": now + 60}, SECRET)
    assert verify_jwt(tok, SECRET) == "c"
    assert verify_jwt(tok, "wrong-secret") is None
    assert verify_jwt(tok + "x", SECRET) is None


def test_jwt_expired():
    now = int(time.time())
    tok = issue_jwt({"client_id": "c", "iat": now - 120, "exp": now - 60}, SECRET)
    assert verify_jwt(tok, SECRET) is None


def test_token_endpoint(server, store):
    status, doc = _post(server.url + "/token", {"client_id": "client1", "api_key": "key1"})
    assert status == 200
    assert doc["token_type"] == "Bearer"
    assert doc["expires_at"] > time.time() + 14000
    assert verify_jwt(doc["token"], SECRET) == "client1"


def test_token_endpoint_bad_credentials(server):
    status, doc = _post(server.url + "/token", {"client_id": "client1", "api_key": "nope"})
    assert status == 401
    assert "Invalid credentials" in doc["error"]


def test_protected_endpoints_require_token(server):
    status, doc = _post(server.url + "/encrypt", {})
    assert status == 401
    assert "JWT token is missing" in doc["error_string"]


def test_healthz_open(server):
    with urllib.request.urlopen(server.url + "/healthz", timeout=10) as resp:
        assert resp.status == 200
        assert resp.read() == b"OK"


# -- JSON model ----------------------------------------------------------


def _encrypt_request_body(page_b64, attrs):
    return {
        "column_reference": {"name": "email"},
        "data_batch": {
            "datatype_info": {"datatype": "BYTE_ARRAY"},
            "value_format": {
                "compression": "UNCOMPRESSED",
                "encoding": "PLAIN",
                "encoding_attributes": attrs,
            },
            "value": page_b64,
        },
        "data_batch_encrypted": {"value_format": {"compression": "UNCOMPRESSED"}},
        "encryption": {"key_id": "EMAIL_KEY_001"},
        "access": {"user_id": "user123"},
        "application_context": '{"user_id": "user123"}',
        "debug": {"reference_id": "ref-1"},
    }


def test_json_model_field_validation():
    req = EncryptJsonRequest.parse(json.dumps({"data_batch": {}}))
    err = req.get_validation_error()
    for fieldname in (
        "column_reference.name",
        "data_batch.datatype_info.datatype",
        "encryption.key_id",
    ):
        assert fieldname in err
    assert not req.is_valid()


def test_json_model_invalid_json():
    assert (
        EncryptJsonRequest.parse("{not json").get_validation_error()
        == "Invalid JSON in request body"
    )


def test_json_model_swagger_format_alias():
    """swagger examples use value_format.format; C++ reads .encoding."""
    body = _encrypt_request_body("QUJD", {})
    body["data_batch"]["value_format"]["format"] = body["data_batch"][
        "value_format"
    ].pop("encoding")
    req = EncryptJsonRequest.parse(json.dumps(body))
    assert req.encoding is not None


def test_decrypt_request_requires_value():
    req = DecryptJsonRequest.parse(json.dumps(_encrypt_request_body("QUJD", {})))
    assert "data_batch_encrypted.value" in req.get_validation_error()


# -- end-to-end over HTTP ------------------------------------------------


def _page_and_attrs():
    page, attrs = build_v1_page(
        ["alice@example.com", "bob@example.com", "碧@example.com", ""],
        PhysicalType.BYTE_ARRAY,
        CompressionCodec.UNCOMPRESSED,
    )
    return page, attrs


def test_http_encrypt_decrypt_roundtrip(server):
    import base64

    page, attrs = _page_and_attrs()
    _, tok = _post(server.url + "/token", {"client_id": "client1", "api_key": "key1"})
    body = _encrypt_request_body(base64.b64encode(page).decode(), attrs)
    status, enc = _post(server.url + "/encrypt", body, tok["token"])
    assert status == 200, enc
    assert enc["access"] == {
        "user_id": "user123",
        "role": "granted",
        "access_control": "granted",
    }
    assert enc["encryption_metadata"]["encrypt_mode_data_page"] == "per_value"
    assert enc["debug"]["reference_id"] == "ref-1"

    dec_body = _encrypt_request_body("", attrs)
    del dec_body["data_batch"]["value"]
    dec_body["data_batch_encrypted"]["value"] = enc["data_batch_encrypted"]["value"]
    dec_body["encryption_metadata"] = enc["encryption_metadata"]
    status, dec = _post(server.url + "/decrypt", dec_body, tok["token"])
    assert status == 200, dec
    assert base64.b64decode(dec["data_batch"]["value"]) == page


def test_http_encrypt_validation_error(server):
    _, tok = _post(server.url + "/token", {"client_id": "client1", "api_key": "key1"})
    status, doc = _post(server.url + "/encrypt", {"data_batch": {}}, tok["token"])
    assert status == 400
    assert "Missing required field" in doc["error_string"]


# -- remote agent --------------------------------------------------------


@pytest.fixture()
def remote_agent(server):
    return RemoteProtectionAgent()


def test_remote_agent_roundtrip(server, remote_agent):
    page, attrs = _page_and_attrs()
    attrs = dict(attrs, page_encoding="PLAIN")
    remote_agent.init(
        connection_config={
            "server_url": server.url,
            "credentials": {"client_id": "client1", "api_key": "key1"},
        },
        column_name="email",
        column_key_id="EMAIL_KEY_001",
        datatype=PhysicalType.BYTE_ARRAY,
        datatype_length=None,
        compression_type=CompressionCodec.UNCOMPRESSED,
        user_id="user123",
        application_context='{"user_id": "user123"}',
    )
    enc = remote_agent.encrypt(page, attrs)
    assert enc.success, enc.error_message
    assert enc.ciphertext != page
    assert enc.encryption_metadata["encrypt_mode_data_page"] == "per_value"

    remote_agent.column_encryption_metadata = enc.encryption_metadata
    dec = remote_agent.decrypt(enc.ciphertext, attrs)
    assert dec.success, dec.error_message
    assert dec.plaintext == page


def test_remote_agent_never_raises_on_bad_server():
    agent = RemoteProtectionAgent(timeout=2)
    with pytest.raises(ConnectionError):
        agent.init(
            connection_config={
                "server_url": "http://127.0.0.1:1",
                "credentials": {"client_id": "c", "api_key": "k"},
            },
            column_name="c",
            column_key_id="k",
            datatype=PhysicalType.INT32,
            datatype_length=None,
            compression_type=CompressionCodec.UNCOMPRESSED,
            user_id="u",
            application_context='{"user_id": "u"}',
        )
    # uninitialized use -> error result, not exception
    res = agent.encrypt(b"xx", {"page_encoding": "PLAIN"})
    assert not res.success
    assert "not initialized" in res.error_message


def test_remote_agent_token_cached(server, remote_agent):
    page, attrs = _page_and_attrs()
    attrs = dict(attrs, page_encoding="PLAIN")
    remote_agent.init(
        connection_config={
            "server_url": server.url,
            "credentials": {"client_id": "client1", "api_key": "key1"},
        },
        column_name="email",
        column_key_id="K",
        datatype=PhysicalType.BYTE_ARRAY,
        datatype_length=None,
        compression_type=CompressionCodec.UNCOMPRESSED,
        user_id="u",
        application_context='{"user_id": "u"}',
    )
    remote_agent.encrypt(page, attrs)
    tok1 = remote_agent._token
    remote_agent.encrypt(page, attrs)
    assert remote_agent._token is tok1  # cached, not re-fetched


# -- json_request_test parity edges (json_request_test.cpp:155-895) ------


def test_invalid_base64_value_treated_as_missing():
    body = _encrypt_request_body("!!!not-base64!!!", {})
    req = EncryptJsonRequest.parse(json.dumps(body))
    assert "data_batch.value" in req.get_validation_error()


def test_invalid_datatype_length_string():
    body = _encrypt_request_body("QUJD", {})
    body["data_batch"]["datatype_info"]["length"] = "not-an-int"
    req = EncryptJsonRequest.parse(json.dumps(body))
    assert "invalid integer value" in req.get_validation_error()


def test_valid_datatype_length_parses():
    body = _encrypt_request_body("QUJD", {})
    body["data_batch"]["datatype_info"]["length"] = 8
    req = EncryptJsonRequest.parse(json.dumps(body))
    assert req.datatype_length == 8 and req.is_valid()


def test_unknown_datatype_reported_missing():
    body = _encrypt_request_body("QUJD", {})
    body["data_batch"]["datatype_info"]["datatype"] = "UNDEFINED_TYPE"
    req = EncryptJsonRequest.parse(json.dumps(body))
    assert "data_batch.datatype_info.datatype" in req.get_validation_error()


def test_application_context_object_is_json_string():
    body = _encrypt_request_body("QUJD", {})
    body["application_context"] = {"column_schema": {"table": "users"}}
    req = EncryptJsonRequest.parse(json.dumps(body))
    assert json.loads(req.application_context)["column_schema"]["table"] == "users"


def test_statusz_requires_and_accepts_token(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server.url + "/statusz", timeout=10)
    assert ei.value.code == 401
    _, tok = _post(server.url + "/token", {"client_id": "client1", "api_key": "key1"})
    req = urllib.request.Request(
        server.url + "/statusz",
        headers={"Authorization": f"Bearer {tok['token']}"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert resp.status == 200
        assert json.loads(resp.read())["enable_credential_check"] is True


def test_decrypt_wrong_version_over_http(server):
    import base64

    page, attrs = _page_and_attrs()
    _, tok = _post(server.url + "/token", {"client_id": "client1", "api_key": "key1"})
    body = _encrypt_request_body(base64.b64encode(page).decode(), attrs)
    _, enc = _post(server.url + "/encrypt", body, tok["token"])
    dec_body = _encrypt_request_body("", attrs)
    del dec_body["data_batch"]["value"]
    dec_body["data_batch_encrypted"]["value"] = enc["data_batch_encrypted"]["value"]
    dec_body["encryption_metadata"] = dict(
        enc["encryption_metadata"], dbps_agent_version="v9.99"
    )
    status, doc = _post(server.url + "/decrypt", dec_body, tok["token"])
    assert status == 400
    assert "dbps_agent_version" in doc["error_string"]


# -- dbpa_remote_testapp parity: float + fixed-len over HTTP -------------


def _remote_agent_for(server, datatype, length=None):
    agent = RemoteProtectionAgent()
    agent.init(
        connection_config={
            "server_url": server.url,
            "credentials": {"client_id": "client1", "api_key": "key1"},
        },
        column_name="col",
        column_key_id="K1",
        datatype=datatype,
        datatype_length=length,
        compression_type=CompressionCodec.UNCOMPRESSED,
        user_id="u1",
        application_context='{"user_id": "u1"}',
    )
    return agent


def test_remote_agent_float_integrity(server):
    """Float batch round-trips bit-exactly (dbpa_remote_testapp.cpp:424-581)."""
    from tests.pagebuilders import build_v1_page

    values = [0.0, -0.0, 1.5, -2.25, 3.4e38, 1.4e-45, float("inf")]
    page, attrs = build_v1_page(
        values, PhysicalType.FLOAT, CompressionCodec.UNCOMPRESSED
    )
    agent = _remote_agent_for(server, PhysicalType.FLOAT)
    attrs = dict(attrs, page_encoding="PLAIN")
    enc = agent.encrypt(page, attrs)
    assert enc.success, enc.error_message
    agent.column_encryption_metadata = enc.encryption_metadata
    dec = agent.decrypt(enc.ciphertext, attrs)
    assert dec.success and dec.plaintext == page


def test_remote_agent_fixed_len(server):
    """FIXED_LEN_BYTE_ARRAY(8) round-trip (dbpa_remote_testapp.cpp:601-)."""
    from tests.pagebuilders import build_v1_page

    values = [b"12345678", b"abcdefgh", b"\x00" * 8, b"\xff" * 8]
    page, attrs = build_v1_page(
        values,
        PhysicalType.FIXED_LEN_BYTE_ARRAY,
        CompressionCodec.UNCOMPRESSED,
        length=8,
    )
    agent = _remote_agent_for(server, PhysicalType.FIXED_LEN_BYTE_ARRAY, length=8)
    attrs = dict(attrs, page_encoding="PLAIN")
    enc = agent.encrypt(page, attrs)
    assert enc.success, enc.error_message
    agent.column_encryption_metadata = enc.encryption_metadata
    dec = agent.decrypt(enc.ciphertext, attrs)
    assert dec.success and dec.plaintext == page


def test_remote_agent_empty_payload_rejected(server):
    """Empty payloads error cleanly (dbpa_remote_testapp.cpp:772-816)."""
    agent = _remote_agent_for(server, PhysicalType.BYTE_ARRAY)
    res = agent.encrypt(b"", {"page_encoding": "PLAIN"})
    assert not res.success
