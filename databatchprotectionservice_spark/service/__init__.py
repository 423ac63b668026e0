"""Service surface: JSON model, HS256 JWT auth, HTTP server, remote agent.

The out-of-data-plane parity layer for the reference's Crow HTTP app
(``src/server/dbps_api_server.cpp:110-284``). The Spark engine itself never
needs HTTP — executors call the protection library in-process — but the
service keeps the reference's integration contract available: the same
endpoints, request/response schema, and token flow.
"""

from .auth import ClientCredentialStore, verify_jwt
from .client import RemoteProtectionAgent
from .json_model import (
    DecryptJsonRequest,
    EncryptJsonRequest,
    build_decrypt_response,
    build_encrypt_response,
)
from .server import ProtectionApiServer

__all__ = [
    "ClientCredentialStore",
    "verify_jwt",
    "RemoteProtectionAgent",
    "EncryptJsonRequest",
    "DecryptJsonRequest",
    "build_encrypt_response",
    "build_decrypt_response",
    "ProtectionApiServer",
]
