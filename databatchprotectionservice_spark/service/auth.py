"""Client-credential store + HS256 JWT issue/verify.

Mirrors ``src/server/auth_utils.cpp:38-269``: a ``client_id -> api_key``
store loaded from a JSON file, 4-hour HS256 tokens carrying a
``client_id`` claim, and per-endpoint bearer verification. Implemented on
the standard RFC 7519 JWS compact serialization with ``hmac``/``hashlib``
— no third-party JWT dependency.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from dataclasses import dataclass, field

JWT_EXPIRATION_SECONDS = 4 * 60 * 60  # auth_utils.h:38
JWT_TOKEN_TYPE = "Bearer"
_HEADER = {"alg": "HS256", "typ": "JWT"}


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64url(data: str) -> bytes:
    pad = -len(data) % 4
    return base64.urlsafe_b64decode(data + "=" * pad)


def _sign(signing_input: bytes, secret: str) -> bytes:
    return hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()


def issue_jwt(claims: dict, secret: str) -> str:
    header = _b64url(json.dumps(_HEADER, separators=(",", ":")).encode())
    payload = _b64url(json.dumps(claims, separators=(",", ":")).encode())
    signing_input = f"{header}.{payload}".encode()
    return f"{header}.{payload}.{_b64url(_sign(signing_input, secret))}"


def verify_jwt(token: str, secret: str) -> str | None:
    """Verify signature + expiry; returns the ``client_id`` claim or None
    (``auth_utils.cpp:218-246``)."""
    try:
        header_b64, payload_b64, sig_b64 = token.split(".")
        signing_input = f"{header_b64}.{payload_b64}".encode()
        header = json.loads(_unb64url(header_b64))
        if header.get("alg") != "HS256":
            return None
        if not hmac.compare_digest(
            _sign(signing_input, secret), _unb64url(sig_b64)
        ):
            return None
        claims = json.loads(_unb64url(payload_b64))
        if int(claims.get("exp", 0)) < int(time.time()):
            return None
        client_id = claims.get("client_id")
        return client_id if isinstance(client_id, str) and client_id else None
    except (ValueError, KeyError, TypeError):
        return None


@dataclass
class TokenResponse:
    """Mirrors the ``/token`` response envelope (``auth_utils.cpp:164-213``)."""

    token: str = ""
    token_type: str = JWT_TOKEN_TYPE
    expires_at: int = 0
    error_message: str = ""
    error_status_code: int = 200

    def to_json(self) -> dict:
        if self.error_message:
            return {"error": self.error_message}
        return {
            "token": self.token,
            "token_type": self.token_type,
            "expires_at": self.expires_at,
        }


@dataclass
class ClientCredentialStore:
    """``client_id -> api_key`` map + JWT lifecycle
    (``auth_utils.cpp:28-117``)."""

    jwt_secret_key: str
    enable_credential_check: bool = True
    credentials: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_file(cls, path: str, jwt_secret_key: str, **kw) -> "ClientCredentialStore":
        with open(path) as f:
            data = json.load(f)
        store = cls(jwt_secret_key=jwt_secret_key, **kw)
        for client_id, api_key in data.items():
            if isinstance(api_key, str):
                store.add_credential(client_id, api_key)
        return store

    def add_credential(self, client_id: str, api_key: str) -> None:
        self.credentials[client_id] = api_key

    def validate_credential(self, client_id: str, api_key: str) -> bool:
        # constant-time compare over BYTES: str compare_digest raises
        # TypeError on non-ASCII input (an unauthenticated request body
        # could kill the handler thread), and the /token endpoint must
        # not leak key prefixes through comparison timing
        return hmac.compare_digest(
            self.credentials.get(client_id, "").encode("utf-8"),
            api_key.encode("utf-8"),
        )

    def generate_jwt(self, client_id: str, api_key: str) -> tuple[str, int] | None:
        """(token, expires_at) or None on bad credentials
        (``auth_utils.cpp:120-161``)."""
        if self.enable_credential_check:
            if not client_id or not api_key:
                return None
            if not self.validate_credential(client_id, api_key):
                return None
        now = int(time.time())
        exp = now + JWT_EXPIRATION_SECONDS
        token = issue_jwt({"client_id": client_id, "iat": now, "exp": exp},
                          self.jwt_secret_key)
        return token, exp

    def process_token_request(self, request_body: str) -> TokenResponse:
        """POST /token body ``{"client_id": ..., "api_key": ...}``
        (``auth_utils.cpp:165-213``)."""
        try:
            body = json.loads(request_body) if request_body else {}
            if not isinstance(body, dict):
                raise ValueError
        except ValueError:
            return TokenResponse(
                error_message="Invalid JSON in token request",
                error_status_code=400,
            )
        client_id = str(body.get("client_id") or "")
        api_key = str(body.get("api_key") or "")
        issued = self.generate_jwt(client_id, api_key)
        if issued is None:
            return TokenResponse(
                error_message=f"Invalid credentials -- client_id=[{client_id or '<empty>'}], "
                "api_key=[<redacted>]",
                error_status_code=401,
            )
        token, exp = issued
        return TokenResponse(token=token, expires_at=exp)

    def verify_token_for_endpoint(self, authorization_header: str) -> str | None:
        """None = authorized; otherwise the error string
        (``auth_utils.cpp:249-269``)."""
        if not self.enable_credential_check:
            return None
        prefix = JWT_TOKEN_TYPE + " "
        if not authorization_header.startswith(prefix):
            return "Unauthorized: JWT token is missing"
        if verify_jwt(authorization_header[len(prefix):], self.jwt_secret_key) is None:
            return "Unauthorized: Invalid JWT token"
        return None
