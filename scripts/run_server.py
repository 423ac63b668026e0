#!/usr/bin/env python
"""Run the protection API server — the reference binary's CLI surface.

Mirrors ``src/server/dbps_api_server.cpp``'s flags: a credentials JSON
file (``{"client_id": "api_key", ...}``), a JWT secret, and an escape
hatch to run without credential checking (``--allow_missing_credentials``,
``dbps_api_server.cpp:100-105``).

    python scripts/run_server.py --port 18080 \
        --credentials-file creds.json --jwt-secret s3cret
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from databatchprotectionservice_spark.service import (  # noqa: E402
    ClientCredentialStore,
    ProtectionApiServer,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=18080)  # dbps_api_server.cpp:284
    ap.add_argument("--credentials-file")
    ap.add_argument("--jwt-secret", default=os.environ.get("DBPS_JWT_SECRET", ""))
    ap.add_argument(
        "--allow-missing-credentials",
        action="store_true",
        help="run without credential checking (dev only)",
    )
    ap.add_argument(
        "--encryptor", default="keystream_xor", choices=["keystream_xor", "aes_siv"]
    )
    args = ap.parse_args()

    if args.credentials_file:
        if not args.jwt_secret:
            print("error: --jwt-secret required with --credentials-file")
            return 1
        store = ClientCredentialStore.from_file(
            args.credentials_file, jwt_secret_key=args.jwt_secret
        )
    elif args.allow_missing_credentials:
        store = ClientCredentialStore(
            jwt_secret_key=args.jwt_secret or "insecure-dev-secret",
            enable_credential_check=False,
        )
    else:
        # same refusal as dbps_api_server.cpp:100-105
        print(
            "error: no credentials file provided and "
            "--allow-missing-credentials is not set"
        )
        return 1

    server = ProtectionApiServer(
        store, host=args.host, port=args.port, encryptor=args.encryptor
    )
    server.start()
    print(f"protection API listening on {server.url}")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
