"""WARC container walk (core/warccodec.py).

A hand-assembled record pins the ISO 28500 framing byte-for-byte;
round-trips cover plain and per-record-gzip-member layouts, header
folding, and chunked HTTP bodies; the full ingest chain
WARC -> HTTP -> HTML -> URL is exercised end-to-end against the
sibling codecs; the mutation battery proves the domain-error
contract over both layouts.
"""

import random
import zlib

import numpy as np
import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.warccodec import (
    WarcFormatError,
    encode_warc,
    gunzip_members,
    http_response_block,
    parse_warc,
    split_http_message,
)


def test_hand_assembled_record():
    block = b"hello warc"
    raw = (
        b"WARC/1.1\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:x:1>\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Length: 10\r\n"
        b"WARC-Target-URI: https://e.com/a\r\n"
        b"\r\n"
        + block
        + b"\r\n\r\n"
    )
    out = parse_warc(raw)
    assert out["n_records"] == 1
    (r,) = out["records"]
    assert r["type"] == "resource" and r["block"] == block
    assert r["record_id"] == "<urn:x:1>"
    assert r["target_uri"] == "https://e.com/a"
    assert r["content_length"] == 10
    # header folding joins continuations with one space
    folded = raw.replace(
        b"WARC-Target-URI: https://e.com/a",
        b"WARC-Target-URI: https://e.com/\r\n\ta",
    )
    assert parse_warc(folded)["records"][0]["target_uri"] == (
        "https://e.com/ a"
    )


def test_roundtrip_plain_and_gzip_members():
    rng = np.random.default_rng(47)
    recs = [
        {"type": "warcinfo", "block": b"software: test",
         "content_type": "application/warc-fields"},
        {"type": "resource", "block": rng.integers(
            0, 256, 500, dtype=np.uint8).tobytes(),
         "target_uri": "https://x.io/bin"},
        {"type": "metadata", "block": b""},
    ]
    for gz in (False, True):
        enc = encode_warc(recs, gzip_per_record=gz)
        out = parse_warc(enc)
        assert out["n_records"] == 3
        assert out["by_type"] == {
            "warcinfo": 1, "resource": 1, "metadata": 1
        }
        assert [r["block"] for r in out["records"]] == [
            r["block"] for r in recs
        ]
    # the gzip layout really is one member per record
    enc = encode_warc(recs, gzip_per_record=True)
    assert len(gunzip_members(enc)) == 3
    # record ids are deterministic content hashes
    assert (
        parse_warc(enc)["records"][1]["record_id"]
        == parse_warc(enc)["records"][1]["record_id"]
    )


def test_http_split_identity_and_chunked():
    body = b"<html>abc</html>"
    for chunked in (False, True):
        block = http_response_block(body, chunked=chunked)
        h = split_http_message(block)
        assert h["status"] == 200
        assert h["headers"]["content-type"] == "text/html"
        assert h["body"] == body
    # request messages parse too
    req = b"GET /x HTTP/1.1\r\nHost: e.com\r\n\r\n"
    h = split_http_message(req)
    assert h["method"] == "GET" and h["status"] is None
    assert h["headers"]["host"] == "e.com"


def test_full_ingest_chain_warc_http_html_url():
    """The Common Crawl shape end-to-end across the codec family."""
    from databatchprotectionservice_spark.core.htmlcodec import (
        escape_html, extract_links, extract_text)
    from databatchprotectionservice_spark.core.urlcodec import (
        normalize_url, parse_url, registrable_domain)

    text = "Corpus line one\nand a second — with dash"
    html = (
        "<html><head><title>t</title></head><body>"
        + "".join(f"<p>{escape_html(ln)}</p>" for ln in text.split("\n"))
        + '<a HREF="HTTP://Ex.COM:80/a/../b">ref</a></body></html>'
    ).encode("utf-8")
    enc = encode_warc(
        [{"type": "response",
          "block": http_response_block(html, chunked=True),
          "content_type": "application/http;msgtype=response",
          "target_uri": "https://crawl.example.org/page"}],
        gzip_per_record=True,
    )
    out = parse_warc(enc)
    (rec,) = out["records"]
    assert rec["http"]["status"] == 200
    page = rec["http"]["body"].decode("utf-8")
    assert extract_text(page) == text + "\nref"  # trailing anchor text
    ((href, anchor),) = extract_links(page)
    assert anchor == "ref"
    assert normalize_url(href) == "http://ex.com/b"
    assert registrable_domain(
        parse_url(rec["target_uri"])["host"]
    ) == "example.org"


def test_error_paths():
    enc = encode_warc([{"type": "resource", "block": b"abc"}])
    with pytest.raises(WarcFormatError, match="version"):
        parse_warc(b"WARC/0.9" + enc[8:])
    with pytest.raises(WarcFormatError, match="terminator"):
        parse_warc(enc[:-2])
    with pytest.raises(WarcFormatError, match="overruns"):
        parse_warc(enc.replace(b"Content-Length: 3", b"Content-Length: 99"))
    with pytest.raises(WarcFormatError, match="non-integer"):
        parse_warc(enc.replace(b"Content-Length: 3", b"Content-Length: x"))
    with pytest.raises(WarcFormatError, match="mandatory"):
        parse_warc(b"WARC/1.1\r\nWARC-Type: resource\r\n\r\n\r\n\r\n")
    with pytest.raises(WarcFormatError, match="unknown WARC-Type"):
        parse_warc(enc.replace(b"Type: resource", b"Type: bogus123"))
    gz = encode_warc([{"type": "resource", "block": b"abc"}],
                     gzip_per_record=True)
    with pytest.raises(WarcFormatError, match="gzip"):
        parse_warc(gz[:1] + b"\x8b" + gz[2:10])  # truncated member
    with pytest.raises(WarcFormatError, match="chunk"):
        split_http_message(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n"
        )
    with pytest.raises(WarcFormatError, match="refusing"):
        encode_warc([])
    assert issubclass(WarcFormatError, DBPSInvalidInputError)


def test_mutation_battery():
    rng = np.random.default_rng(53)
    html = b"<p>" + rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
    bases = [
        bytearray(encode_warc(
            [{"type": "resource", "block": b"abc"},
             {"type": "response",
              "block": http_response_block(html, chunked=True),
              "content_type": "application/http;msgtype=response"}])),
        bytearray(encode_warc(
            [{"type": "resource", "block": bytes(200)}],
            gzip_per_record=True)),
    ]
    random.seed(53)
    for _ in range(3000):
        b = bytearray(random.choice(bases))
        for _ in range(random.randint(1, 8)):
            op = random.random()
            if op < 0.5 and b:
                b[random.randrange(len(b))] = random.randrange(256)
            elif op < 0.75 and len(b) > 4:
                cut = random.randrange(len(b) - 3)
                del b[cut : cut + random.randint(1, 16)]
            else:
                i = random.randrange(len(b) + 1)
                b[i:i] = bytes(
                    random.randrange(256)
                    for _ in range(random.randint(1, 8))
                )
        try:
            parse_warc(bytes(b))
        except WarcFormatError:
            pass
