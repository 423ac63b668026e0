"""WARC (ISO 28500) web-archive container walk + HTTP block split.

The container Common Crawl actually ships: with ``htmlcodec`` and
``urlcodec`` this completes the public-knowledge web-ingest chain
WARC record -> HTTP response -> HTML -> text/links.  Implemented
from the public ISO 28500 / WARC 1.1 specification and RFC 9112
(HTTP/1.1 message framing): version line, CRLF header block with
obs-fold continuations, ``Content-Length``-framed block, the
two-CRLF record terminator, and the per-record-gzip-member layout
Common Crawl uses (detected by magic; members split with
``zlib.decompressobj`` ``unused_data``, stdlib only).

HTTP response blocks (``application/http``) are split into status /
headers / body, including ``Transfer-Encoding: chunked`` decoding —
everything after that (HTML parsing, charset sniffing) belongs to
``htmlcodec``.

Binary-container discipline (same as mp4/mkv): malformed input
raises ``WarcFormatError`` — never a stray ``struct``/``zlib``/
``Unicode`` escape — proven by the mutation battery.  The fixture
encoder derives record IDs from a content hash, so streams are
deterministic end-to-end.
"""

from __future__ import annotations

import hashlib
import zlib

from .errors import DBPSInvalidInputError


class WarcFormatError(DBPSInvalidInputError):
    """Raised for malformed or out-of-subset WARC bytes."""


_CRLF = b"\r\n"
_TYPES = frozenset(
    """warcinfo response request metadata revisit resource conversion
    continuation""".split()
)

#: hostile-input guard: one gzip member may not inflate beyond this
MAX_MEMBER_BYTES = 1 << 28


# ---------------------------------------------------------------------------
# gzip member layer
# ---------------------------------------------------------------------------


def gunzip_members(data: bytes) -> list:
    """Split a concatenated-member gzip stream (the Common Crawl
    record-per-member layout) into the decompressed members."""
    members = []
    buf = data
    while buf:
        if buf[:2] != b"\x1f\x8b":
            raise WarcFormatError(
                f"gzip member {len(members)} has bad magic"
            )
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(buf, MAX_MEMBER_BYTES)
        except zlib.error as e:
            raise WarcFormatError(f"corrupt gzip member: {e}")
        if not d.eof:
            raise WarcFormatError(
                "gzip member truncated or over the decode guard"
            )
        members.append(out + d.flush())
        buf = d.unused_data
    if not members:
        raise WarcFormatError("empty gzip stream")
    return members


# ---------------------------------------------------------------------------
# record layer
# ---------------------------------------------------------------------------


def _parse_headers(data: bytes, pos: int) -> tuple[dict, int]:
    """CRLF header block with obs-fold continuations -> (dict, end).

    Names are lowercased tokens (first occurrence wins); values keep
    bytes as UTF-8 with replacement (WARC allows UTF-8 values)."""
    headers: dict = {}
    last = None
    while True:
        end = data.find(_CRLF, pos)
        if end == -1:
            raise WarcFormatError("header block missing CRLF terminator")
        line = data[pos:end]
        pos = end + 2
        if not line:
            return headers, pos
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise WarcFormatError("continuation line before any header")
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        sep = line.find(b":")
        if sep < 1:
            raise WarcFormatError(
                f"malformed header line {line[:40]!r}"
            )
        name = line[:sep].strip().decode("ascii", "replace").lower()
        if not name or any(c.isspace() for c in name):
            raise WarcFormatError(f"bad header name {name!r}")
        value = line[sep + 1 :].strip().decode("utf-8", "replace")
        if name not in headers:
            headers[name] = value
        last = name


def _parse_record(data: bytes, pos: int) -> tuple[dict, int]:
    end = data.find(_CRLF, pos)
    if end == -1:
        raise WarcFormatError("missing WARC version line")
    version = data[pos:end]
    if version not in (b"WARC/1.0", b"WARC/1.1"):
        raise WarcFormatError(f"unsupported version line {version[:20]!r}")
    headers, pos = _parse_headers(data, end + 2)
    for req in ("warc-type", "warc-record-id", "warc-date", "content-length"):
        if req not in headers:
            raise WarcFormatError(f"record missing mandatory {req}")
    wtype = headers["warc-type"]
    if wtype not in _TYPES:
        raise WarcFormatError(f"unknown WARC-Type {wtype!r}")
    try:
        clen = int(headers["content-length"])
    except ValueError:
        raise WarcFormatError(
            f"non-integer Content-Length {headers['content-length']!r}"
        )
    if clen < 0 or pos + clen > len(data):
        raise WarcFormatError(
            f"block of {clen} bytes overruns the stream"
        )
    block = data[pos : pos + clen]
    pos += clen
    if data[pos : pos + 4] != _CRLF + _CRLF:
        raise WarcFormatError("record missing the two-CRLF terminator")
    pos += 4
    rec = {
        "type": wtype,
        "record_id": headers["warc-record-id"],
        "date": headers["warc-date"],
        "target_uri": headers.get("warc-target-uri"),
        "content_type": headers.get("content-type"),
        "content_length": clen,
        "block": block,
    }
    return rec, pos


def parse_warc(data: bytes) -> dict:
    """Walk every record (gzip-member layer auto-detected); response
    records get their HTTP block split in place."""
    if data[:2] == b"\x1f\x8b":
        chunks = gunzip_members(data)
    else:
        chunks = [data]
    records = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            rec, pos = _parse_record(chunk, pos)
            if rec["type"] in ("response", "request") and (
                rec["content_type"] or ""
            ).startswith("application/http"):
                rec["http"] = split_http_message(rec["block"])
            records.append(rec)
    if not records:
        raise WarcFormatError("no WARC records")
    by_type: dict = {}
    for r in records:
        by_type[r["type"]] = by_type.get(r["type"], 0) + 1
    return {
        "n_records": len(records),
        "by_type": by_type,
        "records": records,
    }


# ---------------------------------------------------------------------------
# HTTP message layer (RFC 9112 framing subset)
# ---------------------------------------------------------------------------


def split_http_message(block: bytes) -> dict:
    """Status/request line + headers + body; chunked bodies decoded.

    Body framing beyond that (trailers, multipart) is the documented
    seam — Common Crawl stores identity or chunked responses."""
    sep = block.find(_CRLF + _CRLF)
    if sep == -1:
        raise WarcFormatError("HTTP block missing header terminator")
    head = block[:sep]
    body = block[sep + 4 :]
    first_end = head.find(_CRLF)
    first = head[:first_end if first_end != -1 else len(head)]
    line = first.decode("ascii", "replace")
    status = None
    method = None
    if line.startswith("HTTP/"):
        parts = line.split(None, 2)
        if len(parts) < 2 or not parts[1].isdigit():
            raise WarcFormatError(f"bad HTTP status line {line[:40]!r}")
        status = int(parts[1])
    else:
        parts = line.split(None, 2)
        if len(parts) < 2:
            raise WarcFormatError(f"bad HTTP request line {line[:40]!r}")
        method = parts[0]
    hdr_start = (first_end + 2) if first_end != -1 else len(head)
    headers, _ = _parse_headers(head[hdr_start:] + _CRLF + _CRLF, 0)
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = _decode_chunked(body)
    return {
        "status": status,
        "method": method,
        "headers": headers,
        "body": body,
    }


def _decode_chunked(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while True:
        end = body.find(_CRLF, pos)
        if end == -1:
            raise WarcFormatError("chunked body missing size line")
        size_tok = body[pos:end].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise WarcFormatError(f"bad chunk size {size_tok[:16]!r}")
        pos = end + 2
        if size == 0:
            return bytes(out)  # trailers ignored (documented seam)
        if pos + size + 2 > len(body):
            raise WarcFormatError("chunk overruns the body")
        out += body[pos : pos + size]
        if body[pos + size : pos + size + 2] != _CRLF:
            raise WarcFormatError("chunk missing CRLF terminator")
        pos += size + 2


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def encode_warc(records: list, *, gzip_per_record: bool = False) -> bytes:
    """Build a valid WARC 1.1 stream from record dicts (type, block,
    optional target_uri/content_type/date).  Record IDs derive from a
    sha256 of the block — deterministic end-to-end."""
    out = []
    for r in records:
        wtype = r.get("type", "resource")
        if wtype not in _TYPES:
            raise WarcFormatError(f"refusing unknown WARC-Type {wtype!r}")
        block = r["block"]
        if not isinstance(block, (bytes, bytearray)):
            raise WarcFormatError("record block must be bytes")
        rid = "<urn:sha256:%s>" % hashlib.sha256(block).hexdigest()[:32]
        lines = [
            b"WARC/1.1",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: " + rid.encode(),
            b"WARC-Date: "
            + r.get("date", "2026-01-01T00:00:00Z").encode(),
            b"Content-Length: " + str(len(block)).encode(),
        ]
        if r.get("target_uri"):
            lines.append(
                b"WARC-Target-URI: " + r["target_uri"].encode("utf-8")
            )
        if r.get("content_type"):
            lines.append(
                b"Content-Type: " + r["content_type"].encode("ascii")
            )
        payload = (
            _CRLF.join(lines) + _CRLF + _CRLF + bytes(block)
            + _CRLF + _CRLF
        )
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            payload = co.compress(payload) + co.flush()
        out.append(payload)
    if not out:
        raise WarcFormatError("refusing to write an empty WARC")
    return b"".join(out)


def http_response_block(
    body: bytes, *, status: int = 200, content_type: str = "text/html",
    chunked: bool = False,
) -> bytes:
    """A valid HTTP/1.1 response block for fixture response records."""
    if chunked:
        # split into two chunks to exercise the decoder
        cut = len(body) // 2
        enc = b""
        for part in (body[:cut], body[cut:]):
            if part:
                enc += b"%x\r\n" % len(part) + part + _CRLF
        enc += b"0\r\n\r\n"
        framing = b"Transfer-Encoding: chunked"
        payload = enc
    else:
        framing = b"Content-Length: " + str(len(body)).encode()
        payload = body
    return (
        b"HTTP/1.1 %d OK\r\n" % status
        + b"Content-Type: " + content_type.encode("ascii") + _CRLF
        + framing + _CRLF + _CRLF
        + payload
    )
