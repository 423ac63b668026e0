"""URL parsing + canonical normalization — RFC 3986 subset.

The other half of web-corpus ingest beside ``htmlcodec``: URL-level
dedup and host-level quota/filtering (Common Crawl pipelines key
almost everything on the normalized URL or its registrable domain).
From the public RFC 3986 grammar alone: component split (appendix B
regex), case normalization (scheme/host), percent-encoding
normalization (decode unreserved, uppercase retained escapes),
default-port elision, dot-segment removal, and
``application/x-www-form-urlencoded`` query decoding.

Contract: **total on arbitrary strings** — a cleaning pipeline treats
malformed URLs as data to be classified, not exceptions; every
function returns a value for any input (the fuzz battery asserts it).
Non-ASCII hosts pass through lowercased — IDN/punycode mapping is a
documented seam (it needs the full UTS-46 table), as is the Public
Suffix List: ``registrable_domain`` ships a small built-in
multi-label-TLD subset and documents the approximation.

Deterministic pure-string functions, so fixture URLs derived from the
corpus keep every derived column oracle-checkable in SQL.
"""

from __future__ import annotations

import re

# RFC 3986 appendix B, anchored
_URL_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)

_DEFAULT_PORTS = {
    "http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443,
    "gopher": 70,
}

#: a built-in subset of multi-label public suffixes — the full PSL is
#: a mutable external list (documented seam); these cover the common
#: country-commercial forms
_MULTI_TLD = frozenset(
    """co.uk org.uk ac.uk gov.uk me.uk net.uk co.jp or.jp ne.jp ac.jp
    go.jp com.au net.au org.au edu.au gov.au com.br net.br org.br
    gov.br com.cn net.cn org.cn gov.cn com.mx org.mx com.ar com.tr
    co.in net.in org.in gov.in co.kr or.kr co.za org.za gov.za
    com.sg com.hk com.tw com.my com.ph com.vn com.eg com.sa
    co.nz net.nz org.nz govt.nz co.id or.id com.pl com.ru com.ua
    """.split()
)


def parse_url(url: str) -> dict:
    """Split into RFC components.  Total: any string parses (the
    appendix-B regex is total by construction)."""
    m = _URL_RE.match(url or "")
    scheme, authority, path, query, fragment = m.groups()
    userinfo = host = None
    port = None
    if authority is not None:
        rest = authority
        if "@" in rest:
            userinfo, rest = rest.rsplit("@", 1)
        if rest.startswith("["):  # IP-literal
            end = rest.find("]")
            if end != -1:
                host = rest[: end + 1]
                rest = rest[end + 1 :]
                if rest.startswith(":"):
                    port = _port_int(rest[1:])
            else:
                host = rest
        else:
            while rest.endswith(":"):  # empty ports elide
                rest = rest[:-1]
            if ":" in rest:
                h, p = rest.rsplit(":", 1)
                # a reg-name host cannot itself contain ':' — if it
                # would, keep the authority opaque (no port parse),
                # so serialize/re-parse stays a fixed point
                if p.isdigit() and len(p) <= 5 and ":" not in h:
                    host, port = h, int(p)
                else:
                    host = rest  # not a port: the colon is host data
            else:
                host = rest
    return {
        "scheme": scheme.lower() if scheme else None,
        "userinfo": userinfo,
        "host": host.lower() if host else host,
        "port": port,
        "path": path or "",
        "query": query,
        "fragment": fragment,
    }


def _port_int(p: str):
    return int(p) if p.isdigit() and len(p) <= 5 else None


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — the spec's own loop, verbatim semantics."""
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            cut = buf.find("/", 1)
            if cut == -1:
                out.append(buf)
                buf = ""
            else:
                out.append(buf[:cut])
                buf = buf[cut:]
    return "".join(out)


_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _norm_escapes(s: str) -> str:
    """Decode unreserved percent-escapes, uppercase the rest;
    malformed '%' sequences pass through verbatim (totality)."""

    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, s)


def _norm_host(s: str) -> str:
    """Host normalization: case-fold THEN escape-normalize, so a
    '%41' decoding to 'A' still comes out lowercase and retained
    escapes still come out uppercase-hex — a serialization fixed
    point either way."""

    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch.lower()
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, s.lower())


def normalize_url(url: str) -> str:
    """Canonical form: lowercase scheme/host, normalized escapes,
    default port elided, dot segments removed, empty authority path
    as '/', fragment dropped (fragments never reach the server)."""
    c = parse_url(url)
    out = []
    if c["scheme"]:
        out.append(c["scheme"] + ":")
    if c["host"] is not None:
        out.append("//")
        if c["userinfo"]:
            out.append(_norm_escapes(c["userinfo"]) + "@")
        out.append(_norm_host(c["host"]))
        if c["port"] is not None and c["port"] != _DEFAULT_PORTS.get(
            c["scheme"] or ""
        ):
            out.append(f":{c['port']}")
    path = _norm_escapes(remove_dot_segments(c["path"]))
    if c["host"] is not None and not path:
        path = "/"
    if c["host"] is None and path.startswith("//"):
        # RFC 3986 §4.2: a relative path beginning '//' would re-parse
        # as an authority; the spec's fix is a '/.' prefix
        path = "/." + path
    elif c["host"] is None and c["scheme"] is None:
        # same section: a ':' in the first segment of a schemeless
        # relative path would re-parse as a scheme; prefix './'
        first_seg = path.split("/", 1)[0]
        if ":" in first_seg:
            path = "./" + path
    out.append(path)
    if c["query"] is not None:
        out.append("?" + _norm_escapes(c["query"]))
    return "".join(out)


def parse_query(query: str) -> list:
    """x-www-form-urlencoded: '&'-separated k=v pairs, '+' as space,
    percent-decoded (full decode, not just unreserved).  Returns an
    ORDERED list of (key, value) — order is data for dedup keys."""
    pairs = []
    for part in (query or "").split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append((_form_decode(k), _form_decode(v)))
    return pairs


def _form_decode(s: str) -> str:
    s = s.replace("+", " ")
    # decode full percent-escapes; invalid UTF-8 byte runs fall back
    # per-byte to latin-1 (total, deterministic)
    out = bytearray()
    i = 0
    while i < len(s):
        m = _PCT_RE.match(s, i)
        if m:
            out.append(int(m.group(1), 16))
            i += 3
        else:
            out.extend(s[i].encode("utf-8"))
            i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out.decode("latin-1")


def registrable_domain(host: str) -> str:
    """eTLD+1 approximation: built-in multi-label-suffix subset plus
    the last-two-labels default.  IPs and single-label hosts return
    themselves.  The full PSL is a documented seam."""
    if not host:
        return ""
    h = host.lower().rstrip(".")
    if h.startswith("[") or re.fullmatch(r"[0-9.]+", h):
        return h  # IP literal / dotted-quad
    labels = h.split(".")
    if len(labels) < 2:
        return h
    last2 = ".".join(labels[-2:])
    if last2 in _MULTI_TLD and len(labels) >= 3:
        return ".".join(labels[-3:])
    return last2
