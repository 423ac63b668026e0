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
Non-ASCII hosts: punycode (RFC 3492) is implemented from scratch
below (``puny_encode``/``puny_decode``/``idn_to_ascii``, pinned by
the RFC's §7.1 sample-string table), fronted since r11 by the FULL
UTS #46 IdnaMappingTable (Unicode 17.0.0, vendored at
``core/data/uts46_table.tsv``): valid/mapped/deviation/ignored/
disallowed statuses applied exactly, disallowed codepoints REJECT
via ``Uts46Error`` (callers keep totality by catching), and label
separators emerge from the table's own mappings.  A 20k-case fuzz
pins the mapping against the BSD ``idna`` package as referee.  Site
grouping runs the FULL published Public Suffix List
algorithm (``public_suffix``/``registrable_domain``: longest-match
over plain/wildcard/exception rules with the implicit ``*`` default)
over the embedded dated snapshot in ``core/psl_snapshot.py`` — since
r11 the COMPLETE published file (9,506 rules, snapshot 2023-02-09),
with unicode IDN rules indexed under both their published and
punycode forms (``_psl_ascii_tables``).

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

#: the embedded Public Suffix List snapshot (the complete dated
#: published file since r11 — core/psl_snapshot.py records the
#: snapshot date), parsed once into (plain, wildcard-base,
#: exception) label-tuple sets for the full published matching
#: algorithm in :func:`public_suffix`.  The published file lists IDN
#: rules in unicode form; hosts canonicalize to ASCII before
#: matching, so the table build at the END of this module (after
#: ``idn_to_ascii`` exists) indexes each rule under BOTH forms.
from .psl_snapshot import parse_rules as _psl_parse_rules  # noqa: E402

_PSL_PLAIN: frozenset = frozenset()
_PSL_WILD: frozenset = frozenset()
_PSL_EXC: frozenset = frozenset()


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
    point either way.  Non-ASCII labels then map to their IDNA-ASCII
    (``xn--``) form via the from-scratch punycode below, so 'BÜcher
    .example' and 'xn--bcher-kva.example' canonicalize identically;
    the totality contract holds (a label punycode cannot encode —
    overflow-sized — passes through unchanged, data not exception)."""

    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch.lower()
        return "%" + m.group(1).upper()

    host = _PCT_RE.sub(sub, s.lower())
    if any(ord(c) >= 128 for c in host):
        try:
            host = idn_to_ascii(host)
        except Exception:  # noqa: BLE001 - totality: keep as data
            pass
    return host


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


def public_suffix(host: str) -> str:
    """Longest matching public suffix per the published PSL algorithm
    (publicsuffix.org/list): an EXCEPTION rule prevails and yields the
    rule minus its leftmost label; otherwise the longest matching
    plain or wildcard (``*.``) rule; otherwise the implicit ``*``
    default (the TLD itself).  Hosts are lowercased and IDN labels
    mapped to their ASCII (``xn--``) form before matching, since the
    embedded snapshot stores ASCII rules.  Total: IPs, empty and
    single-label hosts return themselves."""
    if not host:
        return ""
    h = host.lower().rstrip(".")
    if h.startswith("[") or re.fullmatch(r"[0-9.]+", h):
        return h  # IP literal / dotted-quad
    if any(ord(c) >= 128 for c in h):
        try:
            h = idn_to_ascii(h)
        except Exception:  # noqa: BLE001 - totality: match as-is
            pass
    labels = tuple(h.split("."))
    n = len(labels)
    # exception rules prevail over everything (spec step: "If more
    # than one rule matches, the prevailing rule is the one which is
    # an exception rule")
    for i in range(n):
        if labels[i:] in _PSL_EXC:
            return ".".join(labels[i + 1 :])
    best = 1  # the implicit '*' default rule
    for length in range(n, 0, -1):  # longest first
        suffix = labels[n - length :]
        if suffix in _PSL_PLAIN or (
            length >= 2 and suffix[1:] in _PSL_WILD
        ):
            best = length
            break
    return ".".join(labels[n - best :])


def registrable_domain(host: str) -> str:
    """eTLD+1: one label below the public suffix (the PSL's
    "registrable domain" — the unit crawl pipelines group by).
    Hosts that ARE a public suffix, IPs, and single-label hosts
    return themselves (total, data-not-exception).  IDN hosts
    canonicalize to their ASCII form first, so 'sub.münchen.de' and
    'sub.xn--mnchen-3ya.de' group identically."""
    if not host:
        return ""
    h = host.lower().rstrip(".")
    if h.startswith("[") or re.fullmatch(r"[0-9.]+", h):
        return h  # IP literal / dotted-quad
    if any(ord(c) >= 128 for c in h):
        try:
            h = idn_to_ascii(h)
        except Exception:  # noqa: BLE001 - totality: keep as data
            pass
    ps = public_suffix(h)
    labels = h.split(".")
    ps_len = len(ps.split(".")) if ps else 0
    if len(labels) <= ps_len:
        return h  # the host IS a public suffix
    return ".".join(labels[-(ps_len + 1) :])


# ---------------------------------------------------------------------------
# Punycode (RFC 3492) — the algorithmic half of IDNA host handling.
# The UTS-46 case-mapping table remains the documented seam; punycode
# itself is a pure public algorithm, implemented here from the RFC's
# §6 pseudocode with its §5 parameter block verbatim.
# ---------------------------------------------------------------------------

_PC_BASE = 36
_PC_TMIN = 1
_PC_TMAX = 26
_PC_SKEW = 38
_PC_DAMP = 700
_PC_INITIAL_BIAS = 72
_PC_INITIAL_N = 128


class PunycodeError(ValueError):
    """Malformed punycode input (overflow, bad digit, non-ASCII)."""


def _pc_adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _PC_DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_PC_BASE - _PC_TMIN) * _PC_TMAX) // 2:
        delta //= _PC_BASE - _PC_TMIN
        k += _PC_BASE
    return k + (((_PC_BASE - _PC_TMIN + 1) * delta) // (delta + _PC_SKEW))


def _pc_digit_value(ch: str) -> int:
    o = ord(ch)
    if 0x41 <= o <= 0x5A:  # A-Z
        return o - 0x41
    if 0x61 <= o <= 0x7A:  # a-z
        return o - 0x61
    if 0x30 <= o <= 0x39:  # 0-9
        return o - 0x30 + 26
    raise PunycodeError(f"invalid punycode digit {ch!r}")


def puny_encode(label: str) -> str:
    """Unicode label -> punycode ASCII (no 'xn--' prefix)."""
    cps = [ord(c) for c in label]
    out = [c for c in label if ord(c) < 128]
    b = h = len(out)
    if out:
        out.append("-")
    n, delta, bias = _PC_INITIAL_N, 0, _PC_INITIAL_BIAS
    while h < len(cps):
        m = min(c for c in cps if c >= n)
        delta += (m - n) * (h + 1)
        if delta > 0x7FFFFFFF:
            raise PunycodeError("punycode overflow")
        n = m
        for c in cps:
            if c < n:
                delta += 1
                if delta > 0x7FFFFFFF:
                    raise PunycodeError("punycode overflow")
            elif c == n:
                q = delta
                k = _PC_BASE
                while True:
                    t = (
                        _PC_TMIN
                        if k <= bias
                        else (_PC_TMAX if k >= bias + _PC_TMAX else k - bias)
                    )
                    if q < t:
                        break
                    digit = t + (q - t) % (_PC_BASE - t)
                    out.append(
                        chr(digit + 0x61)
                        if digit < 26
                        else chr(digit - 26 + 0x30)
                    )
                    q = (q - t) // (_PC_BASE - t)
                    k += _PC_BASE
                out.append(
                    chr(q + 0x61) if q < 26 else chr(q - 26 + 0x30)
                )
                bias = _pc_adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def puny_decode(text: str) -> str:
    """Punycode ASCII (no 'xn--' prefix) -> unicode label."""
    if any(ord(c) >= 128 for c in text):
        raise PunycodeError("punycode input must be ASCII")
    pos = text.rfind("-")
    if pos > 0:
        out = [ord(c) for c in text[:pos]]
        rest = text[pos + 1 :]
    else:
        out = []
        rest = text[1:] if pos == 0 else text
    n, i, bias = _PC_INITIAL_N, 0, _PC_INITIAL_BIAS
    p = 0
    while p < len(rest):
        oldi = i
        w = 1
        k = _PC_BASE
        while True:
            if p >= len(rest):
                raise PunycodeError("truncated punycode")
            digit = _pc_digit_value(rest[p])
            p += 1
            if digit > (0x7FFFFFFF - i) // w:
                raise PunycodeError("punycode overflow")
            i += digit * w
            t = (
                _PC_TMIN
                if k <= bias
                else (_PC_TMAX if k >= bias + _PC_TMAX else k - bias)
            )
            if digit < t:
                break
            if w > 0x7FFFFFFF // (_PC_BASE - t):
                raise PunycodeError("punycode overflow")
            w *= _PC_BASE - t
            k += _PC_BASE
        bias = _pc_adapt(i - oldi, len(out) + 1, oldi == 0)
        if i // (len(out) + 1) > 0x7FFFFFFF - n:
            raise PunycodeError("punycode overflow")
        n += i // (len(out) + 1)
        i %= len(out) + 1
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            raise PunycodeError(f"punycode decodes outside unicode: {n}")
        out.insert(i, n)
        i += 1
    return "".join(chr(c) for c in out)


#: UTS-46 deviation characters (non-transitional processing, the
#: modern-browser behavior): these pass through the fold unmapped —
#: eszett and final sigma stay themselves, the zero-width (non-)joiner
#: survives for the scripts that need it
_UTS46_DEVIATIONS = frozenset("ßς‌‍")

#: UTS-46 label separators beyond '.': ideographic and fullwidth full
#: stops split labels exactly like '.' (UTS #46 §4, step 1 note)
_UTS46_DOTS = str.maketrans(
    {"。": ".", "．": ".", "｡": "."}
)


class Uts46Error(ValueError):
    """A codepoint's UTS #46 status is 'disallowed' — the label (and
    per §4 the whole domain) fails ToASCII.  Callers that want the
    totality contract catch this and keep the input verbatim (a crawl
    records the error by leaving the label unconverted)."""


_UTS46_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "data",
    "uts46_table.tsv",
)


def _load_uts46() -> tuple:
    """Load the vendored IdnaMappingTable (Unicode 17.0.0, UTS #46;
    ``core/data/uts46_table.tsv`` records provenance) into
    (range_starts, rows) for bisect lookup.  Statuses: V valid,
    M mapped (with replacement), D deviation (3 rows — kept as-is in
    non-transitional processing, replaced transitionally), I ignored
    (dropped), X disallowed (Uts46Error)."""
    starts: list[int] = []
    rows: list[tuple] = []
    with open(_UTS46_PATH, encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.rstrip("\n").split("\t")
            starts.append(int(parts[0], 16))
            repl = None
            if len(parts) == 3:
                repl = "".join(
                    chr(int(h, 16)) for h in parts[2].split()
                ) if parts[2] else ""
            rows.append((parts[1], repl))
    return starts, rows


try:
    _UTS46_STARTS, _UTS46_ROWS = _load_uts46()
    UTS46_COMPLETE = True
except OSError:  # stripped deployment: casefold+NFKC approximation
    _UTS46_STARTS, _UTS46_ROWS = [], []
    UTS46_COMPLETE = False


def uts46_status(cp: int) -> tuple:
    """(status, replacement) for a codepoint from the full table."""
    import bisect

    i = bisect.bisect_right(_UTS46_STARTS, cp) - 1
    return _UTS46_ROWS[i]


def uts46_map(label: str, transitional: bool = False) -> str:
    """UTS #46 §4 'Processing' step 1, the full published table
    (vendored, Unicode 17.0.0): per-codepoint status lookup — valid
    kept, mapped replaced, deviation kept (non-transitional; ``faß.de``
    stays distinct from ``fass.de`` as IDNA2008 requires) or replaced
    (transitional), ignored dropped, disallowed -> :class:`Uts46Error`
    — then NFC normalization (the spec applies NFC after mapping; the
    compatibility foldings NFKC used to approximate live in the M rows
    themselves).  In a stripped deployment with no table file the r10
    approximation (deviation-preserving casefold + NFKC) applies and
    ``UTS46_COMPLETE`` is False."""
    import unicodedata as _ud

    if not UTS46_COMPLETE:
        folded = "".join(
            c if c in _UTS46_DEVIATIONS else c.casefold() for c in label
        )
        return _ud.normalize("NFKC", folded)
    out: list[str] = []
    for ch in label:
        status, repl = uts46_status(ord(ch))
        if status == "V" or (status == "D" and not transitional):
            out.append(ch)
        elif status == "M" or (status == "D" and transitional):
            out.append(repl or "")
        elif status == "I":
            continue
        else:  # X — disallowed
            raise Uts46Error(
                f"disallowed codepoint U+{ord(ch):04X} in {label!r}"
            )
    return _ud.normalize("NFC", "".join(out))


def idn_to_ascii(host: str) -> str:
    """Host -> IDNA ASCII form per UTS #46: the full mapping table is
    applied to the WHOLE host first — so compatibility full stops
    (U+3002, U+FF0E, U+FE52, ...) become label separators through the
    table itself, closing the r10 ADVICE seam where forms that only
    become '.' after normalization were not split on — then each
    non-ASCII label gets the ``xn--`` ACE prefix over its punycode
    (RFC 3492, from scratch above).  Disallowed codepoints raise
    :class:`Uts46Error` (the spec's recorded error); callers keep the
    totality contract by catching it (``_norm_host``,
    ``public_suffix``, the dedup fixtures all do)."""
    mapped = uts46_map(host.translate(_UTS46_DOTS))
    out = []
    for lab in mapped.split("."):
        if any(ord(c) >= 128 for c in lab):
            out.append("xn--" + puny_encode(lab))
        else:
            out.append(lab)
    return ".".join(out)


def idn_to_unicode(host: str) -> str:
    """Inverse of :func:`idn_to_ascii`; non-ACE labels pass through,
    malformed ACE labels are returned verbatim (totality — a crawl
    treats them as data)."""
    out = []
    for lab in host.lower().split("."):
        if lab.startswith("xn--"):
            try:
                out.append(puny_decode(lab[4:]))
            except PunycodeError:
                out.append(lab)
        else:
            out.append(lab)
    return ".".join(out)


def _psl_ascii_tables() -> tuple:
    """Build the matching tables, indexing each rule under its
    published form AND — for the 466 unicode IDN rules — its
    punycode (``xn--``) form via our own UTS-46 + punycode encoder,
    since :func:`public_suffix` canonicalizes hosts to ASCII before
    lookup (the unicode form stays indexed too: totality keeps
    unconvertible hosts matching as-is)."""
    out = []
    for rules in _psl_parse_rules():
        both = set(rules)
        for labels in rules:
            joined = ".".join(labels)
            if any(ord(c) >= 128 for c in joined):
                try:
                    both.add(tuple(idn_to_ascii(joined).split(".")))
                except Exception:  # noqa: BLE001 - keep unicode form only
                    pass
        out.append(frozenset(both))
    return tuple(out)


_PSL_PLAIN, _PSL_WILD, _PSL_EXC = _psl_ascii_tables()
