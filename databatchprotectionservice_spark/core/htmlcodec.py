"""HTML tokenizer + text/title/link extraction — public WHATWG subset.

The web-corpus half of the text stack: Common-Crawl-style pipelines
spend most of their ingest turning raw HTML into clean training text
(CCNet, RefinedWeb, Dolma all start here).  This is a from-scratch,
dependency-free implementation of the public WHATWG parsing rules'
practically-needed subset: a regex-scanner tokenizer (tags with
attributes, comments, doctype/PI, CDATA, raw-text elements), HTML5
named + numeric character references, and display-semantics text
assembly (block elements break lines, inline elements do not,
``<pre>`` preserves whitespace, script/style/template subtrees are
dropped).

Contract: **total on arbitrary bytes** — unlike the binary codecs,
every byte string IS parseable HTML by spec error-recovery, so these
functions never raise on malformed input; the fuzz battery asserts
no-exception instead of domain-error.  Outputs are deterministic
pure-string functions, so a fixture corpus built by a reversible
template keeps every extraction oracle-checkable in SQL (the same
synthesize-then-invert pattern the multimodal fixtures use).

Spark usage: Arrow-batched ``mapInPandas`` over a string column
(`operators/textops.py` wires the query surface); no per-row Python
UDF in any hot path that a built-in could serve — tokenizing HTML
genuinely cannot be expressed in Spark SQL functions.
"""

from __future__ import annotations

import re

# block-level elements: entering or leaving one breaks the line
_BLOCK = frozenset(
    """address article aside blockquote body caption center dd details
    dialog div dl dt fieldset figcaption figure footer form h1 h2 h3 h4
    h5 h6 header hgroup hr html li main menu nav ol p pre section
    summary table tbody td tfoot th thead tr ul""".split()
)

#: subtrees whose text never reaches the reader
_DROP = frozenset("script style template noscript head title textarea".split())

#: raw-text elements: content runs to the matching close tag, unparsed
_RAWTEXT = frozenset("script style textarea title".split())

_VOID = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)

#: the practically-common slice of the HTML5 named-reference table
_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "shy": "­", "copy": "©", "reg": "®",
    "trade": "™", "deg": "°", "plusmn": "±",
    "times": "×", "divide": "÷", "frac12": "½",
    "frac14": "¼", "frac34": "¾", "sup2": "²",
    "sup3": "³", "micro": "µ", "para": "¶",
    "sect": "§", "middot": "·", "laquo": "«",
    "raquo": "»", "iquest": "¿", "iexcl": "¡",
    "cent": "¢", "pound": "£", "yen": "¥",
    "euro": "€", "curren": "¤",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "sbquo": "‚", "bdquo": "„",
    "dagger": "†", "Dagger": "‡", "permil": "‰",
    "prime": "′", "Prime": "″", "bull": "•",
    "minus": "−", "lowast": "∗", "ne": "≠",
    "le": "≤", "ge": "≥", "asymp": "≈",
    "infin": "∞", "sum": "∑", "prod": "∏",
    "radic": "√", "int": "∫", "part": "∂",
    "larr": "←", "uarr": "↑", "rarr": "→",
    "darr": "↓", "harr": "↔",
    "agrave": "à", "aacute": "á", "acirc": "â",
    "atilde": "ã", "auml": "ä", "aring": "å",
    "aelig": "æ", "ccedil": "ç", "egrave": "è",
    "eacute": "é", "ecirc": "ê", "euml": "ë",
    "igrave": "ì", "iacute": "í", "icirc": "î",
    "iuml": "ï", "ntilde": "ñ", "ograve": "ò",
    "oacute": "ó", "ocirc": "ô", "otilde": "õ",
    "ouml": "ö", "oslash": "ø", "ugrave": "ù",
    "uacute": "ú", "ucirc": "û", "uuml": "ü",
    "yacute": "ý", "yuml": "ÿ", "szlig": "ß",
    "Agrave": "À", "Aacute": "Á", "Auml": "Ä",
    "Eacute": "É", "Ouml": "Ö", "Uuml": "Ü",
    "alpha": "α", "beta": "β", "gamma": "γ",
    "delta": "δ", "epsilon": "ε", "lambda": "λ",
    "mu": "μ", "pi": "π", "sigma": "σ",
    "omega": "ω", "Omega": "Ω", "Delta": "Δ",
    "Sigma": "Σ", "Pi": "Π",
}

_ENTITY_RE = re.compile(
    r"&(?:#[xX]([0-9a-fA-F]{1,6})|#([0-9]{1,7})"
    r"|([a-zA-Z][a-zA-Z0-9]{1,31}))(;?)"
)

# master scanner: comment | CDATA | <!decl/<?pi | close tag | open tag
# with quoted-attr-aware body | text run | stray '<'
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"
    r"|<!\[CDATA\[(.*?)(?:\]\]>|\Z)"
    r"|<[!?][^>]*>?"
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*(?:>|\Z)"
    r"|<([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"
    r"|[^<]+"
    r"|<",
    re.S,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+))?"
)

_WS_RE = re.compile(r"[ \t\r\n\f]+")


def decode_entities(text: str) -> str:
    """HTML character references -> text (named subset + numeric)."""

    def sub(m: re.Match) -> str:
        hx, dec, name, semi = m.groups()
        if hx is not None or dec is not None:
            cp = int(hx, 16) if hx is not None else int(dec)
            if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                return "�"  # spec replacement for invalid refs
            if 0x80 <= cp <= 0x9F:
                # spec maps the C1 range through windows-1252
                try:
                    return bytes([cp]).decode("cp1252")
                except UnicodeDecodeError:
                    return "�"
            return chr(cp)
        if semi and name in _ENTITIES:
            return _ENTITIES[name]
        if not semi:
            # legacy no-semicolon form: longest known prefix wins
            # ("&times2" -> "×2"), matching browser error recovery
            for cut in range(len(name), 1, -1):
                if name[:cut] in _ENTITIES:
                    return _ENTITIES[name[:cut]] + name[cut:]
        return m.group(0)  # unknown name: leave verbatim, per browsers

    return _ENTITY_RE.sub(sub, text)


def tokenize_html(html: str):
    """Yield (kind, value, attrs) tokens.

    kind in {"open", "close", "text", "comment", "decl"}; for "open",
    value is the lowercased tag name and attrs a dict (first
    occurrence wins, values entity-decoded); rawtext element content
    is emitted as ONE "text" token with the parent tag name in attrs
    ("__raw__")."""
    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.match(html, pos)
        if m is None:  # unreachable: the alternation is total
            yield "text", html[pos], None
            pos += 1
            continue
        tok = m.group(0)
        pos = m.end()
        if tok.startswith("<!--"):
            yield "comment", tok, None
        elif m.group(1) is not None:  # CDATA payload is literal text
            yield "text", m.group(1), None
        elif tok.startswith("<!") or tok.startswith("<?"):
            yield "decl", tok, None
        elif m.group(2) is not None:
            yield "close", m.group(2).lower(), None
        elif m.group(3) is not None:
            name = m.group(3).lower()
            attrs = {}
            for am in _ATTR_RE.finditer(m.group(4) or ""):
                k = am.group(1).lower()
                v = am.group(2)
                if v is not None and v[:1] in "\"'":
                    v = v[1:-1]
                if k not in attrs:
                    attrs[k] = decode_entities(v) if v is not None else ""
            self_close = bool(m.group(5)) or name in _VOID
            yield "open", name, attrs
            if name in _RAWTEXT and not self_close:
                # raw content runs to the matching close tag
                cm = re.compile(
                    rf"</\s*{name}\b[^>]*>", re.I
                ).search(html, pos)
                if cm:
                    yield "text", html[pos : cm.start()], {"__raw__": name}
                    yield "close", name, None
                    pos = cm.end()
                else:
                    yield "text", html[pos:], {"__raw__": name}
                    pos = n
            if self_close:
                yield "close", name, None
        elif tok == "<":
            yield "text", "<", None
        else:
            yield "text", tok, None


def extract_text(html: str) -> str:
    """Readable text: blocks joined by single newlines, inline runs
    whitespace-collapsed, ``<pre>`` verbatim, dropped subtrees and
    character references handled.  Total — never raises."""
    blocks: list[str] = []
    buf: list[str] = []
    drop_stack: list[str] = []
    pre = 0

    def flush() -> None:
        if not buf:
            return
        joined = "".join(buf)
        buf.clear()
        if pre:
            if joined.strip("\n"):
                blocks.append(joined.strip("\n"))
            return
        collapsed = _WS_RE.sub(" ", joined).strip()
        if collapsed:
            blocks.append(collapsed)

    for kind, value, attrs in tokenize_html(html):
        if kind == "open":
            if value == "body":
                # spec error recovery: <body> auto-closes an unclosed
                # <head>, or text after a missing </head> would vanish
                while "head" in drop_stack:
                    drop_stack.remove("head")
            if value in _DROP:
                drop_stack.append(value)
            elif value == "br":
                flush()
            elif value in _BLOCK:
                flush()
                if value == "pre":
                    pre += 1
        elif kind == "close":
            if value in _DROP:
                if value in drop_stack:
                    # pop the innermost matching entry
                    drop_stack.reverse()
                    drop_stack.remove(value)
                    drop_stack.reverse()
            elif value in _BLOCK:
                flush()
                if value == "pre":
                    pre = max(0, pre - 1)
        elif kind == "text" and not drop_stack:
            if attrs and "__raw__" in attrs:
                continue  # rawtext is never reader-visible text
            buf.append(decode_entities(value))
    flush()
    return "\n".join(blocks)


def extract_title(html: str) -> str:
    for kind, value, attrs in tokenize_html(html):
        if kind == "text" and attrs and attrs.get("__raw__") == "title":
            return _WS_RE.sub(" ", decode_entities(value)).strip()
    return ""


def extract_links(html: str) -> list:
    """(href, anchor_text) for every <a href=...>; nested markup
    inside the anchor contributes its text."""
    links = []
    open_href = None
    anchor_buf: list[str] = []
    for kind, value, attrs in tokenize_html(html):
        if kind == "open" and value == "a":
            if open_href is not None:  # implicit close, per spec
                links.append(
                    (open_href,
                     _WS_RE.sub(" ", "".join(anchor_buf)).strip())
                )
            open_href = (attrs or {}).get("href", "")
            anchor_buf = []
        elif kind == "close" and value == "a":
            if open_href is not None:
                links.append(
                    (open_href,
                     _WS_RE.sub(" ", "".join(anchor_buf)).strip())
                )
                open_href = None
        elif kind == "text" and open_href is not None:
            if not (attrs and "__raw__" in attrs):
                anchor_buf.append(decode_entities(value))
    if open_href is not None:
        links.append(
            (open_href, _WS_RE.sub(" ", "".join(anchor_buf)).strip())
        )
    return links


_ESCAPE = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}
_ESCAPE_RE = re.compile(r"[&<>\"]")


def escape_html(text: str) -> str:
    """The reversible fixture direction: escape_html -> extract_text
    inverts exactly on whitespace-normalized input."""
    return _ESCAPE_RE.sub(lambda m: _ESCAPE[m.group(0)], text)
