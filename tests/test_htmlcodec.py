"""HTML tokenizer / extraction (core/htmlcodec.py).

Hand vectors pin tokenization (attributes, rawtext, CDATA, comments,
void/self-closing tags), entity decoding (named, decimal, hex, C1
windows-1252 remap, invalid -> U+FFFD), and the display-semantics
text assembly (block breaks, inline joins, <pre>, dropped subtrees,
missing-</head> recovery).  A reversibility property proves the
fixture direction (escape_html -> template -> extract_text inverts
exactly on normalized text — the r10 oracle pattern), and the fuzz
battery asserts the TOTAL-function contract: arbitrary byte soup
never raises.
"""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.htmlcodec import (
    decode_entities,
    escape_html,
    extract_links,
    extract_text,
    extract_title,
    tokenize_html,
)


def test_tokenizer_hand_vector():
    html = (
        '<!DOCTYPE html><p class="a b" data-x=\'1\' checked>hi<br/>'
        "<!-- note --><![CDATA[<raw>]]><img src=x.png></p>"
    )
    toks = list(tokenize_html(html))
    assert toks[0] == ("decl", "<!DOCTYPE html>", None)
    kind, name, attrs = toks[1]
    assert (kind, name) == ("open", "p")
    assert attrs == {"class": "a b", "data-x": "1", "checked": ""}
    assert toks[2] == ("text", "hi", None)
    # <br/> is void AND self-closed: open + synthetic close
    assert toks[3] == ("open", "br", {})
    assert toks[4] == ("close", "br", None)
    assert toks[5][0] == "comment"
    assert toks[6] == ("text", "<raw>", None)
    assert toks[7][0:2] == ("open", "img")
    assert toks[8] == ("close", "img", None)
    assert toks[9] == ("close", "p", None)


def test_rawtext_elements_swallow_markup():
    html = "<script>if (a<b && c>d) {}</script><p>x</p>"
    toks = list(tokenize_html(html))
    assert toks[0][0:2] == ("open", "script")
    assert toks[1] == ("text", "if (a<b && c>d) {}", {"__raw__": "script"})
    assert toks[2] == ("close", "script", None)
    assert extract_text(html) == "x"
    # unterminated rawtext runs to EOF without raising
    assert extract_text("<style>p{color:red}") == ""


def test_entities():
    assert decode_entities("a &amp; b &lt;c&gt; &quot;d&quot;") == (
        'a & b <c> "d"'
    )
    assert decode_entities("&#65;&#x42;&#X63;") == "ABc"
    assert decode_entities("caf&eacute; &mdash; na&iuml;ve") == "café — naïve"
    # legacy no-semicolon form
    assert decode_entities("3&times2") == "3×2"
    # unknown names stay verbatim
    assert decode_entities("&nosuch;") == "&nosuch;"
    # invalid numeric -> replacement; C1 range -> cp1252
    assert decode_entities("&#0;&#xD800;&#x110000;") == "���"
    assert decode_entities("&#x93;ok&#x94;") == "“ok”"
    assert decode_entities("&#x2014;") == "—"


def test_extract_text_blocks_and_inline():
    html = (
        "<html><head><title>T</title><style>b{}</style></head><body>"
        "<h1>Head  line</h1><p>one <b>two</b>\n three</p>"
        "<div>four</div>five <span>six</span></body></html>"
    )
    assert extract_text(html) == (
        "Head line\none two three\nfour\nfive six"
    )
    # title is dropped from text but available separately
    assert extract_title(html) == "T"


def test_pre_preserves_whitespace():
    html = "<p>a</p><pre>  x\n   y  z\n</pre><p>b</p>"
    assert extract_text(html) == "a\n  x\n   y  z\nb"


def test_br_and_missing_head_close():
    assert extract_text("one<br>two") == "one\ntwo"
    # no </head>: <body> must rescue the visible text
    html = "<head><meta charset=utf-8><body><p>seen</p>"
    assert extract_text(html) == "seen"


def test_extract_links():
    html = (
        '<a href="/x">first <b>bold</b></a> mid '
        "<a href='http://e.com/?a=1&amp;b=2'>second</a>"
        "<a href=bare>un<closed"
    )
    links = extract_links(html)
    assert links[0] == ("/x", "first bold")
    assert links[1] == ("http://e.com/?a=1&b=2", "second")
    assert links[2][0] == "bare"


def test_dropped_subtrees_and_comments():
    html = (
        "<p>keep</p><script>drop()</script><noscript>drop</noscript>"
        "<template><p>drop</p></template><!-- drop -->"
        "<textarea>drop</textarea><p>keep2</p>"
    )
    assert extract_text(html) == "keep\nkeep2"


@settings(max_examples=60, deadline=None)
@given(
    lines=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"),
            ),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fixture_template_inverts_exactly(lines):
    """The r10 oracle pattern: normalized text -> escaped template ->
    extract_text recovers the input byte-for-byte."""
    import re as _re

    norm = [
        _re.sub(r"[ \t\r\n\f]+", " ", ln).strip() for ln in lines
    ]
    norm = [ln for ln in norm if ln]
    html = (
        "<html><head><title>t</title></head><body><nav>boiler "
        "plate</nav>"
        + "".join(f"<p>{escape_html(ln)}</p>" for ln in norm)
        + "<footer>© 2026</footer></body></html>"
    )
    want = "\n".join(["boiler plate"] + norm + ["© 2026"])
    assert extract_text(html) == want


def test_total_function_fuzz_never_raises():
    """Arbitrary byte soup: extraction is total, returns strings."""
    rng = np.random.default_rng(41)
    random.seed(41)
    seeds = [
        "<p>seed</p><a href='x'>l</a><script>s</script>",
        "<div><pre>p</pre><table><tr><td>c</td></tr></table></div>",
        "plain & text < with > sigils &#x41; &bogus;",
    ]
    for _ in range(2000):
        base = list(random.choice(seeds))
        for _ in range(random.randint(1, 10)):
            op = random.random()
            if op < 0.4 and base:
                base[random.randrange(len(base))] = chr(
                    random.randrange(1, 0x300)
                )
            elif op < 0.7 and len(base) > 2:
                cut = random.randrange(len(base) - 1)
                del base[cut : cut + random.randint(1, 6)]
            else:
                i = random.randrange(len(base) + 1)
                base[i:i] = random.choice(
                    ["<", ">", "&", '"', "<p", "</", "<!--", "<![CDATA[",
                     "<script>", "&#", "&#x", "='"]
                )
        s = "".join(base)
        out = extract_text(s)
        assert isinstance(out, str)
        assert isinstance(extract_title(s), str)
        assert isinstance(extract_links(s), list)
        assert isinstance(decode_entities(s), str)
