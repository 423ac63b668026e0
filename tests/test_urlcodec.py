"""URL codec (core/urlcodec.py).

RFC 3986's own worked examples pin dot-segment removal and component
splitting; normalization vectors cover case, escapes, default ports,
and fragments; the query decoder and registrable-domain heuristic get
hand vectors; hypothesis proves normalization idempotence and the
fuzz battery proves the total-function contract.
"""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databatchprotectionservice_spark.core.urlcodec import (
    normalize_url,
    parse_query,
    parse_url,
    registrable_domain,
    remove_dot_segments,
)


def test_rfc_component_split():
    c = parse_url("https://user:pw@Ex.COM:8042/over/there?name=ferret#nose")
    assert c["scheme"] == "https"
    assert c["userinfo"] == "user:pw"
    assert c["host"] == "ex.com"
    assert c["port"] == 8042
    assert c["path"] == "/over/there"
    assert c["query"] == "name=ferret"
    assert c["fragment"] == "nose"
    # no authority
    c = parse_url("mailto:a@b.com")
    assert c["scheme"] == "mailto" and c["host"] is None
    assert c["path"] == "a@b.com"
    # IPv6 literal keeps brackets, port parsed after ]
    c = parse_url("http://[2001:db8::7]:80/c")
    assert c["host"] == "[2001:db8::7]" and c["port"] == 80
    # scheme-relative and bare paths are total
    assert parse_url("//cdn.x.io/a.js")["host"] == "cdn.x.io"
    assert parse_url("just/a/path")["path"] == "just/a/path"
    assert parse_url("")["path"] == ""


def test_dot_segment_rfc_examples():
    """RFC 3986 §5.2.4's two worked examples, verbatim."""
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    assert remove_dot_segments("/./") == "/"
    assert remove_dot_segments("/../x") == "/x"
    assert remove_dot_segments("..") == ""


def test_normalize_vectors():
    # the RFC's equivalence example
    assert (
        normalize_url("HTTP://www.EXAMPLE.com:80/%7esmith/home.html")
        == "http://www.example.com/~smith/home.html"
    )
    # retained escapes uppercase; unreserved decode; fragment dropped
    assert (
        normalize_url("https://E.com/a%2fb/%41%20c?q=%7e#frag")
        == "https://e.com/a%2Fb/A%20c?q=~"
    )
    # default-port elision is scheme-aware
    assert normalize_url("https://x.io:443/p") == "https://x.io/p"
    assert normalize_url("https://x.io:8443/p") == "https://x.io:8443/p"
    # empty path with authority -> '/'
    assert normalize_url("http://x.io") == "http://x.io/"
    # dot segments removed
    assert normalize_url("http://x.io/a/b/../c/./d") == "http://x.io/a/c/d"
    # malformed escapes pass through (totality)
    assert normalize_url("http://x.io/%zz") == "http://x.io/%zz"
    # RFC 3986 §4.2 serialization guards: a relative path collapsing
    # to '//...' gets the '/.' prefix, a schemeless first segment
    # containing ':' gets './' — both must be fixed points
    assert normalize_url("/.//y") == "/.//y"
    assert normalize_url("./a:b") == "./a:b"
    # a '%41' host letter decodes AND case-folds in one pass
    assert normalize_url("http://%41B.com/%41") == "http://ab.com/A"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_normalize_idempotent_and_total(s):
    n1 = normalize_url(s)
    assert isinstance(n1, str)
    assert normalize_url(n1) == n1


def test_parse_query():
    assert parse_query("a=1&b=two+words&c=%C3%A9&d&=x") == [
        ("a", "1"), ("b", "two words"), ("c", "é"), ("d", ""), ("", "x"),
    ]
    assert parse_query("") == [] and parse_query(None) == []
    # invalid UTF-8 percent runs fall back to latin-1, never raise
    assert parse_query("k=%ff%fe")[0][1] == "ÿþ"


def test_registrable_domain():
    assert registrable_domain("www.example.com") == "example.com"
    assert registrable_domain("a.b.news.co.uk") == "news.co.uk"
    assert registrable_domain("deep.sub.site.com.au") == "site.com.au"
    assert registrable_domain("localhost") == "localhost"
    assert registrable_domain("192.168.0.1") == "192.168.0.1"
    assert registrable_domain("[2001:db8::1]") == "[2001:db8::1]"
    assert registrable_domain("EXAMPLE.ORG.") == "example.org"
    assert registrable_domain("") == ""
    # two-label host ON a multi-TLD is the suffix itself (no +1 label)
    assert registrable_domain("co.uk") == "co.uk"


def test_total_function_fuzz():
    random.seed(43)
    seeds = [
        "https://a.b.co.uk:8080/x/../y?k=v+1&z=%41#f",
        "ftp://u@h:21/d/./e",
        "//[::1]/p", "no-scheme/path?x", "%%%",
    ]
    for _ in range(2000):
        base = list(random.choice(seeds))
        for _ in range(random.randint(1, 8)):
            op = random.random()
            if op < 0.4 and base:
                base[random.randrange(len(base))] = chr(
                    random.randrange(1, 0x250)
                )
            elif op < 0.7 and len(base) > 2:
                cut = random.randrange(len(base) - 1)
                del base[cut : cut + random.randint(1, 5)]
            else:
                i = random.randrange(len(base) + 1)
                base[i:i] = random.choice(
                    ["%", "://", "@", ":", "#", "?", "&", "[", "]", "..",
                     "/.", "+"]
                )
        s = "".join(base)
        c = parse_url(s)
        assert isinstance(c, dict)
        n = normalize_url(s)
        assert isinstance(n, str)
        assert normalize_url(n) == n  # idempotent even on soup
        assert isinstance(parse_query(c["query"] or ""), list)
        assert isinstance(registrable_domain(c["host"] or ""), str)
