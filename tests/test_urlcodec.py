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
        host = c["host"] or ""
        rd = registrable_domain(host)
        assert isinstance(rd, str)
        # PSL invariants hold even on soup: the public suffix is total,
        # and the registrable domain ends with it (label-aligned)
        from databatchprotectionservice_spark.core.urlcodec import (
            public_suffix,
        )

        ps = public_suffix(host)
        assert isinstance(ps, str)
        if ps and rd:
            assert rd == ps or rd.endswith("." + ps) or rd == host.lower().rstrip(".")


# ---------------------------------------------------------------------------
# Punycode (RFC 3492) — the referee is the RFC's §7.1 sample-string
# table, asserted in BOTH directions.
# ---------------------------------------------------------------------------

from databatchprotectionservice_spark.core.urlcodec import (  # noqa: E402
    PunycodeError,
    idn_to_ascii,
    idn_to_unicode,
    puny_decode,
    puny_encode,
)

#: RFC 3492 §7.1 (subset): encoded form -> unicode label
_RFC3492 = {
    "egbpdaj6bu4bxfgehfvwxn": "ليهمابتكلموشعربي؟",
    "ihqwcrb4cv8a8dqg056pqjye": "他们为什么不说中文",
    "ihqwctvzc91f659drss3x8bo0yb": "他們爲什麽不說中文",
    "Proprostnemluvesky-uyb24dma41a": "Pročprostěnemluvíčesky",
    "n8jok5ay5dzabd5bym9f0cm5685rrjetr6pdxa":
        "なぜみんな日本語を話してくれないのか",
    "989aomsvi5e83db1d2a355cv1e0vak1dwrv93d5xbh15a0dt30a5jpsd879ccm6fea98c":
        "세계의모든사람들이한국어를이해한다면얼마나좋을까",
    "3B-ww4c5e180e575a65lsy2b": "3年B組金八先生",
    "-with-SUPER-MONKEYS-pc58ag80a8qai00g7n9n":
        "安室奈美恵-with-SUPER-MONKEYS",
    "Hello-Another-Way--fc4qua05auwb3674vfr0b":
        "Hello-Another-Way-それぞれの場所",
    "2-u9tlzr9756bt3uc0v": "ひとつ屋根の下2",
    "MajiKoi5-783gue6qz075azm5e": "MajiでKoiする5秒前",
    "de-jg4avhby1noc0d": "パフィーdeルンバ",
    "d9juau41awczczp": "そのスピードで",
}


def test_rfc3492_sample_strings_decode():
    for enc, uni in _RFC3492.items():
        assert puny_decode(enc) == uni, enc


def test_rfc3492_sample_strings_encode():
    for enc, uni in _RFC3492.items():
        assert puny_encode(uni) == enc, enc


def test_punycode_roundtrip_edges():
    for s in ("", "plain", "a-b-c", "ü", "日本語", "x" * 60 + "é"):
        assert puny_decode(puny_encode(s)) == s, s


def test_punycode_error_paths():
    import pytest as _pytest

    with _pytest.raises(PunycodeError):
        puny_decode("é")  # non-ASCII input
    with _pytest.raises(PunycodeError):
        puny_decode("99999999999a")  # overflow
    with _pytest.raises(PunycodeError):
        puny_decode("!!")  # invalid digit


def test_idn_helpers():
    assert idn_to_ascii("BÜcher.example") == "xn--bcher-kva.example"
    assert idn_to_unicode("xn--bcher-kva.example") == "bücher.example"
    assert idn_to_ascii("plain.example.com") == "plain.example.com"
    # malformed ACE passes through verbatim (totality)
    assert idn_to_unicode("xn--!!.example") == "xn--!!.example"


def test_normalize_url_maps_idn_hosts_to_ace():
    from databatchprotectionservice_spark.core.urlcodec import (
        normalize_url,
    )

    # the unicode and ACE spellings canonicalize to ONE string
    assert (
        normalize_url("HTTP://BÜcher.example:80/a/../p")
        == normalize_url("http://xn--bcher-kva.example/p")
        == "http://xn--bcher-kva.example/p"
    )
    # ASCII hosts are untouched; totality holds on hostile hosts
    assert normalize_url("http://plain.example/p").startswith(
        "http://plain.example"
    )
    normalize_url("http://" + "é" * 5000 + "/p")  # must not raise


def test_public_suffix_list_algorithm():
    """The published PSL algorithm over the embedded snapshot: plain
    rules by longest match, wildcard '*.' rules, '!' exception rules,
    and the implicit '*' default for unlisted TLDs."""
    from databatchprotectionservice_spark.core.urlcodec import public_suffix

    # plain rules, longest match wins
    assert public_suffix("example.com") == "com"
    assert public_suffix("a.b.example.co.uk") == "co.uk"
    assert public_suffix("police.uk") == "police.uk"
    # private-section suffixes
    assert public_suffix("user.github.io") == "github.io"
    assert public_suffix("x.s.blogspot.com") == "blogspot.com"
    # wildcard: '*.ck' makes every <label>.ck a public suffix
    assert public_suffix("anything.ck") == "anything.ck"
    assert public_suffix("shop.anything.ck") == "anything.ck"
    # exception: '!www.ck' prevails over the wildcard
    assert public_suffix("www.ck") == "ck"
    assert public_suffix("deep.www.ck") == "ck"
    # implicit '*' default: unlisted TLD is its own suffix
    assert public_suffix("example.notatld") == "notatld"
    # totality: IPs / single labels / empty return themselves
    assert public_suffix("10.0.0.1") == "10.0.0.1"
    assert public_suffix("localhost") == "localhost"
    assert public_suffix("") == ""


def test_registrable_domain_psl_classes():
    """eTLD+1 across every rule class the site-grouping query uses,
    including IDN canonicalization to the ASCII form."""
    # wildcard: the site is one label UNDER <label>.ck
    assert registrable_domain("w.shop.foo.ck") == "shop.foo.ck"
    # exception: www.ck is itself registrable (public suffix is 'ck')
    assert registrable_domain("h1.www.ck") == "www.ck"
    assert registrable_domain("www.ck") == "www.ck"
    # private section: each github.io user is an independent site
    assert registrable_domain("a.user5.github.io") == "user5.github.io"
    assert registrable_domain("github.io") == "github.io"
    # IDN host and its ACE form group identically (ASCII out)
    assert (
        registrable_domain("sub.münchen.de")
        == registrable_domain("sub.xn--mnchen-3ya.de")
        == "xn--mnchen-3ya.de"
    )
    # an IDN label ABOVE the registrable domain drops out entirely
    assert registrable_domain("w.münchen.example.de") == "example.de"


def test_psl_snapshot_parses_and_is_consistent():
    """The snapshot file format parses like the published file: rules
    partition into plain/wildcard/exception, every exception's base
    also carries a wildcard (an exception without a wildcard to
    override is dead data), and no rule appears twice."""
    from databatchprotectionservice_spark.core.psl_snapshot import (
        PSL_RULES,
        PSL_SNAPSHOT_DATE,
        parse_rules,
    )

    plain, wild, exc = parse_rules()
    assert len(plain) > 100 and wild and exc
    assert PSL_SNAPSHOT_DATE.count("-") == 2
    # every exception overrides some wildcard
    for e in exc:
        assert e[1:] in wild, f"exception {e} overrides no wildcard"
    # no rule is both plain and a wildcard base's full form
    assert not (plain & exc)
    # rule lines are unique in the raw text
    rules = [
        ln.strip() for ln in PSL_RULES.splitlines()
        if ln.strip() and not ln.strip().startswith("//")
    ]
    assert len(rules) == len(set(rules))


def test_uts46_mapping_vectors():
    """UTS-46 mapping (deviation-preserving casefold + NFKC +
    ideographic label separators) over published behavior vectors;
    the punycode cross-check xn--wgv71a119e is RFC 3492's 日本語."""
    from databatchprotectionservice_spark.core.urlcodec import (
        idn_to_ascii,
        uts46_map,
    )

    assert idn_to_ascii("BÜCHER.example") == "xn--bcher-kva.example"
    # non-transitional: eszett preserved, so faß.de != fass.de
    assert idn_to_ascii("faß.de") == "xn--fa-hia.de"
    assert idn_to_ascii("fass.de") == "fass.de"
    # ideographic/fullwidth full stops are label separators; fullwidth
    # letters collapse to ASCII via NFKC
    assert idn_to_ascii("日本語。ＪＰ") == "xn--wgv71a119e.jp"
    assert idn_to_ascii("Ｅｘａｍｐｌｅ。ＣＯＭ") == "example.com"
    # ligatures expand per the compatibility decomposition
    assert idn_to_ascii("ﬁsh.example") == "fish.example"
    # uts46_map is idempotent on its own output (fixed point)
    for s in ("straße", "ＡＢＣﬁ", "ΣΊΣΥΦΟΣ", "mixedCASE"):
        once = uts46_map(s)
        assert uts46_map(once) == once


def test_uts46_in_normalize_url_and_site_grouping():
    """The mapping is live in the URL chain: fullwidth/ideographic
    hosts canonicalize to the same site as their ASCII form."""
    from databatchprotectionservice_spark.core.urlcodec import normalize_url

    assert (
        normalize_url("http://Ｅｘａｍｐｌｅ。ＣＯＭ/p")
        == "http://example.com/p"
    )
    assert registrable_domain("ｗｗｗ。ｅｘａｍｐｌｅ。ｃｏｍ") == "example.com"


def test_full_psl_rare_tld_matrix():
    """The r11 full-file swap-in (core/data/public_suffix_list.dat,
    snapshot 2023-02-09): rare-TLD rule classes the curated subset
    could not know — the *.kawasaki.jp wildcard family with its
    !city.* exceptions, deep ccTLD structures, unicode IDN rules
    matched in BOTH published and punycode form, and private-section
    platform suffixes."""
    from databatchprotectionservice_spark.core.psl_snapshot import (
        PSL_COMPLETE,
    )
    from databatchprotectionservice_spark.core.urlcodec import (
        public_suffix,
        registrable_domain,
    )

    assert PSL_COMPLETE, "vendored data file must load"
    # *.kawasaki.jp wildcard: any label under kawasaki.jp is a suffix
    assert public_suffix("foo.bar.kawasaki.jp") == "bar.kawasaki.jp"
    assert registrable_domain("foo.bar.kawasaki.jp") == "foo.bar.kawasaki.jp"
    # ... except the !city.kawasaki.jp carve-out
    assert public_suffix("www.city.kawasaki.jp") == "kawasaki.jp"
    assert registrable_domain("www.city.kawasaki.jp") == "city.kawasaki.jp"
    # the sibling exception families ship too
    assert registrable_domain("a.city.kobe.jp") == "city.kobe.jp"
    assert public_suffix("x.y.kobe.jp") == "y.kobe.jp"  # *.kobe.jp
    # deep ccTLD structure beyond the curated subset
    assert public_suffix("x.pvt.k12.ma.us") == "pvt.k12.ma.us"
    # unicode IDN rule, both published and punycode query forms
    assert public_suffix("example.公司.cn") == "xn--55qx5d.cn"
    assert public_suffix("example.xn--55qx5d.cn") == "xn--55qx5d.cn"
    assert (
        registrable_domain("a.example.xn--55qx5d.cn")
        == "example.xn--55qx5d.cn"
    )
    # private-section platform suffixes at full coverage
    assert registrable_domain("x.user.s3.amazonaws.com") is not None
    assert public_suffix("b.c.compute.amazonaws.com") == (
        "c.compute.amazonaws.com"
    )
    # unlisted TLD falls to the implicit '*' default
    assert public_suffix("host.zzzz-not-a-tld") == "zzzz-not-a-tld"


def test_uts46_full_table_statuses_and_referee_parity():
    """The r11 full IdnaMappingTable (Unicode 17.0.0, vendored at
    core/data/uts46_table.tsv): disallowed codepoints now REJECT
    (Uts46Error) instead of passing through, ignored codepoints are
    dropped, deviations are preserved non-transitionally and replaced
    transitionally, and a 20k-case fuzz pins the whole mapping
    against the BSD idna package's uts46_remap as independent
    referee (skipped when the package is absent)."""
    import pytest as _pytest

    from databatchprotectionservice_spark.core.urlcodec import (
        UTS46_COMPLETE,
        Uts46Error,
        idn_to_ascii,
        uts46_map,
        uts46_status,
    )

    assert UTS46_COMPLETE
    # status classes straight from the table
    assert uts46_status(ord("A")) == ("M", "a")
    assert uts46_status(0x00DF)[0] == "D"  # ß deviation
    assert uts46_status(0x2064)[0] == "I"  # invisible plus: ignored
    assert uts46_status(0xFE12)[0] == "X"  # vertical ideographic stop
    assert uts46_status(0x3002) == ("M", ".")  # ideographic full stop
    # deviations: non-transitional keeps, transitional maps
    assert uts46_map("faß") == "faß"
    assert uts46_map("faß", transitional=True) == "fass"
    assert uts46_map("x‌y") == "x‌y"  # ZWNJ deviation kept
    # capital sharp S maps to ß (the r10 ADVICE residual), not 'ss'
    assert uts46_map("ẞ") == "ß"
    assert idn_to_ascii("ẞ.de") == "xn--zca.de"
    # ignored chars drop, disallowed raise — per spec, not pass-through
    assert uts46_map("a⁤b") == "ab"
    with _pytest.raises(Uts46Error):
        uts46_map("ab︒cd")
    with _pytest.raises(Uts46Error):
        idn_to_ascii("ab﹒cd")
    # separators that EMERGE from the mapping split labels (ADVICE r10)
    assert idn_to_ascii("ab。cd") == "ab.cd"
    assert idn_to_ascii("ab．cd") == "ab.cd"

    idna = _pytest.importorskip("idna")
    import random

    rng = random.Random(1)
    for _ in range(20000):
        s = "".join(
            chr(rng.randint(0x20, 0x2FFFF))
            for _ in range(rng.randint(1, 8))
        )
        try:
            ours = uts46_map(s)
        except Uts46Error:
            ours = "<X>"
        try:
            ref = idna.uts46_remap(s, std3_rules=False, transitional=False)
        except Exception:  # noqa: BLE001 - referee's error classes vary
            ref = "<X>"
        assert ours == ref, repr(s)
