"""RFC 9309 robots.txt parser vs the spec's own matching examples.

The referee is the RFC itself: §2.2.2's longest-match example table,
§5.2's group/merging examples, and §2.2.1's user-agent selection
rules are asserted verbatim.  A fuzz battery asserts the parser's
totality contract (arbitrary text never raises), mirroring urlcodec.
"""

import random
import string

from databatchprotectionservice_spark.core.robotscodec import (
    is_allowed,
    parse_robots,
    select_rules,
)

_EXAMPLE = """
# comments everywhere  # nested
User-agent: *
Disallow: /private/
Allow: /private/ok$
Disallow: /*.tmp$

User-agent: dbpsbot
Allow: /
Disallow: /blocked/

Sitemap: https://example.com/sitemap.xml
unknown-field: ignored
"""


def test_group_structure_and_sitemaps():
    p = parse_robots(_EXAMPLE)
    assert len(p["groups"]) == 2
    assert p["groups"][0]["agents"] == ["*"]
    assert p["groups"][1]["agents"] == ["dbpsbot"]
    assert p["sitemaps"] == ["https://example.com/sitemap.xml"]


def test_star_group_decisions():
    p = parse_robots(_EXAMPLE)
    ua = "otherbot"
    assert is_allowed(p, ua, "/p/123")
    assert not is_allowed(p, ua, "/private/123")
    assert is_allowed(p, ua, "/private/ok")       # longer allow wins
    assert not is_allowed(p, ua, "/private/ok2")  # $ anchor holds
    assert not is_allowed(p, ua, "/f/x.tmp")      # wildcard + $
    assert is_allowed(p, ua, "/f/x.tmp2")
    assert is_allowed(p, ua, "/blocked/123")      # bot-only rule
    assert is_allowed(p, ua, "/robots.txt")       # implicit allow


def test_specific_group_shadows_star():
    p = parse_robots(_EXAMPLE)
    ua = "DBPSBot/1.0"
    assert is_allowed(p, ua, "/private/123")      # * group ignored
    assert not is_allowed(p, ua, "/blocked/123")
    assert is_allowed(p, ua, "/p/123")


def test_rfc_longest_match_table():
    """§2.2.2: 'most specific match found MUST be used' examples."""
    p = parse_robots("User-agent: *\nAllow: /p\nDisallow: /\n")
    assert is_allowed(p, "bot", "/page")
    p = parse_robots("User-agent: *\nAllow: /folder\nDisallow: /folder\n")
    assert is_allowed(p, "bot", "/folder/page")  # tie -> allow
    p = parse_robots("User-agent: *\nAllow: /page\nDisallow: /*.ph\n")
    assert is_allowed(p, "bot", "/page")
    p = parse_robots("User-agent: *\nAllow: /$\nDisallow: /\n")
    assert is_allowed(p, "bot", "/")
    assert not is_allowed(p, "bot", "/page.htm")


def test_consecutive_agent_lines_share_rules_and_merge():
    """§5.2-style: consecutive user-agent lines form ONE group; two
    groups naming the same token merge."""
    txt = (
        "User-agent: a\nUser-agent: b\nDisallow: /x/\n\n"
        "User-agent: a\nDisallow: /y/\n"
    )
    p = parse_robots(txt)
    assert not is_allowed(p, "a", "/x/1")
    assert not is_allowed(p, "a", "/y/1")  # merged across groups
    assert not is_allowed(p, "b", "/x/1")
    assert is_allowed(p, "b", "/y/1")
    assert is_allowed(p, "c", "/x/1")  # no * group -> allowed


def test_no_rules_and_hostile_inputs_are_allowed():
    for text in ("", None, "garbage\nno colons here", ":", "Allow: /x\n"):
        p = parse_robots(text)
        assert is_allowed(p, "bot", "/anything")
    # rules before any user-agent line are skipped per the grammar
    p = parse_robots("Disallow: /\nUser-agent: *\nDisallow: /q/\n")
    assert is_allowed(p, "bot", "/page")
    assert not is_allowed(p, "bot", "/q/1")


def test_wildcard_edge_cases():
    p = parse_robots("User-agent: *\nDisallow: /a*b*c\n")
    assert not is_allowed(p, "bot", "/aXbYc-and-more")
    assert is_allowed(p, "bot", "/acb")
    p = parse_robots("User-agent: *\nDisallow: /a*$\n")
    assert not is_allowed(p, "bot", "/anything")
    p = parse_robots("User-agent: *\nDisallow: *.gif$\n")
    assert not is_allowed(p, "bot", "/img/x.gif")
    assert is_allowed(p, "bot", "/img/x.gifs")


def test_totality_fuzz():
    rng = random.Random(47)
    alphabet = string.printable + "é水\x00"
    for _ in range(2000):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 300))
        )
        p = parse_robots(text)  # must never raise
        is_allowed(p, "bot", "/x")  # nor this
        select_rules(p, "*")
    # a multi-megabyte hostile file is capped, not accumulated
    huge = ("User-agent: *\n" + "Disallow: /x\n" * 200000)
    p = parse_robots(huge)
    assert sum(len(g["rules"]) for g in p["groups"]) <= 10_000


def test_anchored_suffix_backtracking():
    """ADVICE r9 (medium): '$'-anchored patterns whose final literal also
    occurs earlier in the path must still match — the final piece is a
    suffix constraint, not a greedy-leftmost placement."""
    p = parse_robots("User-agent: *\nDisallow: /*.php$\n")
    assert not is_allowed(p, "bot", "/index.php.php")
    assert not is_allowed(p, "bot", "/index.php")
    assert is_allowed(p, "bot", "/index.phpx")
    p = parse_robots("User-agent: *\nDisallow: /foo*bar$\n")
    assert not is_allowed(p, "bot", "/foo-bar-bar")
    assert not is_allowed(p, "bot", "/foobar")
    assert is_allowed(p, "bot", "/foo-bar-baz")
    # middle pieces stay greedy-leftmost; only the last is a suffix
    p = parse_robots("User-agent: *\nDisallow: /a*b*c$\n")
    assert not is_allowed(p, "bot", "/a-b-c-b-c")
    assert is_allowed(p, "bot", "/a-c-b")


def test_dollar_only_pattern_matches_nothing_real():
    """ADVICE r9 (low): a pattern of just '$' anchors the EMPTY prefix —
    it matches only the empty path, never every path."""
    p = parse_robots("User-agent: *\nDisallow: $\n")
    assert is_allowed(p, "bot", "/")
    assert is_allowed(p, "bot", "/anything")
    # but a genuine '*$' still matches everything
    p = parse_robots("User-agent: *\nDisallow: *$\n")
    assert not is_allowed(p, "bot", "/anything")
