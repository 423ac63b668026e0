"""robots.txt parser + allow/disallow evaluation — RFC 9309.

The crawl-politeness filter in front of a web-corpus pipeline: before
a WARC record is even fetched, the URL must pass the origin's
robots.txt.  From the public RFC 9309 grammar alone:

* line-oriented ``field: value`` records, ``#`` comments, unknown
  fields ignored (the spec's forward-compatibility rule);
* GROUPS: one or more consecutive ``user-agent`` lines share the
  rules that follow; a ``user-agent`` line after rules starts a new
  group (§2.1);
* group selection (§2.2.1): the crawler obeys the group(s) whose
  user-agent token matches its product token case-insensitively,
  most-specific (longest) token first; ALL groups carrying exactly
  that token merge; the ``*`` group applies only when no specific
  group matched;
* rule matching (§2.2.2): path patterns match as octet prefixes with
  ``*`` (any sequence) and ``$`` (end anchor); the MOST SPECIFIC
  match wins — longest pattern in octets — and on an allow/disallow
  tie of equal length, ALLOW wins;
* no matching rule -> allowed, empty/missing robots.txt -> allowed;
  ``sitemap`` lines are collected independently of groups.

Contract mirrors ``urlcodec``: **total on arbitrary text** — a
malformed robots.txt is data, not an exception (garbage lines are
skipped exactly as the RFC instructs); the fuzz battery asserts it.
Pure string functions, so fixture robots files derived from the
corpus keep every decision oracle-checkable in SQL.
"""

from __future__ import annotations

#: parsing caps — a hostile multi-megabyte robots.txt must not grow
#: unbounded state (the RFC itself sets a 500 KiB processing floor)
MAX_BYTES = 512 * 1024
MAX_RULES = 10_000


def parse_robots(text: str) -> dict:
    """Parse robots.txt text into ``{"groups": [...], "sitemaps":
    [...]}`` where each group is ``{"agents": [lowercased tokens],
    "rules": [(kind, pattern), ...]}`` with kind ``"allow"`` or
    ``"disallow"``.  Never raises on malformed input."""
    if text is None:
        text = ""
    text = text[:MAX_BYTES]
    groups: list[dict] = []
    sitemaps: list[str] = []
    current: dict | None = None
    in_agent_run = False  # consecutive user-agent lines extend one group
    n_rules = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                current = {"agents": [], "rules": []}
                groups.append(current)
                in_agent_run = True
            if value:
                current["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if current is None:
                # rules before any user-agent line are invalid per the
                # grammar; the spec's lenient stance is to skip them
                continue
            if n_rules >= MAX_RULES:
                continue
            if value:
                current["rules"].append((field, value))
                n_rules += 1
            # an empty disallow/allow value is a no-op rule (§2.2.2)
        elif field == "sitemap":
            in_agent_run = False
            if value:
                sitemaps.append(value)
        else:
            in_agent_run = False
    return {"groups": groups, "sitemaps": sitemaps}


def _pattern_matches(pattern: str, path: str) -> bool:
    """§2.2.2 octet matching: prefix semantics, ``*`` any sequence,
    ``$`` anchors the end (only meaningful as the last character)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    pieces = pattern.split("*")
    if not path.startswith(pieces[0]):
        return False
    pos = len(pieces[0])
    if not anchored:
        for piece in pieces[1:]:
            found = path.find(piece, pos)
            if found < 0:
                return False
            pos = found + len(piece)
        return True
    if len(pieces) == 1:
        # no '*' at all: prefix + end anchor = exact equality; this also
        # covers the degenerate pattern '$' (empty prefix), which matches
        # only the empty path — never every path
        return pos == len(path)
    if pieces[-1] == "":
        # pattern ended in '*$': the trailing '*' absorbs the rest, so
        # only the earlier pieces constrain the match
        for piece in pieces[1:-1]:
            found = path.find(piece, pos)
            if found < 0:
                return False
            pos = found + len(piece)
        return True
    # anchored with a final literal: the LAST piece must sit at the exact
    # end of the path.  Greedy-leftmost placement of the middle pieces is
    # optimal (it minimizes the position the suffix must clear), but the
    # final piece itself must be matched as a suffix — leftmost placement
    # wrongly rejects '/*.php$' on '/index.php.php' where the literal
    # occurs earlier in the path than its end-anchored occurrence.
    for piece in pieces[1:-1]:
        found = path.find(piece, pos)
        if found < 0:
            return False
        pos = found + len(piece)
    last = pieces[-1]
    return len(path) - len(last) >= pos and path.endswith(last)


def select_rules(parsed: dict, user_agent: str) -> list[tuple[str, str]]:
    """§2.2.1: merge ALL groups naming the longest matching token;
    fall back to the ``*`` groups; else no rules."""
    ua = user_agent.lower()
    best_len = -1
    for g in parsed["groups"]:
        for token in g["agents"]:
            if token != "*" and token in ua and len(token) > best_len:
                best_len = len(token)
    rules: list[tuple[str, str]] = []
    if best_len >= 0:
        want = {
            t
            for g in parsed["groups"]
            for t in g["agents"]
            if t != "*" and t in ua and len(t) == best_len
        }
        for g in parsed["groups"]:
            if any(t in want for t in g["agents"]):
                rules.extend(g["rules"])
    else:
        for g in parsed["groups"]:
            if "*" in g["agents"]:
                rules.extend(g["rules"])
    return rules


def is_allowed(parsed: dict, user_agent: str, path: str) -> bool:
    """§2.2.2 precedence: longest matching pattern wins; allow wins
    length ties; no match -> allowed.  ``/robots.txt`` itself is
    always allowed (§2.2)."""
    if not path:
        path = "/"
    if path == "/robots.txt":
        return True
    best_len = -1
    verdict = True
    for kind, pattern in select_rules(parsed, user_agent):
        if not _pattern_matches(pattern, path):
            continue
        plen = len(pattern)
        if plen > best_len:
            best_len = plen
            verdict = kind == "allow"
        elif plen == best_len and kind == "allow":
            verdict = True
    return verdict
