"""Embedded Public Suffix List snapshot — the COMPLETE dated file.

The PSL (publicsuffix.org, Mozilla-maintained, MPL-2.0 public data) is
the registry crawl pipelines use to group URLs by *site*: the
registrable domain (eTLD+1) is one label below the longest matching
public suffix.  ``core/urlcodec.registrable_domain`` implements the
full published ALGORITHM — longest-match over plain, wildcard (``*.``)
and exception (``!``) rules, with the implicit ``*`` default for
unlisted TLDs — over the snapshot this module loads.

Since round 11 the snapshot is the COMPLETE published file (9,506
rules incl. the full ICANN + PRIVATE sections, the ``*.kawasaki.jp``
wildcard/exception families, and 466 IDN rules in their published
unicode form), vendored verbatim at
``core/data/public_suffix_list.dat`` from the Debian ``publicsuffix``
package snapshot **20230209.2326** (publicsuffix.org list dated
2023-02-09; MPL-2.0, license header preserved in the file).  The
r10 curated subset remains below as ``PSL_RULES_FALLBACK``, used
only if the data file is missing from a stripped deployment —
``PSL_COMPLETE`` says which one loaded.

IDN rules appear in the published file in unicode form;
``core/urlcodec`` additionally indexes each rule's punycode form at
table-build time (hosts canonicalize to ASCII before matching).
"""

from __future__ import annotations

import os

PSL_SNAPSHOT_DATE = "2023-02-09"  # publicsuffix.org list date

_DATA_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "data",
    "public_suffix_list.dat",
)

try:
    with open(_DATA_PATH, encoding="utf-8") as _fh:
        PSL_RULES = _fh.read()
    PSL_COMPLETE = True
except OSError:  # stripped deployment: documented curated fallback
    PSL_RULES = None  # set below after the fallback literal
    PSL_COMPLETE = False

PSL_RULES_FALLBACK = """
// ===BEGIN ICANN DOMAINS===
// generic TLDs (unlisted TLDs fall to the implicit '*' default rule)
com
org
net
edu
gov
int
mil
info
biz
name
io
co
me
tv
dev
app
ai
// ccTLD second-level structures (highest crawl volume)
uk
ac.uk
co.uk
gov.uk
ltd.uk
me.uk
net.uk
nhs.uk
org.uk
plc.uk
police.uk
sch.uk
jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
au
asn.au
com.au
edu.au
gov.au
id.au
net.au
org.au
br
art.br
com.br
edu.br
gov.br
net.br
org.br
cn
ac.cn
com.cn
edu.cn
gov.cn
net.cn
org.cn
in
ac.in
co.in
edu.in
gov.in
net.in
org.in
kr
ac.kr
co.kr
go.kr
ne.kr
or.kr
za
ac.za
co.za
gov.za
net.za
org.za
nz
ac.nz
co.nz
geek.nz
govt.nz
net.nz
org.nz
school.nz
mx
com.mx
edu.mx
gob.mx
net.mx
org.mx
ar
com.ar
edu.ar
gob.ar
net.ar
org.ar
tr
com.tr
edu.tr
gov.tr
net.tr
org.tr
ru
com.ru
ua
com.ua
edu.ua
gov.ua
net.ua
org.ua
pl
com.pl
edu.pl
gov.pl
net.pl
org.pl
id
ac.id
co.id
go.id
or.id
sch.id
sg
com.sg
edu.sg
gov.sg
net.sg
org.sg
hk
com.hk
edu.hk
gov.hk
net.hk
org.hk
tw
com.tw
edu.tw
gov.tw
net.tw
org.tw
my
com.my
edu.my
gov.my
net.my
org.my
ph
com.ph
edu.ph
gov.ph
net.ph
org.ph
vn
com.vn
edu.vn
gov.vn
net.vn
org.vn
eg
com.eg
edu.eg
gov.eg
net.eg
org.eg
sa
com.sa
edu.sa
gov.sa
net.sa
org.sa
il
ac.il
co.il
gov.il
muni.il
net.il
org.il
de
fr
it
es
nl
be
se
no
fi
dk
ch
at
cz
gr
pt
ie
ca
us
// wildcard + exception (the PSL spec's canonical pair)
ck
*.ck
!www.ck
bd
*.bd
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
githubusercontent.com
gitlab.io
blogspot.com
appspot.com
herokuapp.com
azurewebsites.net
cloudfront.net
netlify.app
vercel.app
web.app
firebaseapp.com
pages.dev
workers.dev
onrender.com
glitch.me
// ===END PRIVATE DOMAINS===
"""

if PSL_RULES is None:
    PSL_RULES = PSL_RULES_FALLBACK


def parse_rules(text: str | None = None):
    """Rule text -> (plain, wildcard_bases, exceptions): frozensets of
    label tuples.  ``wildcard_bases`` holds the labels AFTER the
    ``*.`` (a host suffix of len(base)+1 whose tail equals the base
    matches); ``exceptions`` hold the full rule labels.  Blank lines
    and ``//`` comments skipped, exactly like the published format."""
    if text is None:
        text = PSL_RULES
    plain, wild, exc = set(), set(), set()
    for line in text.splitlines():
        rule = line.strip()
        if not rule or rule.startswith("//"):
            continue
        rule = rule.split()[0]  # the spec: anything after whitespace is ignored
        if rule.startswith("!"):
            exc.add(tuple(rule[1:].lower().split(".")))
        elif rule.startswith("*."):
            wild.add(tuple(rule[2:].lower().split(".")))
        else:
            plain.add(tuple(rule.lower().split(".")))
    return frozenset(plain), frozenset(wild), frozenset(exc)
