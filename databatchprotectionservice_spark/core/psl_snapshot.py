"""Embedded Public Suffix List snapshot — curated subset, dated.

The PSL (publicsuffix.org, Mozilla-maintained, MPL-2.0 public data) is
the registry crawl pipelines use to group URLs by *site*: the
registrable domain (eTLD+1) is one label below the longest matching
public suffix.  ``core/urlcodec.registrable_domain`` implements the
full published ALGORITHM — longest-match over plain, wildcard (``*.``)
and exception (``!``) rules, with the implicit ``*`` default for
unlisted TLDs — over the snapshot below.

The snapshot is a CURATED SUBSET (the full published file is ~10k
rules and mutates weekly; this container has no network): the complete
second-level structures for the highest-crawl-volume ccTLDs, the
canonical wildcard/exception pair (``*.ck`` / ``!www.ck``), and the
private-section platform suffixes that dominate web-corpus site
grouping (github.io, blogspot.com, ...).  The format is the published
file's own (one rule per line, ``//`` comments), so swapping in the
complete dated snapshot in production is a data-file replacement, not
a code change.  Rules here are ASCII/punycode form; lookups convert
IDN hosts first.

Snapshot curated: 2026-08-16 (round 10).  Seam note: a production
deployment should vendor the complete dated file; the subset is the
documented approximation boundary (SURVEY.md).
"""

PSL_SNAPSHOT_DATE = "2026-08-16"

PSL_RULES = """
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


def parse_rules(text: str = PSL_RULES):
    """Rule text -> (plain, wildcard_bases, exceptions): frozensets of
    label tuples.  ``wildcard_bases`` holds the labels AFTER the
    ``*.`` (a host suffix of len(base)+1 whose tail equals the base
    matches); ``exceptions`` hold the full rule labels.  Blank lines
    and ``//`` comments skipped, exactly like the published format."""
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
