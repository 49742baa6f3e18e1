"""Registrable-domain lookup over a committed Public Suffix List snapshot.

The two-label proxy (last two host labels) collapses every ``.co.uk`` /
``.com.au`` / ``.or.jp`` site into one "domain" — ``bbc.co.uk`` became
``co.uk`` — which corrupts per-domain crawl statistics and any
domain-keyed dedup or rate control.  The fix is the same one browsers
use: the Public Suffix List (publicsuffix.org, public data), applied
longest-match-first.

``PSL_SNAPSHOT`` below is a committed SUBSET snapshot in the PSL's own
file format (``//`` comments, ``*.`` wildcard rules, ``!`` exception
rules), covering the second-level country registries and hosting
platforms a crawl actually hits; swap in the full upstream file verbatim
to widen coverage — the parser and the expression builder handle the
complete rule grammar, and the expression strategy is PROVEN at full
upstream scale (~9,500 rules) by ``tests/test_psl_full_scale.py``,
with :func:`registrable_domain_join` as the constant-plan-size
broadcast-join alternative for even larger (org-private) lists:

1. a rule matches a host when the host's trailing labels equal the rule
   (a ``*`` consumes exactly one extra label);
2. the prevailing rule is the matching rule with the most labels, and
   exception rules beat everything;
3. the public suffix is the prevailing rule (for an exception rule:
   minus its leftmost label); the registrable domain is the public
   suffix plus one more label.

Scale shape: the lookup compiles to a PURE Spark expression — a static
unrolled chain (suffix candidates are bounded by the deepest rule, not
by data) of ``array_contains`` probes against per-length literal
arrays, so it rides whole-stage codegen with zero Python, zero joins,
zero shuffles.  Bucketing rules by label count keeps each probe's
array small (a candidate of k labels only scans the k-label rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Subset snapshot of publicsuffix.org/list/public_suffix_list.dat
# (public data, Mozilla-maintained).  ICANN section: multi-label
# registry suffixes (single-label TLDs need no entry — the PSL default
# rule "*" already makes every TLD a public suffix).  PRIVATE section:
# the large shared-hosting platforms.
PSL_SNAPSHOT = """
// ===BEGIN ICANN DOMAINS===
// uk
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
// au
asn.au
com.au
edu.au
gov.au
id.au
net.au
org.au
// nz
ac.nz
co.nz
geek.nz
gen.nz
govt.nz
health.nz
iwi.nz
maori.nz
mil.nz
net.nz
org.nz
school.nz
// jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// br
art.br
com.br
edu.br
gov.br
mil.br
net.br
org.br
// in
ac.in
co.in
edu.in
firm.in
gen.in
gov.in
ind.in
mil.in
net.in
nic.in
org.in
res.in
// cn
ac.cn
com.cn
edu.cn
gov.cn
mil.cn
net.cn
org.cn
// kr
ac.kr
co.kr
es.kr
go.kr
hs.kr
kg.kr
mil.kr
ms.kr
ne.kr
or.kr
pe.kr
re.kr
sc.kr
// za
ac.za
co.za
edu.za
gov.za
net.za
org.za
web.za
// mx
com.mx
edu.mx
gob.mx
net.mx
org.mx
// ar
com.ar
edu.ar
gob.ar
int.ar
mil.ar
net.ar
org.ar
tur.ar
// tr
av.tr
bel.tr
com.tr
edu.tr
gen.tr
gov.tr
k12.tr
mil.tr
net.tr
org.tr
web.tr
// il
ac.il
co.il
gov.il
k12.il
muni.il
net.il
org.il
// pl
com.pl
edu.pl
gov.pl
net.pl
org.pl
// ua
com.ua
edu.ua
gov.ua
in.ua
net.ua
org.ua
// th
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// id
ac.id
biz.id
co.id
go.id
mil.id
my.id
net.id
or.id
sch.id
web.id
// tw
club.tw
com.tw
edu.tw
game.tw
gov.tw
idv.tw
mil.tw
net.tw
org.tw
// hk
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// sg
com.sg
edu.sg
gov.sg
net.sg
org.sg
per.sg
// my
com.my
edu.my
gov.my
mil.my
name.my
net.my
org.my
// ph
com.ph
edu.ph
gov.ph
i.ph
mil.ph
net.ph
ngo.ph
org.ph
// vn
ac.vn
biz.vn
com.vn
edu.vn
gov.vn
health.vn
info.vn
int.vn
name.vn
net.vn
org.vn
pro.vn
// eg
com.eg
edu.eg
eun.eg
gov.eg
mil.eg
name.eg
net.eg
org.eg
sci.eg
// sa
com.sa
edu.sa
gov.sa
med.sa
net.sa
org.sa
pub.sa
sch.sa
// ae
ac.ae
co.ae
gov.ae
mil.ae
net.ae
org.ae
sch.ae
// ke
ac.ke
co.ke
go.ke
info.ke
me.ke
mobi.ke
ne.ke
or.ke
sc.ke
// ng
com.ng
edu.ng
gov.ng
i.ng
mil.ng
mobi.ng
name.ng
net.ng
org.ng
sch.ng
// ca (provinces + federal)
ab.ca
bc.ca
gc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
// at
ac.at
co.at
gv.at
or.at
priv.at
// fr
asso.fr
com.fr
gouv.fr
nom.fr
prd.fr
tm.fr
// es
com.es
edu.es
gob.es
nom.es
org.es
// pt
com.pt
edu.pt
gov.pt
int.pt
net.pt
org.pt
publ.pt
// gr
com.gr
edu.gr
gov.gr
net.gr
org.gr
// it
edu.it
gov.it
// ro
arts.ro
com.ro
firm.ro
info.ro
nom.ro
nt.ro
org.ro
rec.ro
store.ro
tm.ro
www.ro
// hu
co.hu
info.hu
org.hu
priv.hu
// se
com.se
org.se
pp.se
// wildcard-only registries
*.bd
*.ck
!www.ck
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
gitlab.io
blogspot.com
wordpress.com
appspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
azurewebsites.net
cloudfront.net
s3.amazonaws.com
readthedocs.io
neocities.org
pages.dev
workers.dev
glitch.me
onrender.com
surge.sh
repl.co
tumblr.com
weebly.com
wixsite.com
// ===END PRIVATE DOMAINS===
"""


def parse_psl(text: str) -> tuple[dict[int, list[str]], dict[int, list[str]], dict[int, list[str]]]:
    """PSL file text -> (exact, wildcard, exception) rule buckets, each
    keyed by label count.  Wildcard rules are stored as their BASE (the
    part after ``*.``); a base of k labels matches a public suffix of
    k+1 labels.  Single-label exact rules are dropped: the PSL default
    rule already makes every TLD a 1-label public suffix."""
    exact: dict[int, list[str]] = {}
    wildcard: dict[int, list[str]] = {}
    exception: dict[int, list[str]] = {}
    for line in text.splitlines():
        rule = line.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            name = rule[1:]
            exception.setdefault(name.count(".") + 1, []).append(name)
        elif rule.startswith("*."):
            base = rule[2:]
            wildcard.setdefault(base.count(".") + 1, []).append(base)
        else:
            n = rule.count(".") + 1
            if n >= 2:
                exact.setdefault(n, []).append(rule)
    return exact, wildcard, exception


_EXACT, _WILDCARD, _EXCEPTION = parse_psl(PSL_SNAPSHOT)

_IPV4 = r"^\d{1,3}(\.\d{1,3}){3}$"


def _max_ps_labels(rules) -> int:
    """Deepest suffix any rule can produce: bounds the unrolled probe
    chain / candidate explode."""
    exact, wildcard, exception = rules
    return max(
        [*(exact or {0: []}), *[k + 1 for k in wildcard], *[k - 1 for k in exception], 1]
    )


#: snapshot depth (the helper applied to the snapshot — a hand-copied
#: formula here would silently diverge on edits)
_MAX_PS_LABELS = _max_ps_labels((_EXACT, _WILDCARD, _EXCEPTION))


def public_suffix_labels(host, rules=None) -> Column:
    """Label count of the host's public suffix under the snapshot —
    the longest matching rule (exceptions win, then wildcards count one
    extra label, default ``*`` = 1).  Pure expression, statically
    unrolled to the snapshot's deepest rule.

    ``rules`` (a :func:`parse_psl` triple) swaps in another rule set —
    e.g. the full upstream list; the expression strategy is proven to
    full-PSL scale by ``tests/test_psl_full_scale.py``, and
    :func:`registrable_domain_join` is the broadcast-join alternative
    for rule sets beyond even that."""
    exact, wildcard, exception = rules if rules is not None else (
        _EXACT, _WILDCARD, _EXCEPTION
    )
    max_ps = _max_ps_labels((exact, wildcard, exception))
    col = F.lower(host if isinstance(host, Column) else F.col(host))
    labels = F.split(col, r"\.")
    n = F.size(labels)

    def suffix(i: int) -> Column:
        # start clamped to 1: the n>=i guards make the result unused for
        # short hosts, but conjunct reordering can still evaluate the
        # slice, and slice(start=0) raises
        return F.concat_ws(".", F.slice(labels, F.greatest(n - F.lit(i - 1), F.lit(1)), i))

    candidates: list[Column] = [F.lit(1)]
    for i in range(1, max_ps + 1):
        if i in exact:
            candidates.append(
                F.when(
                    (n >= i) & F.array_contains(F.lit(exact[i]), suffix(i)),
                    F.lit(i),
                ).otherwise(0)
            )
        if i in wildcard:
            candidates.append(
                F.when(
                    (n > i) & F.array_contains(F.lit(wildcard[i]), suffix(i)),
                    F.lit(i + 1),
                ).otherwise(0)
            )
    best = F.greatest(*candidates) if len(candidates) > 1 else candidates[0]
    exc_hits = [
        F.when(
            (n >= i) & F.array_contains(F.lit(exception[i]), suffix(i)),
            F.lit(i - 1),
        ).otherwise(0)
        for i in sorted(exception)
    ]
    if exc_hits:
        exc = F.greatest(*exc_hits) if len(exc_hits) > 1 else exc_hits[0]
        return F.when(exc > 0, exc).otherwise(best)
    return best


def registrable_domain(host, rules=None) -> Column:
    """The host's registrable ("eTLD+1") domain under the committed PSL
    snapshot: ``bbc.co.uk`` -> ``bbc.co.uk``, ``a.b.github.io`` ->
    ``b.github.io``, ``city.kobe.jp`` -> ``city.kobe.jp`` (exception
    rule).  NULL when the host IS a public suffix (``co.uk``), is a
    single label (``localhost``), is an IPv4 literal, or is NULL —
    callers choose their own fallback (``F.coalesce(..., host)``)."""
    col = F.lower(host if isinstance(host, Column) else F.col(host))
    labels = F.split(col, r"\.")
    n = F.size(labels)
    ps = public_suffix_labels(col, rules=rules)
    # start clamped for the same reason as suffix(): unused when n<=ps
    reg = F.concat_ws(".", F.slice(labels, F.greatest(n - ps, F.lit(1)), ps + 1))
    return F.when(
        col.isNotNull() & ~col.rlike(_IPV4) & (n > ps), reg
    )


def registrable_domain_join(
    df, host_col: str = "host", rules=None, out_col: str = "url_domain"
):
    """DataFrame-level registrable-domain lookup via a BROADCAST rule
    join — the above-expression-scale strategy: where the unrolled
    expression carries every rule as array literals in the plan, this
    keeps the rules in a (tiny) broadcast table, so plan size stays
    constant no matter how large the list grows (full upstream PSL,
    org-private suffix lists, ...).

    Shape: DISTINCT hosts explode to their <= max-depth trailing-label
    candidates (bounded by the deepest rule, not by data), one
    broadcast hash join on the candidate string, one partial-agg max
    per host, then a hash join back onto ``df`` (row multiplicity
    preserved).  Same semantics as :func:`registrable_domain`
    (exceptions beat wildcards, longest wins, default ``*`` = 1; NULL
    for public-suffix-only / single-label / IPv4 / NULL hosts),
    equality-tested against the expression path in
    ``tests/test_psl_full_scale.py``."""
    exact, wildcard, exception = rules if rules is not None else (
        _EXACT, _WILDCARD, _EXCEPTION
    )
    max_ps = _max_ps_labels((exact, wildcard, exception))
    spark = df.sparkSession
    rows = (
        [(n_, i, False) for i, names in exact.items() for n_ in names]
        + [(n_, i + 1, False) for i, names in wildcard.items() for n_ in names]
        + [(n_, i - 1, True) for i, names in exception.items() for n_ in names]
    )
    rtable = spark.createDataFrame(rows, "_sfx string, _ps int, _exc boolean")

    hosts = df.select(F.col(host_col).alias("_h")).distinct()
    col = F.lower(F.col("_h"))
    labels = F.split(col, r"\.")
    n = F.size(labels)
    cands = F.array_compact(
        F.array(
            *[
                F.when(
                    n >= F.lit(i),
                    F.concat_ws(
                        ".",
                        F.slice(labels, F.greatest(n - F.lit(i - 1), F.lit(1)), i),
                    ),
                )
                for i in range(1, max_ps + 1)
            ]
        )
    )
    keyed = hosts.select("_h", F.explode_outer(cands).alias("_cand"))
    hits = keyed.join(F.broadcast(rtable), keyed["_cand"] == rtable["_sfx"], "left")
    # a candidate of length i can only have matched a host with >= i
    # trailing labels, so exact (_ps = i) and exception (_ps = i - 1)
    # hits are always valid; a WILDCARD hit (_ps = base + 1) needs one
    # label beyond its base — exactly n >= _ps, which covers all three
    n2 = F.size(F.split(F.lower(F.col("_h")), r"\."))
    ps_valid = F.when(F.col("_ps").isNotNull() & (n2 >= F.col("_ps")), F.col("_ps"))
    agg = hits.groupBy("_h").agg(
        F.max(F.when(F.col("_exc"), ps_valid)).alias("_eps"),
        F.max(
            F.when(~F.coalesce(F.col("_exc"), F.lit(False)), ps_valid)
        ).alias("_rps"),
    )
    ps = F.coalesce(F.col("_eps"), F.greatest(F.col("_rps"), F.lit(1)), F.lit(1))
    labels3 = F.split(F.lower(F.col("_h")), r"\.")
    n3 = F.size(labels3)
    reg = F.concat_ws(".", F.slice(labels3, F.greatest(n3 - ps, F.lit(1)), ps + 1))
    domains = agg.select(
        "_h",
        F.when(
            F.col("_h").isNotNull() & ~F.lower(F.col("_h")).rlike(_IPV4) & (n3 > ps),
            reg,
        ).alias(out_col),
    )
    return df.join(
        domains.withColumnRenamed("_h", host_col), host_col, "left"
    )
