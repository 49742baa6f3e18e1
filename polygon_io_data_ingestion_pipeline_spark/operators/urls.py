"""URL normalization and crawl deduplication — the step BEFORE content
dedup in a crawl pipeline.

A crawl refetches the same page under cosmetically different URLs
(tracking parameters, fragments, default ports, trailing slashes, case
in the host).  Normalizing first and deduplicating on the normalized
URL removes the bulk of exact refetches for the cost of one keyed
window — orders of magnitude cheaper than letting every copy reach
shingling/minhash.  Everything here is native Spark expressions
(``try_parse_url`` runs in the JVM and tolerates junk as NULL; the query-parameter filter is a
higher-order ``filter``/``array_join`` over a split — no Python in the
hot path), so the normalization stays inside whole-stage codegen at
any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never change the fetched content (deliberately
#: excludes ``ref`` — widely used as a content-selecting variant key)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid",
)


def url_normalized(url) -> Column:
    """Canonical form of a URL column: scheme+host lowercased, default
    ports (:80 http / :443 https) dropped, fragment dropped, tracking
    query parameters removed (query key order otherwise preserved —
    reordering keys would conflate genuinely different endpoints on
    order-sensitive servers), trailing slash trimmed from non-root
    paths.  NULL and unparseable (host-less) URLs stay NULL so callers
    can quarantine them."""
    col = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    raw_path = F.coalesce(F.try_parse_url(col, F.lit("PATH")), F.lit(""))
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        F.substring(raw_path, 1, F.length(raw_path) - 1),
    ).otherwise(raw_path)
    query = F.try_parse_url(col, F.lit("QUERY"))
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda kv: (F.length(kv) > 0)
        & ~F.lower(F.split(kv, "=")[0]).isin(*TRACKING_PARAMS),
    )
    qtail = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    # drop default ports: host comes back without the port from HOST;
    # parse_url('HOST') already excludes the port, so rebuilding from
    # parts drops ANY explicit port — intentional for http(s) defaults,
    # and non-default ports are preserved via the authority fallback
    port = F.try_parse_url(col, F.lit("AUTHORITY"))
    explicit_port = F.regexp_extract(F.coalesce(port, F.lit("")), r":(\d+)$", 1)
    default_port = (
        (scheme == "http") & (explicit_port == "80")
    ) | ((scheme == "https") & (explicit_port == "443"))
    port_tail = F.when(
        (F.length(explicit_port) > 0) & ~default_port,
        F.concat(F.lit(":"), explicit_port),
    ).otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), host, port_tail, path, qtail)
    return F.when(scheme.isNotNull() & host.isNotNull(), out)


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach (url_norm, url_scheme, url_host, url_domain, url_depth):
    domain = the registrable ("eTLD+1") domain under the committed
    public-suffix-list snapshot (:mod:`..functions.psl` — so
    ``bbc.co.uk`` stays ``bbc.co.uk`` instead of collapsing to
    ``co.uk``), falling back to the host itself when the host IS a
    public suffix / single label / IP literal; depth = number of
    non-empty path segments.  The PSL lookup is a statically-unrolled
    pure expression — no join, no Python."""
    from ..functions.psl import registrable_domain

    col = F.col(url_col)
    host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    domain = F.coalesce(registrable_domain(host), host)
    path = F.coalesce(F.try_parse_url(col, F.lit("PATH")), F.lit(""))
    depth = F.size(F.filter(F.split(path, "/"), lambda s: F.length(s) > 0))
    return (
        df.withColumn("url_norm", url_normalized(col))
        .withColumn("url_scheme", F.lower(F.try_parse_url(col, F.lit("PROTOCOL"))))
        .withColumn("url_host", host)
        .withColumn("url_domain", domain)
        .withColumn("url_depth", depth)
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    order_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per NORMALIZED URL: ties broken by ``order_col``
    ascending (e.g. the crawl date — keep the earliest fetch) with
    ``tiebreak_col`` (default: the raw url column) as the SECONDARY
    key — two refetches sharing one crawl timestamp (same-second
    fetches are routine in real crawls) must resolve the same way on
    every run, or the surviving url/text/doc_id varies with
    partitioning.  Callers whose ``url_col`` is a GROUP key (e.g.
    canonical-URL dedup, where every member shares the same canonical
    target) must pass a ``tiebreak_col`` that actually varies within
    the group, or the secondary key is a no-op.  Rows whose URL fails
    to normalize (NULL) are KEPT as-is — they carry no evidence of
    being refetches.  One hash shuffle on the normalized key; the
    window frame per key is the refetch count, naturally small."""
    from pyspark.sql import Window

    tie = tiebreak_col or url_col
    with_norm = df.withColumn("__norm", url_normalized(F.col(url_col)))
    null_part = with_norm.filter(F.col("__norm").isNull()).drop("__norm")
    order = (
        [F.col(order_col).asc_nulls_last(), F.col(tie).asc()]
        if order_col
        else [F.col(tie).asc()]
    )
    w = Window.partitionBy("__norm").orderBy(*order)
    kept = (
        with_norm.filter(F.col("__norm").isNotNull())
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__norm")
    )
    return kept.unionByName(null_part)


def crawl_frontier(
    outlinks: DataFrame,
    fetched: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    fetched_url_col: str = "url",
    honor_nofollow: bool = True,
    candidates: DataFrame | None = None,
    candidate_col: str = "loc",
) -> DataFrame:
    """Outlink edges + already-fetched URLs -> the fetch FRONTIER:
    one row per normalized not-yet-fetched destination,
    ``(url, in_refs)`` with ``in_refs`` = number of DISTINCT referring
    pages (the standard crawl-priority signal: a page many fetched
    pages point at is worth fetching first).

    Both sides normalize (:func:`url_normalized`) so tracking-param /
    fragment / case variants neither duplicate frontier entries nor
    sneak past the fetched set; ``rel=nofollow`` edges are excluded by
    default (they are explicitly marked "don't endorse/crawl").  The
    representative raw URL per group is the lexicographic minimum —
    deterministic across runs.

    Scale shape: one left-anti hash join on the normalized key (the
    fetched side is typically the smaller — AQE broadcasts it when so)
    plus one partial-agg shuffle for the distinct-referrer count; no
    windows, no Python.

    ``candidates`` adds a referrer-less discovery channel — sitemap
    ``loc`` entries (``operators/robots.py:parse_sitemaps``) union in
    as frontier candidates whose ``in_refs`` counts only real
    referring pages (0 when sitemap-only)."""
    edges = outlinks
    if honor_nofollow and "nofollow" in outlinks.columns:
        edges = edges.filter(~F.coalesce(F.col("nofollow"), F.lit(False)))
    cand = edges.select(
        url_normalized(F.col(dst_col)).alias("_dst_n"),
        F.col(dst_col).alias("_dst_raw"),
        F.col(src_col).alias("_src"),
    ).filter(F.col("_dst_n").isNotNull())
    if candidates is not None:
        cand = cand.unionByName(
            candidates.select(
                url_normalized(F.col(candidate_col)).alias("_dst_n"),
                F.col(candidate_col).alias("_dst_raw"),
                F.lit(None).cast("string").alias("_src"),
            ).filter(F.col("_dst_n").isNotNull())
        )
    seen = fetched.select(
        url_normalized(F.col(fetched_url_col)).alias("_dst_n")
    ).filter(F.col("_dst_n").isNotNull()).distinct()
    return (
        cand.join(seen, "_dst_n", "left_anti")
        .groupBy("_dst_n")
        .agg(
            F.min("_dst_raw").alias("url"),
            F.countDistinct("_src").alias("in_refs"),
        )
        .select("url", "in_refs")
    )


def fetch_schedule(
    frontier: DataFrame,
    rules: DataFrame | None = None,
    politeness: DataFrame | None = None,
    agent: str = "*",
    url_col: str = "url",
    signals: DataFrame | None = None,
    signal_col: str = "rank",
) -> DataFrame:
    """Frontier -> what a compliant crawler may fetch next, and how
    fast: ``(url, in_refs, host, crawl_delay[, priority])`` with
    robots-disallowed URLs dropped (``rules`` from
    ``operators/robots.py:parse_robots``, RFC 9309 longest-match for
    ``agent``) and each host's declared ``Crawl-delay`` attached
    (``politeness`` from ``robots_politeness``; the governing GROUP is
    chosen once — a host where the exact agent has any group, rule or
    politeness, never inherits the ``*`` group's delay; hosts
    declaring none get NULL — the scheduler's default applies).

    ``signals`` (round-11 verdict ask #7) adds FETCH-ORDER priority:
    the webgraph's ``pagerank/`` or ``trust/`` table joined by
    normalized URL (:func:`join_graph_signals`).  An un-fetched
    frontier URL already carries rank in a directed pagerank built
    from the crawl's edges — destination nodes accumulate mass from
    their referrers — so the joined score IS "centrality of the
    referring set", and a fetcher draining by ``priority`` DESC inside
    each host's crawl-delay window fetches high-value pages first.
    Unscored URLs default to 0.0 (unreachable from anything ranked —
    fetch last, not never).

    The closing piece of the crawl loop: pages -> outlinks + sitemaps
    -> :func:`crawl_frontier` -> this schedule -> fetcher.  Scale
    shape: the robots evaluation is one hash join + per-row fold, the
    politeness attach one more small join on host, the priority attach
    one broadcast-able join on the node key — nothing driver-side."""
    out = frontier
    if rules is not None:
        from .robots import robots_allowed

        out = (
            robots_allowed(out, rules, agent=agent, url_col=url_col)
            .filter(F.col("crawl_allowed"))
            .drop("crawl_allowed")
        )
    out = out.withColumn(
        "host", F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    )
    prio: list[str] = []
    if signals is not None:
        out = join_graph_signals(
            out, signals, url_col=url_col, value_cols=(signal_col,)
        ).withColumnRenamed(signal_col, "priority")
        prio = ["priority"]
    if politeness is None:
        return out.withColumn("crawl_delay", F.lit(None).cast("double"))
    agent = agent.lower()
    exact = politeness.filter(F.col("agent") == agent)
    star = politeness.filter(F.col("agent") == "*")
    # group semantics: when the exact agent has ANY group on a host —
    # a rule group counts even if it declares no Crawl-delay — that
    # group governs, so the * group's delay must NOT leak in (the host
    # declared nothing for this agent: NULL, scheduler default)
    exact_hosts = exact.select("host")
    if rules is not None:
        exact_hosts = exact_hosts.unionByName(
            rules.filter(F.col("agent") == agent).select("host")
        )
    effective = (
        exact.unionByName(star.join(exact_hosts.distinct(), "host", "left_anti"))
        if agent != "*"
        else star
    )
    return out.join(
        effective.select("host", "crawl_delay"), "host", "left"
    ).select(url_col, "in_refs", "host", "crawl_delay", *prio)


def anchor_text_index(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    nofollow_col: str | None = "nofollow",
    max_anchors: int = 16,
    normalize: bool = True,
) -> DataFrame:
    """Inbound anchor-text index: for every normalized link destination,
    how many distinct pages point at it and what they CALL it — the
    classic web-search signal (anchor text describes the target better
    than the target describes itself), and in a training-data pipeline
    the source of inbound titles/descriptions attached to documents.

    Returns ``(url, in_refs, anchors)``: distinct referrer count and
    the lexicographically-first ``max_anchors`` distinct non-empty
    whitespace-normalized anchor strings, sorted.  ``nofollow`` edges
    are excluded when the column exists: nofollow is an explicit "no
    endorsement" and its anchors are navigation chrome.

    Scale shape: the anchor list is HARD-BOUNDED before any per-row
    materialization — popular pages accumulate millions of inbound
    anchors, so a collect_set-then-slice would build an arbitrarily
    wide row first.  Instead: distinct (url, anchor) pairs, a
    row_number rank that Spark's WindowGroupLimit pushes into a
    per-map-partition top-``max_anchors``, THEN a collect_list whose
    per-group size is <= ``max_anchors`` by construction.  The
    referrer count is its own partial-agg shuffle on the same key.
    Unparseable destinations quarantine under their raw string key
    rather than conflating."""
    from pyspark.sql import Window

    e = edges
    if nofollow_col is not None and nofollow_col in e.columns:
        e = e.filter(~F.coalesce(F.col(nofollow_col), F.lit(False)))
    anchor = F.regexp_replace(F.trim(F.col(anchor_col)), r"\s+", " ")
    # normalize=False for callers whose dst is ALREADY in the
    # normalized key space (the webgraph CLI) — url_normalized is ~6
    # try_parse_url calls per row, a wasted second pass there
    key = (
        F.coalesce(url_normalized(F.col(dst_col)), F.col(dst_col))
        if normalize
        else F.col(dst_col)
    )
    keyed = e.select(
        key.alias("url"),
        F.col(src_col).alias("_src"),
        anchor.alias("_anchor"),
    )
    refs = keyed.groupBy("url").agg(F.countDistinct("_src").alias("in_refs"))
    w = Window.partitionBy("url").orderBy("_anchor")
    top_anchors = (
        keyed.filter(F.length("_anchor") > 0)
        .select("url", "_anchor")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(max_anchors))
        .groupBy("url")
        .agg(F.array_sort(F.collect_list("_anchor")).alias("anchors"))
    )
    return refs.join(top_anchors, "url", "left").select(
        "url",
        "in_refs",
        F.coalesce(F.col("anchors"), F.array().cast("array<string>")).alias(
            "anchors"
        ),
    )


def fetch_order(
    schedule: DataFrame,
    default_delay: float = 1.0,
    url_col: str = "url",
) -> DataFrame:
    """Turn a schedule (:func:`fetch_schedule` output) into a
    deterministic FETCH ORDER a polite crawler can drain top-to-bottom:
    within each host, URLs rank by ``priority`` DESC (when the schedule
    carries one; ties and priority-less schedules fall back to
    ``in_refs`` DESC, then URL), and each URL's earliest polite fetch
    time is ``eta_s = host_rank * crawl_delay`` (the host's declared
    Crawl-delay, else ``default_delay``) — the k-th page of a host
    cannot start before k delays have elapsed, regardless of fleet
    size.  Output adds ``host_rank`` (0-based within host) and
    ``eta_s``; a fetcher sorting by ``(eta_s, host, url)`` interleaves
    hosts naturally: slow (large-delay) hosts spread out while fast
    hosts drain densely — high-value pages first WITHIN each host's
    politeness envelope, which is exactly the contract the priority
    column exists for.

    Scale shape: ONE window partitioned by host (the same partitioning
    a per-host fetcher shards by), all expressions JVM-native."""
    from pyspark.sql import Window

    order = []
    if "priority" in schedule.columns:
        order.append(F.col("priority").desc())
    if "in_refs" in schedule.columns:
        order.append(F.col("in_refs").desc())
    order.append(F.col(url_col))
    w = Window.partitionBy("host").orderBy(*order)
    return schedule.withColumn(
        "host_rank", F.row_number().over(w) - F.lit(1)
    ).withColumn(
        "eta_s",
        F.col("host_rank")
        * F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
    )


def join_graph_signals(
    docs: DataFrame,
    signals: DataFrame,
    url_col: str = "url",
    node_col: str = "node",
    value_cols: tuple[str, ...] = ("trust",),
    default: float = 0.0,
    normalize: bool = True,
) -> DataFrame:
    """Attach web-graph analytics (the ``webgraph`` CLI's ``trust/`` /
    ``pagerank/`` tables) to documents by URL — the graph->selection
    half of the crawl loop: corpus stages can then drop pages below a
    trust floor or weight sampling by centrality.

    Document URLs normalize into the SAME key space ``cmd_webgraph``
    built its node ids in (crawl spellings vs canonical variants must
    not miss), then ONE left equi-join on the node key.  Documents
    absent from the signal table get ``default`` — under TrustRank
    semantics an unscored page is exactly "unreachable from any vetted
    seed", so a positive ``--min-trust`` floor drops it; documents with
    a NULL ``url_col`` (non-crawl lanes) also carry ``default`` and the
    caller decides whether the floor applies to them.  Broadcast-able
    when the graph is small; AQE picks the strategy otherwise.
    """
    key = (
        F.coalesce(url_normalized(F.col(url_col)), F.col(url_col))
        if normalize
        else F.col(url_col)
    )
    sig = signals.select(
        F.col(node_col).alias("__node"),
        *[F.col(c) for c in value_cols],
    )
    out = docs.withColumn("__node", key).join(sig, "__node", "left").drop("__node")
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    return out


#: feed content types crawls label syndication documents with — the
#: third discovery channel after outlinks and sitemaps
FEED_CONTENT_TYPES = (
    "application/rss+xml",
    "application/atom+xml",
    "application/xml",
    "text/xml",
)


def xml_unescape(c: Column) -> Column:
    """The five predefined XML entities — amp LAST so ``&amp;lt;`` does
    not double-unescape.  Shared by the feed parser here and the
    sitemap parser (``operators/robots.py:parse_sitemaps``), so the two
    XML discovery channels can never diverge on escaping."""
    for pat, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.regexp_replace(c, pat, rep)
    return c


def parse_feeds(
    df: DataFrame, url_col: str = "url", text_col: str = "feed_xml"
) -> DataFrame:
    """(feed URL, feed XML) -> one row per entry:
    ``(feed_url, entry_url, title, published, kind)`` — RSS 2.0
    ``<item>`` and Atom ``<entry>`` blocks, the syndication complement
    of ``operators/robots.py:parse_sitemaps`` (sitemaps enumerate what
    exists; feeds announce what is NEW — the freshness discovery
    channel).  Entry URLs feed ``crawl_frontier(candidates=)`` exactly
    like sitemap locs.

    Both dialects are rigidly flat at the entry level, so the parse is
    pure JVM regexp — one ``regexp_extract_all`` explode per document,
    no XML library, no Python: ``kind`` derives from each block's own
    element name (backreference-matched close tag); the entry link is
    Atom ``<link href>`` (``rel="alternate"`` or unqualified — enclosure
    /self links are chrome) falling back to the RSS ``<link>`` text
    element; titles unwrap one CDATA layer and unescape the predefined
    entities; ``published`` coalesces ``pubDate``/``published``/
    ``updated`` as the raw string (feed date formats are a zoo — the
    caller parses what it needs).  Entries without a resolvable link
    are dropped (nothing to fetch)."""
    block_re = r"(?s)<(item|entry)[\s>].*?</\1\s*>"
    blocks = df.select(
        F.col(url_col).alias("feed_url"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(block_re), F.lit(0))
        ).alias("_block"),
    )

    def _text_value(raw: Column) -> Column:
        # XML-spec text semantics: CDATA content is VERBATIM (a title
        # legitimately containing '&amp;' must survive as-is), while a
        # plain text node entity-unescapes.  Generators that CDATA-wrap
        # every text node are common, so both paths are hot.
        inner = F.regexp_extract(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", 1)
        is_cdata = raw.startswith("<![CDATA[") & raw.endswith("]]>")
        return F.when(is_cdata, F.trim(inner)).otherwise(
            xml_unescape(F.trim(raw))
        )

    def field(name: str) -> Column:
        v = _text_value(
            F.regexp_extract(
                "_block", f"(?s)<{name}[^>]*>\\s*(.*?)\\s*</{name}\\s*>", 1
            )
        )
        return F.when(v == "", F.lit(None)).otherwise(v)

    # single- AND double-quoted attributes are legal XML; enclosure/
    # self links are chrome, alternate or unqualified rel wins
    atom_href = F.regexp_extract(
        "_block",
        "(?s)<link(?![^>]*\\brel=[\"'](?!alternate)[^\"']*[\"'])[^>]*"
        "\\bhref=[\"']([^\"']*)[\"']",
        1,
    )
    # attribute values entity-unescape (CDATA cannot occur there); the
    # RSS text-node link follows the same text semantics as field()
    rss_link = _text_value(
        F.regexp_extract("_block", r"(?s)<link>\s*(.*?)\s*</link>", 1)
    )
    entry_url = F.when(atom_href != "", xml_unescape(atom_href)).otherwise(
        F.when(rss_link != "", rss_link)
    )
    kind = F.when(
        F.col("_block").startswith("<item"), F.lit("rss")
    ).otherwise(F.lit("atom"))
    return (
        blocks.select(
            "feed_url",
            entry_url.alias("entry_url"),
            field("title").alias("title"),
            F.coalesce(
                field("pubDate"), field("published"), field("updated")
            ).alias("published"),
            kind.alias("kind"),
        )
        .filter(F.col("entry_url").isNotNull())
    )
