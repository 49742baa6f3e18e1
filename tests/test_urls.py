"""URL normalization + crawl dedup: tracking params stripped, default
ports and fragments dropped, refetches collapse to the earliest fetch,
unparseable URLs quarantine (kept, never conflated)."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
    url_dedup,
    url_normalized,
    url_parts,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["n"] for r in df.select(url_normalized("url").alias("n")).collect()]


def test_normalization_rules(spark):
    got = _norm(spark, [
        "HTTP://Example.COM:80/a/b/?utm_source=x&q=1#frag",
        "https://example.com:443/a",
        "https://example.com:8443/a",
        "https://example.com/",
        "https://example.com/path/",
        "https://example.com/a?fbclid=z",
        "https://example.com/a?keep=1&UTM_Medium=m&also=2",
        "not a url",
    ])
    assert got == [
        "http://example.com/a/b?q=1",
        "https://example.com/a",
        "https://example.com:8443/a",   # non-default port preserved
        "https://example.com/",         # root slash kept
        "https://example.com/path",     # trailing slash trimmed
        "https://example.com/a",        # tracking-only query dropped
        "https://example.com/a?keep=1&also=2",  # order preserved
        None,                            # unparseable -> NULL
    ]


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("https://News.Sub.Example.co/a/b/c?x=1",)], "url string"
    )
    r = url_parts(df).collect()[0]
    assert r["url_scheme"] == "https"
    assert r["url_host"] == "news.sub.example.co"
    assert r["url_domain"] == "example.co"
    assert r["url_depth"] == 3
    assert r["url_norm"] == "https://news.sub.example.co/a/b/c?x=1"


def test_url_dedup_keeps_earliest_fetch(spark):
    rows = [
        ("https://e.com/a?utm_source=x", "2026-01-02", "late"),
        ("https://E.com/a", "2026-01-01", "early"),
        ("https://e.com/b", "2026-01-03", "other"),
        (None, "2026-01-04", "nullurl"),
        ("::::", "2026-01-05", "badurl"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_date string, tag string")
    got = {r["tag"] for r in url_dedup(df, order_col="warc_date").collect()}
    # the two /a refetches collapse to the EARLIEST; quarantined URLs kept
    assert got == {"early", "other", "nullurl", "badurl"}


def test_url_dedup_group_key_needs_explicit_tiebreak(spark):
    """Canonical-URL dedup partitions on a column that is IDENTICAL for
    every group member, so the default secondary key (the url_col
    itself) cannot break same-timestamp ties — tiebreak_col must carry
    a column that varies within the group, and the survivor must be its
    minimum regardless of input order."""
    rows = [
        ("http://a.com/art?page=2", "http://a.com/art", "2026-08-14T00:00:00Z"),
        ("http://a.com/art?page=1", "http://a.com/art", "2026-08-14T00:00:00Z"),
        ("http://a.com/other", "http://a.com/other", "2026-08-14T00:00:00Z"),
    ]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(
            perm, "url string, _canon string, warc_date string"
        ).repartition(4)
        got = sorted(
            r["url"]
            for r in url_dedup(
                df, url_col="_canon", order_col="warc_date", tiebreak_col="url"
            ).collect()
        )
        assert got == ["http://a.com/art?page=1", "http://a.com/other"]


def test_plan_stays_native(spark):
    """The normalization is whole-stage-codegen material: no Python
    workers (BatchEvalPython/ArrowEvalPython) anywhere in the plan."""
    df = spark.createDataFrame([("https://e.com/a",)], "url string")
    plan = url_parts(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# --- round 8: public-suffix-list registrable domains --------------------------


def test_psl_registrable_domain(spark):
    from polygon_io_data_ingestion_pipeline_spark.functions.psl import (
        registrable_domain,
    )

    cases = [
        ("bbc.co.uk", "bbc.co.uk"),          # 2nd-level registry, not co.uk
        ("www.bbc.co.uk", "bbc.co.uk"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("example.com.au", "example.com.au"),
        ("sub.example.or.jp", "example.or.jp"),
        ("example.com", "example.com"),       # default rule: TLD + 1
        ("a.b.example.com", "example.com"),
        ("user.github.io", "user.github.io"),  # private-section platform
        ("deep.user.github.io", "user.github.io"),
        ("x.foo.ck", "x.foo.ck"),             # *.ck wildcard: foo.ck is a PS
        ("www.ck", "www.ck"),                 # !www.ck exception
        ("city.kobe.jp", "city.kobe.jp"),     # !city.kobe.jp exception
        ("foo.city.kobe.jp", "city.kobe.jp"),
        ("a.b.kobe.jp", "a.b.kobe.jp"),       # *.kobe.jp wildcard
        ("co.uk", None),                      # host IS a public suffix
        ("localhost", None),                  # single label
        ("192.168.0.1", None),                # IP literal
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["d"] for r in df.select(registrable_domain("host").alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_url_parts_uses_psl_not_two_label_proxy(spark):
    df = spark.createDataFrame(
        [("https://www.bbc.co.uk/news/uk",),
         ("https://guardian.co.uk/sport",),
         ("https://co.uk/",)],
        "url string",
    )
    got = [r["url_domain"] for r in url_parts(df).collect()]
    # bbc.co.uk and guardian.co.uk are DIFFERENT domains; a bare public
    # suffix falls back to the host itself
    assert got == ["bbc.co.uk", "guardian.co.uk", "co.uk"]


# --- round 9 (second session): inbound anchor-text index ---------------------


def test_anchor_text_index_semantics(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        anchor_text_index,
    )

    rows = [
        ("http://a.example/1", "http://T.example/page?utm_source=x", "  Good   Page ", False),
        ("http://a.example/2", "http://t.example/page", "good page", False),
        ("http://a.example/3", "http://t.example/page", "Good Page", False),
        ("http://a.example/4", "http://t.example/page", "nav chrome", True),  # nofollow
        ("http://a.example/5", "http://t.example/page", "", False),           # empty anchor
        ("http://a.example/1", "http://t.example/page", "another name", False),
        ("http://a.example/6", "::::", "raw key kept", False),                # unparseable dst
    ]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string, nofollow boolean")
    got = {r["url"]: r for r in anchor_text_index(df, max_anchors=2).collect()}
    page = got["http://t.example/page"]
    # normalization folds host case + tracking params into one key;
    # 1,2,3,5 and the second edge from 1 -> 5 distinct referrers... but
    # nofollow row 4 is excluded: referrers {1,2,3,5,1} -> 4 distinct
    assert page["in_refs"] == 4
    # distinct whitespace-normalized anchors sorted: "Good Page",
    # "another name", "good page" -> capped at 2, lexicographic order
    # (uppercase sorts before lowercase)
    assert list(page["anchors"]) == ["Good Page", "another name"]
    assert got["::::"]["in_refs"] == 1  # quarantined under raw key


def test_anchor_text_index_plan_bounded(spark):
    """The anchor cap must appear as WindowGroupLimit (map-side top-k),
    and the plan stays JVM-side."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        anchor_text_index,
    )

    df = spark.createDataFrame(
        [("s", "http://t.example/p", "a", False)],
        "src string, dst string, anchor string, nofollow boolean",
    )
    plan = (
        anchor_text_index(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_parse_feeds_rss_and_atom(spark):
    """RSS <item> and Atom <entry> entries: CDATA titles unwrap, XML
    entities unescape, Atom alternate links beat self/enclosure links,
    RSS link text trims, published coalesces pubDate/published/updated,
    entries without a link drop."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        parse_feeds,
    )

    rss = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<title>Blog</title><link>http://b.example/</link>"
        "<item><title><![CDATA[Post &amp; one]]></title>"
        "<link>http://b.example/p1</link>"
        "<pubDate>Mon, 10 Aug 2026 00:00:00 GMT</pubDate></item>"
        "<item><title>two</title><link> http://b.example/p2 </link></item>"
        "<item><title>no link</title></item>"
        "</channel></rss>"
    )
    atom = (
        '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        '<title>site</title><link href="http://a.example/"/>'
        "<entry><title>alpha</title>"
        '<link rel="self" href="http://a.example/self.xml"/>'
        '<link rel="alternate" href="http://a.example/e1"/>'
        "<updated>2026-08-11T00:00:00Z</updated></entry>"
        "<entry><title>beta</title>"
        '<link href="http://a.example/e2"/>'
        "<published>2026-08-12T00:00:00Z</published></entry>"
        "</feed>"
    )
    df = spark.createDataFrame(
        [("http://b.example/feed", rss), ("http://a.example/atom", atom)],
        "url string, feed_xml string",
    )
    rows = {r["entry_url"]: r for r in parse_feeds(df).collect()}
    assert set(rows) == {
        "http://b.example/p1", "http://b.example/p2",
        "http://a.example/e1", "http://a.example/e2",
    }
    # CDATA content is VERBATIM per the XML spec: the '&amp;' inside
    # the CDATA title must NOT unescape
    assert rows["http://b.example/p1"]["title"] == "Post &amp; one"
    assert rows["http://b.example/p1"]["kind"] == "rss"
    assert rows["http://b.example/p1"]["published"].startswith("Mon, 10 Aug")
    assert rows["http://b.example/p2"]["published"] is None
    assert rows["http://a.example/e1"]["kind"] == "atom"
    assert rows["http://a.example/e1"]["published"] == "2026-08-11T00:00:00Z"
    assert rows["http://a.example/e2"]["published"] == "2026-08-12T00:00:00Z"


def test_parse_feeds_entries_join_the_frontier(spark):
    """Feed entries are frontier candidates exactly like sitemap locs:
    referrer-less (in_refs 0), deduped against the fetched set."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        crawl_frontier,
        parse_feeds,
    )

    rss = (
        "<rss><channel>"
        "<item><link>http://s.example/new</link></item>"
        "<item><link>http://s.example/old</link></item>"
        "</channel></rss>"
    )
    feeds = spark.createDataFrame(
        [("http://s.example/feed", rss)], "url string, feed_xml string"
    )
    entries = parse_feeds(feeds).selectExpr("entry_url AS loc")
    edges = spark.createDataFrame([], "src string, dst string")
    fetched = spark.createDataFrame([("http://s.example/old",)], ["url"])
    front = {
        r["url"]: r["in_refs"]
        for r in crawl_frontier(edges, fetched, candidates=entries).collect()
    }
    assert front == {"http://s.example/new": 0}


def test_parse_feeds_cdata_links_and_single_quotes(spark):
    """Regression: generators that CDATA-wrap the RSS <link> and Atom
    documents with single-quoted attributes are legal — both entries
    must survive, not silently drop from discovery."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        parse_feeds,
    )

    rss = (
        "<rss><channel><item><title>c</title>"
        "<link><![CDATA[http://b.example/cdata]]></link></item>"
        "</channel></rss>"
    )
    atom = (
        "<feed><entry><title>q</title>"
        "<link rel='self' href='http://a.example/self.xml'/>"
        "<link rel='alternate' href='http://a.example/sq'/>"
        "</entry></feed>"
    )
    df = spark.createDataFrame(
        [("f1", rss), ("f2", atom)], "url string, feed_xml string"
    )
    got = {r["entry_url"] for r in parse_feeds(df).collect()}
    assert got == {"http://b.example/cdata", "http://a.example/sq"}


def test_parse_feeds_cdata_verbatim_vs_plain_unescape(spark):
    """XML-spec text semantics: a CDATA title keeps '&amp;' literally;
    a plain text title unescapes it."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        parse_feeds,
    )

    rss = (
        "<rss><channel>"
        "<item><title><![CDATA[AT&amp;T <3]]></title>"
        "<link>http://b.example/cd</link></item>"
        "<item><title>AT&amp;T plain</title>"
        "<link>http://b.example/pl</link></item>"
        "</channel></rss>"
    )
    df = spark.createDataFrame([("f", rss)], "url string, feed_xml string")
    rows = {r["entry_url"]: r["title"] for r in parse_feeds(df).collect()}
    assert rows["http://b.example/cd"] == "AT&amp;T <3"
    assert rows["http://b.example/pl"] == "AT&T plain"


def test_fetch_schedule_priority_from_graph_signals(spark):
    """fetch_schedule(signals=): the webgraph's rank joins onto the
    frontier by NORMALIZED url as a fetch-order priority — high-value
    pages first within politeness constraints; unscored URLs default
    to 0.0 (unreachable from anything ranked: fetch last, not never)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        fetch_schedule,
    )

    frontier = spark.createDataFrame(
        [
            ("http://a.example/hot", 3),
            # crawl spelling with tracking params: must still match the
            # graph's normalized node key
            ("http://a.example/warm?utm_source=x", 2),
            ("http://b.example/unknown", 1),
        ],
        "url string, in_refs long",
    )
    signals = spark.createDataFrame(
        [
            ("http://a.example/hot", 0.9),
            ("http://a.example/warm", 0.4),
        ],
        "node string, rank double",
    )
    from pyspark.sql import functions as F

    rows = fetch_schedule(frontier, signals=signals).orderBy(
        F.desc("priority")
    ).collect()
    assert [r["url"] for r in rows] == [
        "http://a.example/hot",
        "http://a.example/warm?utm_source=x",
        "http://b.example/unknown",
    ]
    assert [r["priority"] for r in rows] == [0.9, 0.4, 0.0]
    assert rows[0]["host"] == "a.example"
    # without signals the column is absent — existing schedules' schema
    # is unchanged
    assert "priority" not in fetch_schedule(frontier).columns


def test_fetch_order_politeness_envelope(spark):
    """fetch_order: within a host, priority DESC decides rank; eta_s =
    host_rank * the host's crawl delay (default when undeclared), so a
    fetcher draining by eta interleaves slow hosts while fast hosts
    drain densely — and the k-th page of a host never starts before k
    delays elapsed."""
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        fetch_order,
    )

    sched = spark.createDataFrame(
        [
            ("http://slow.example/a", 1, "slow.example", 10.0, 0.9),
            ("http://slow.example/b", 5, "slow.example", 10.0, 0.1),
            ("http://fast.example/x", 2, "fast.example", None, 0.5),
            ("http://fast.example/y", 9, "fast.example", None, 0.5),
        ],
        "url string, in_refs long, host string, crawl_delay double, "
        "priority double",
    )
    rows = {
        r["url"]: (r["host_rank"], r["eta_s"])
        for r in fetch_order(sched, default_delay=2.0).collect()
    }
    # slow host: priority 0.9 first at eta 0, 0.1 second at eta 10
    assert rows["http://slow.example/a"] == (0, 0.0)
    assert rows["http://slow.example/b"] == (1, 10.0)
    # fast host (no declared delay): tie on priority -> in_refs DESC
    assert rows["http://fast.example/y"] == (0, 0.0)
    assert rows["http://fast.example/x"] == (1, 2.0)

    # priority-less schedules (fetch_schedule without signals) still
    # order deterministically by in_refs
    plain = fetch_order(sched.drop("priority"))
    got = {r["url"]: r["host_rank"] for r in plain.collect()}
    assert got["http://slow.example/b"] == 0  # in_refs 5 beats 1
