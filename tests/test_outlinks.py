"""HTML outlink extraction -> web link graph -> crawl frontier:
href resolution against page URL / <base href>, rel=nofollow flags,
non-web schemes dropped, charset-aware decode, frontier ranking by
distinct referrers, pagerank over extracted edges."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
    _extract_links,
    extract_outlinks,
)


def test_resolution_cases():
    html = (
        "<html><body>"
        '<a href="/root-rel">r</a>'
        '<a href="sibling.html">s</a>'
        '<a href="../up/one.html">u</a>'
        '<a href="//cdn.example/x">p</a>'
        '<a href="https://other.example/abs">a</a>'
        '<a href="?page=2">q</a>'
        "</body></html>"
    )
    got = {u for u, _, _ in _extract_links(html, "http://h.example/dir/sub/page.html")}
    assert got == {
        "http://h.example/root-rel",
        "http://h.example/dir/sub/sibling.html",
        "http://h.example/dir/up/one.html",
        "http://cdn.example/x",           # protocol-relative takes page scheme
        "https://other.example/abs",
        "http://h.example/dir/sub/page.html?page=2",
    }


def test_non_web_schemes_and_fragments_drop():
    html = (
        '<a href="mailto:x@example.com">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="tel:+1555">t</a>'
        '<a href="#section">f</a>'
        '<a href="">e</a>'
        '<a href="/keep">k</a>'
    )
    got = [u for u, _, _ in _extract_links(html, "http://h.example/")]
    assert got == ["http://h.example/keep"]


def test_base_href_wins_and_relative_base_resolves():
    html = '<head><base href="/assets/"></head><a href="img.html">x</a>'
    got = [u for u, _, _ in _extract_links(html, "http://h.example/deep/page")]
    assert got == ["http://h.example/assets/img.html"]
    # absolute <base> redirects resolution entirely
    html2 = '<base href="https://cdn.example/b/"><a href="y">x</a>'
    got2 = [u for u, _, _ in _extract_links(html2, "http://h.example/")]
    assert got2 == ["https://cdn.example/b/y"]


def test_nofollow_anchor_text_and_nesting():
    html = (
        '<a href="/a" rel="nofollow noopener">Spam <b>Link</b></a>'
        '<a href="/b">Plain</a>'
        '<a href="/unclosed">tail text'
    )
    links = _extract_links(html, "http://h.example/")
    assert links == [
        ("http://h.example/a", "Spam Link", True),
        ("http://h.example/b", "Plain", False),
        ("http://h.example/unclosed", "tail text", False),
    ]


def test_script_links_skipped_and_malformed_tolerated():
    html = '<script>var a = \'<a href="/fake">x</a>\';</script><a href="/real">r</a><div <<'
    got = [u for u, _, _ in _extract_links(html, "http://h.example/")]
    assert got == ["http://h.example/real"]


def test_extract_outlinks_frame_with_charset(spark):
    page = (
        '<html><body><a href="/next">далее</a>'
        '<a href="http://other.example/x" rel="nofollow">ext</a></body></html>'
    )
    df = spark.createDataFrame(
        [
            ("http://h.example/p1", page.encode("windows-1251"),
             "text/html; charset=windows-1251"),
            ("http://h.example/broken", None, "text/html"),
        ],
        "url string, payload binary, content_type string",
    )
    rows = sorted(
        (r["src"], r["dst"], r["anchor"], r["nofollow"])
        for r in extract_outlinks(df).collect()
    )
    assert rows == [
        ("http://h.example/p1", "http://h.example/next", "далее", False),
        ("http://h.example/p1", "http://other.example/x", "ext", True),
    ]


def _page(links):
    return ("<html><body>" + "".join(f'<a href="{h}">x</a>' for h in links)
            + "</body></html>").encode()


def test_frontier_ranks_by_distinct_referrers(spark):
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        crawl_frontier,
    )

    pages = spark.createDataFrame(
        [
            ("http://h.example/a", _page(["/new1", "/new2", "/b"])),
            ("http://h.example/b", _page(["/new1?utm_source=x", "http://h.example/a"])),
            ("http://h.example/c", _page(["/new1#frag"])),
        ],
        "url string, payload binary",
    )
    edges = extract_outlinks(pages)
    frontier = {
        r["url"]: r["in_refs"]
        for r in crawl_frontier(edges, pages.select("url")).collect()
    }
    # /a and /b are fetched -> not frontier; /new1 referenced by 3
    # distinct pages (tracking-param and fragment variants normalize)
    assert frontier["http://h.example/new1"] == 3
    assert frontier["http://h.example/new2"] == 1
    assert not any(u.endswith(("/a", "/b")) for u in frontier)
    # nofollow edges excluded by default
    nf = spark.createDataFrame(
        [("http://h.example/a", "http://h.example/spam", True)],
        "src string, dst string, nofollow boolean",
    )
    assert crawl_frontier(nf, pages.select("url")).count() == 0
    # frontier plan is pure JVM (anti join + agg, no Python stage)
    plan = (
        crawl_frontier(
            spark.createDataFrame([], "src string, dst string, nofollow boolean"),
            pages.select("url"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_pagerank_over_extracted_web_graph(spark):
    """Hand-checked hub graph: every page links to /hub, /hub links to
    one page — the hub must hold the top rank."""
    from polygon_io_data_ingestion_pipeline_spark.operators.graph import pagerank

    pages = spark.createDataFrame(
        [
            ("http://h.example/hub", _page(["/p1"])),
            ("http://h.example/p1", _page(["/hub"])),
            ("http://h.example/p2", _page(["/hub"])),
            ("http://h.example/p3", _page(["/hub"])),
        ],
        "url string, payload binary",
    )
    edges = extract_outlinks(pages).select("src", "dst").distinct()
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=3, src="src", dst="dst").collect()
    }
    hub = ranks.pop("http://h.example/hub")
    assert hub == max([hub, *ranks.values()])
    assert hub > ranks["http://h.example/p2"]


def test_sitemap_candidates_join_the_frontier(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        crawl_frontier,
    )

    edges = spark.createDataFrame(
        [("http://h.example/a", "http://h.example/new", False)],
        "src string, dst string, nofollow boolean",
    )
    sitemap = spark.createDataFrame(
        [("http://h.example/new#frag",), ("http://h.example/sitemap-only",),
         ("http://h.example/a",)],
        "loc string",
    )
    fetched = spark.createDataFrame([("http://h.example/a",)], "url string")
    got = {
        r["url"]: r["in_refs"]
        for r in crawl_frontier(edges, fetched, candidates=sitemap).collect()
    }
    # sitemap-only URL arrives with 0 referrers; the fragment variant
    # of /new normalizes into the same frontier row (1 real referrer);
    # the already-fetched /a never re-enters
    assert got == {"http://h.example/new": 1, "http://h.example/sitemap-only": 0}


def test_fetch_schedule_closes_the_crawl_loop(spark):
    """pages -> robots(+politeness) -> frontier -> schedule: disallowed
    URLs drop, crawl_delay attaches per host with exact-agent override,
    undeclared hosts get NULL."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_robots,
        robots_politeness,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        fetch_schedule,
    )

    robots = spark.createDataFrame(
        [
            ("slow.example",
             "User-agent: *\nCrawl-delay: 10\nDisallow: /private/\n"
             "User-agent: fastbot\nCrawl-delay: 1\nDisallow: /private/\n"),
        ],
        "host string, robots_txt string",
    )
    frontier = spark.createDataFrame(
        [
            ("http://slow.example/page", 3),
            ("http://slow.example/private/x", 9),
            ("http://quiet.example/page", 1),
        ],
        "url string, in_refs long",
    )
    rules, polite = parse_robots(robots), robots_politeness(robots)
    star = {
        r["url"]: (r["crawl_delay"], r["host"])
        for r in fetch_schedule(frontier, rules, polite).collect()
    }
    assert "http://slow.example/private/x" not in star
    assert star["http://slow.example/page"] == (10.0, "slow.example")
    assert star["http://quiet.example/page"] == (None, "quiet.example")
    fast = {
        r["url"]: r["crawl_delay"]
        for r in fetch_schedule(frontier, rules, polite, agent="fastbot").collect()
    }
    assert fast["http://slow.example/page"] == 1.0  # exact agent overrides *


def test_fetch_schedule_group_semantics_no_star_leak(spark):
    """An agent with its OWN rule group that declares no Crawl-delay
    must get NULL — not inherit the * group's delay (the governing
    group is chosen once; rules and politeness must agree about which
    group that is)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_robots,
        robots_politeness,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        fetch_schedule,
    )

    robots = spark.createDataFrame(
        [("h.example",
          "User-agent: quietbot\nDisallow: /x/\n\n"
          "User-agent: *\nCrawl-delay: 10\nDisallow: /y/\n")],
        "host string, robots_txt string",
    )
    frontier = spark.createDataFrame(
        [("http://h.example/page", 1)], "url string, in_refs long"
    )
    rules, polite = parse_robots(robots), robots_politeness(robots)
    got = fetch_schedule(frontier, rules, polite, agent="quietbot").collect()
    assert got[0]["crawl_delay"] is None  # own group governs: no delay
    star = fetch_schedule(frontier, rules, polite).collect()
    assert star[0]["crawl_delay"] == 10.0
