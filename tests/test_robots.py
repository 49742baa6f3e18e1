"""robots.txt parsing + RFC 9309 longest-match evaluation, distributed:
user-agent groups, wildcards, $ anchors, allow-beats-disallow ties,
exact-agent group overriding *, empty Disallow, comments, default-allow."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
    parse_robots,
    robots_allowed,
)

ROBOTS_A = """
# site chrome
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /*.pdf$
Disallow: /search*q=

User-agent: special-bot
User-agent: other-bot
Disallow: /only-special/
"""

ROBOTS_B = """
User-agent: *
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return parse_robots(df)


def test_parse_groups_and_patterns(spark):
    rules = {(r["host"], r["agent"], r["directive"], r["path"]) for r in _rules(spark).collect()}
    assert ("a.example", "*", "disallow", "/private/") in rules
    assert ("a.example", "*", "allow", "/private/press/") in rules
    # both agents of the second block share its rule
    assert ("a.example", "special-bot", "disallow", "/only-special/") in rules
    assert ("a.example", "other-bot", "disallow", "/only-special/") in rules
    # empty Disallow (allow-all idiom) emits no rule
    assert not any(h == "b.example" for h, *_ in rules)


def test_longest_match_allow_ties_and_anchors(spark):
    urls = spark.createDataFrame(
        [
            ("http://a.example/public/page",),        # no rule -> allowed
            ("http://a.example/private/file",),       # disallowed prefix
            ("http://a.example/private/press/x",),    # longer Allow wins
            ("http://a.example/docs/file.pdf",),      # $-anchored wildcard
            ("http://a.example/docs/file.pdf.html",), # anchor does NOT match
            ("http://a.example/search/deep?q=x",),    # wildcard spans into query
            ("http://b.example/anything",),           # allow-all host
            ("http://c.example/whatever",),           # no robots at all
        ],
        "url string",
    )
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_allowed(urls, _rules(spark)).collect()
    }
    assert got["http://a.example/public/page"] is True
    assert got["http://a.example/private/file"] is False
    assert got["http://a.example/private/press/x"] is True
    assert got["http://a.example/docs/file.pdf"] is False
    assert got["http://a.example/docs/file.pdf.html"] is True
    assert got["http://a.example/search/deep?q=x"] is False  # query matched
    assert got["http://b.example/anything"] is True
    assert got["http://c.example/whatever"] is True


def test_exact_agent_group_overrides_star(spark):
    urls = spark.createDataFrame(
        [
            ("http://a.example/private/file",),   # * disallows, but the
            ("http://a.example/only-special/x",), # special group replaces *
        ],
        "url string",
    )
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_allowed(urls, _rules(spark), agent="special-bot").collect()
    }
    # special-bot's own group has no /private/ rule -> allowed
    assert got["http://a.example/private/file"] is True
    assert got["http://a.example/only-special/x"] is False


def test_plan_stays_native(spark):
    urls = spark.createDataFrame([("http://a.example/x",)], "url string")
    plan = (
        robots_allowed(urls, _rules(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.example/page?a=1&amp;b=2</loc>
    <lastmod>2026-08-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>http://a.example/bare</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://b.example/sitemap-1.xml</loc><lastmod>2026-07-01</lastmod></sitemap>
  <sitemap><loc>http://b.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def test_parse_sitemaps_urlset_and_index(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_sitemaps,
    )

    df = spark.createDataFrame(
        [("a.example", SITEMAP), ("b.example", SITEMAP_INDEX)],
        "host string, sitemap_xml string",
    )
    rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
    full = rows["http://a.example/page?a=1&b=2"]  # entities unescaped
    assert full["lastmod"] == "2026-08-01"
    assert full["changefreq"] == "daily" and full["priority"] == 0.8
    assert full["is_index"] is False
    bare = rows["http://a.example/bare"]
    assert bare["lastmod"] is None and bare["priority"] is None
    # loc-less entry dropped; index children flagged for recursion
    assert len(rows) == 4
    assert rows["http://b.example/sitemap-1.xml"]["is_index"] is True
    assert rows["http://b.example/sitemap-2.xml"]["lastmod"] is None


def test_sitemap_plan_stays_native(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_sitemaps,
    )

    df = spark.createDataFrame([("a", SITEMAP)], "host string, sitemap_xml string")
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_compiled_rule_regex_any_column_name(spark):
    """The regex compiler builds from the PASSED Column — a frame whose
    pattern column is not literally named 'path' must compile the same
    anchored regex (regression: F.expr once hardcoded 'path')."""
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        _compiled_rule_regex,
    )

    df = spark.createDataFrame([("/docs/*.pdf$",), ("/plain/",)], "pat string")
    got = {
        r["pat"]: r["rx"]
        for r in df.select("pat", _compiled_rule_regex(F.col("pat")).alias("rx")).collect()
    }
    assert got["/docs/*.pdf$"] == r"^/docs/.*\.pdf$"
    assert got["/plain/"] == "^/plain/"


ROBOTS_POLITE = """
User-agent: fast-bot
Crawl-delay: 2.5
User-agent: slow-bot
Crawl-delay: 10
Request-rate: 1/5
Disallow: /heavy/
Sitemap: http://p.example/sitemap.xml
Sitemap: http://p.example/news.xml

User-agent: *
Crawl-delay: not-a-number
"""


def test_crawl_delay_terminates_agent_list(spark):
    """RFC 9309: group members are CONSECUTIVE User-agent lines — a
    Crawl-delay between two User-agent lines ends the first group, so
    slow-bot's Disallow must NOT apply to fast-bot."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_robots,
    )

    df = spark.createDataFrame(
        [("p.example", ROBOTS_POLITE)], "host string, robots_txt string"
    )
    rules = {(r["agent"], r["directive"], r["path"]) for r in parse_robots(df).collect()}
    assert ("slow-bot", "disallow", "/heavy/") in rules
    assert not any(a == "fast-bot" for a, *_ in rules)


def test_robots_politeness_columns(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        robots_politeness,
    )

    df = spark.createDataFrame(
        [("p.example", ROBOTS_POLITE)], "host string, robots_txt string"
    )
    got = {r["agent"]: r for r in robots_politeness(df).collect()}
    assert got["fast-bot"]["crawl_delay"] == 2.5
    assert got["fast-bot"]["request_rate"] is None
    assert got["slow-bot"]["crawl_delay"] == 10.0
    assert got["slow-bot"]["request_rate"] == "1/5"
    # non-numeric delay nulls out instead of raising (try_cast)
    assert got["*"]["crawl_delay"] is None


def test_robots_sitemap_directives_surface(spark):
    """Sitemap: lines live OUTSIDE user-agent groups (they apply to all
    agents) and are the standard discovery channel for parse_sitemaps —
    they must come back as (host, sitemap_url) rows, deduplicated."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        robots_sitemaps,
    )

    df = spark.createDataFrame(
        [("p.example", ROBOTS_POLITE), ("q.example", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["sitemap_url"]) for r in robots_sitemaps(df).collect()}
    assert got == {
        ("p.example", "http://p.example/sitemap.xml"),
        ("p.example", "http://p.example/news.xml"),
    }


def test_robots_to_sitemap_frontier_end_to_end(spark):
    """robots.txt Sitemap: directive -> fetched sitemap XML ->
    parse_sitemaps frontier rows — the full discovery chain."""
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_sitemaps,
        robots_sitemaps,
    )

    robots = spark.createDataFrame(
        [("p.example", "User-agent: *\nDisallow: /private/\nSitemap: http://p.example/s.xml\n")],
        "host string, robots_txt string",
    )
    fetched = spark.createDataFrame(
        [
            (
                "http://p.example/s.xml",
                "<urlset><url><loc>http://p.example/a</loc></url>"
                "<url><loc>http://p.example/b</loc></url></urlset>",
            )
        ],
        "sitemap_url string, body string",
    )
    frontier = parse_sitemaps(
        robots_sitemaps(robots).join(fetched, "sitemap_url"),
        text_col="body",
    )
    locs = {r["loc"] for r in frontier.collect()}
    assert locs == {"http://p.example/a", "http://p.example/b"}
    assert all(not r["is_index"] for r in frontier.collect())


def test_latest_robots_capture_per_host(spark):
    """http+https captures of one host, plus a mid-crawl edit: exactly
    one (the newest; https beats http on date ties) feeds the parser, so
    group recovery never interleaves lines from different captures."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        latest_robots_captures,
        parse_robots,
    )

    recs = spark.createDataFrame(
        [
            ("http://h.example/robots.txt", b"User-agent: *\nDisallow: /old/\n", "2026-01-01"),
            ("https://h.example/robots.txt", b"User-agent: *\nDisallow: /new/\n", "2026-02-01"),
            ("http://i.example/robots.txt", b"User-agent: *\nDisallow: /a/\n", "2026-03-01"),
            ("https://i.example/robots.txt", b"User-agent: *\nDisallow: /b/\n", "2026-03-01"),
            ("http://h.example/page", b"<html></html>", "2026-02-02"),
        ],
        "url string, payload binary, warc_date string",
    )
    caps = latest_robots_captures(recs)
    got = {r["host"]: r["robots_txt"] for r in caps.collect()}
    assert len(got) == 2
    assert "/new/" in got["h.example"]            # newest capture wins
    assert "/b/" in got["i.example"]              # date tie: https wins
    # and the parse sees exactly one capture's consistent line stream
    rules = parse_robots(caps).collect()
    assert {(r["host"], r["path"]) for r in rules} == {
        ("h.example", "/new/"), ("i.example", "/b/"),
    }


def test_latest_robots_capture_payload_tiebreak_is_deterministic(spark):
    """Two captures sharing host, URL, AND warc_date (a robots.txt that
    changed mid-crawl inside one second — digest dedup keeps both)
    differ only in payload; the payload itself is the final sort key, so
    the governing rules never vary with partitioning."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        latest_robots_captures,
    )

    rows = [
        ("https://t.example/robots.txt", b"User-agent: *\nDisallow: /a/\n", "2026-05-01T00:00:00Z"),
        ("https://t.example/robots.txt", b"User-agent: *\nDisallow: /z/\n", "2026-05-01T00:00:00Z"),
    ]
    for perm in (rows, rows[::-1]):
        recs = spark.createDataFrame(
            perm, "url string, payload binary, warc_date string"
        ).repartition(4)
        got = latest_robots_captures(recs).collect()
        assert len(got) == 1
        assert "/z/" in got[0]["robots_txt"]  # bytewise-greatest payload wins


def test_sitemapindex_and_urlset_concatenated_per_block(spark):
    """is_index derives from each block's own element, not a whole-doc
    contains(): a document carrying both a <sitemapindex> and a
    <urlset> labels children true and pages false respectively."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        parse_sitemaps,
    )

    mixed = (
        "<sitemapindex><sitemap><loc>http://m.example/child.xml</loc></sitemap>"
        "</sitemapindex>\n"
        "<urlset><url><loc>http://m.example/page</loc></url></urlset>"
    )
    df = spark.createDataFrame([("m.example", mixed)], "host string, sitemap_xml string")
    got = {r["loc"]: r["is_index"] for r in parse_sitemaps(df).collect()}
    assert got == {"http://m.example/child.xml": True, "http://m.example/page": False}


def test_non_root_robots_txt_is_not_authoritative(spark):
    """Only the root /robots.txt governs a host (RFC 9309 §2.3): a
    mirrored copy at /static/robots.txt — even newer — must not replace
    the host's real rules."""
    from polygon_io_data_ingestion_pipeline_spark.operators.robots import (
        latest_robots_captures,
    )

    recs = spark.createDataFrame(
        [
            ("http://h.example/robots.txt", b"User-agent: *\nDisallow: /real/\n", "2026-01-01"),
            ("http://h.example/static/robots.txt", b"User-agent: *\nDisallow: /mirror/\n", "2026-06-01"),
        ],
        "url string, payload binary, warc_date string",
    )
    got = {r["host"]: r["robots_txt"] for r in latest_robots_captures(recs).collect()}
    assert list(got) == ["h.example"] and "/real/" in got["h.example"]
