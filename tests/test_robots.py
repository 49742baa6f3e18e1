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
