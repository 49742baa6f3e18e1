"""robots.txt (RFC 9309 / Robots Exclusion Protocol) at crawl scale.

A corpus pipeline that ingests crawls should be able to PROVE it only
kept fetchable pages: re-evaluating the robots rules against the kept
URLs is a compliance audit, and at 100 TB both sides are big — millions
of hosts' robots files, billions of URLs — so parsing AND matching must
be distributed, not a driver-side `urllib.robotparser` loop.

Everything here is native Spark expressions:

- :func:`parse_robots` turns (host, robots.txt text) rows into a rule
  table — the sequential "user-agent group" structure of the file is
  recovered with a gaps-and-islands window (a block starts where a
  ``User-agent`` line follows a non-``User-agent`` line), rules join to
  every agent of their block, and each rule's path pattern is compiled
  to an anchored regex (``*`` -> ``.*``, trailing ``$`` -> anchor,
  everything else escaped) with expression-level rewrites.
- :func:`robots_allowed` evaluates URLs against the rules with RFC
  longest-match semantics: the most specific (longest-pattern) matching
  rule decides, ``Allow`` wins ties, no match means allowed, and a host
  with an exact-agent group ignores the ``*`` group entirely.  One hash
  join on host (rules per host are a tiny array cell) plus a per-row
  fold over that array — no Python, no broadcast requirement.

No reference counterpart — beyond-reference crawl surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _compiled_rule_regex(path: Column) -> Column:
    """robots path pattern -> anchored Java/RE2-safe regex (as a column
    expression): trailing ``$`` becomes an end anchor, ``*`` becomes
    ``.*``, all other regex metacharacters are escaped.  Built entirely
    from the passed Column (no hardcoded column name), so it composes
    with any upstream naming."""
    ends_anchored = path.endswith("$")
    base = F.when(
        ends_anchored, path.substr(F.lit(1), F.length(path) - F.lit(1))
    ).otherwise(path)
    escaped = F.regexp_replace(base, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    wildcarded = F.regexp_replace(escaped, r"\*", ".*")
    return F.concat(
        F.lit("^"), wildcarded, F.when(ends_anchored, F.lit("$")).otherwise(F.lit(""))
    )


#: line keys that participate in user-agent GROUP recovery.  Including
#: the politeness keys here is load-bearing for RFC 9309 group shape: a
#: ``Crawl-delay`` line between two ``User-agent`` lines TERMINATES the
#: first group's agent list, so the second agent must start a new block
#: rather than share the first group's rules.
_GROUP_KEYS = ("user-agent", "allow", "disallow", "crawl-delay", "request-rate")


def _robots_lines(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """(host, robots.txt) -> one (host, pos, key, value) row per
    directive line: lines explode with position, comments strip, keys
    lowercase/trim."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos", "raw"),
    )
    clean = lines.select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    return clean.select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    )


def _robots_blocks(df: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """Group recovery shared by :func:`parse_robots` and
    :func:`robots_politeness`: directive lines with their user-agent
    block id (gaps-and-islands running sum — a block starts where a
    ``User-agent`` line follows a non-``User-agent`` line)."""
    from pyspark.sql import Window

    kv = _robots_lines(df, host_col, text_col).filter(
        F.col("key").isin(*_GROUP_KEYS)
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    return kv.withColumn(
        "block",
        F.sum(
            F.when(
                is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False)), 1
            ).otherwise(0)
        ).over(w),
    )


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots.txt text) -> one row per (host, agent, rule):
    ``(host, agent, directive, path, priority, regex)`` with
    ``directive`` in {allow, disallow}, ``priority`` = pattern length
    (the RFC specificity), ``regex`` the compiled matcher.

    Distributed parse: lines explode with position, comments strip,
    ``User-agent`` blocks are recovered via a running-sum window
    partitioned by host (per-host robots files are small, so the window
    frame is tiny), and rules replicate to every agent of their block.
    Empty ``Disallow:`` lines (allow-all idiom) drop — they match
    nothing by definition."""
    blocks = _robots_blocks(df, host_col, text_col)
    is_ua = F.col("key") == "user-agent"
    agents = blocks.filter(is_ua).select(
        "host", "block", F.lower(F.col("value")).alias("agent")
    )
    rules = blocks.filter(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "block",
        F.col("key").alias("directive"),
        F.col("value").alias("path"),
    )
    return (
        rules.join(agents, ["host", "block"])
        .select(
            "host",
            "agent",
            "directive",
            "path",
            F.length("path").alias("priority"),
            _compiled_rule_regex(F.col("path")).alias("regex"),
        )
    )


def robots_politeness(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Per-group politeness metadata: one row per (host, agent) that
    declares a ``Crawl-delay`` or ``Request-rate`` line —
    ``(host, agent, crawl_delay, request_rate)`` with ``crawl_delay``
    in seconds (DOUBLE; non-numeric values null out via try-cast) and
    ``request_rate`` the raw ``m/n`` token (de-facto syntax, no RFC
    grammar to normalize to).  Same distributed group recovery as
    :func:`parse_robots`; a scheduler joins this on (host, agent) to
    rate-limit its fetch frontier."""
    blocks = _robots_blocks(df, host_col, text_col)
    agents = blocks.filter(F.col("key") == "user-agent").select(
        "host", "block", F.lower(F.col("value")).alias("agent")
    )
    polite = blocks.filter(
        F.col("key").isin("crawl-delay", "request-rate") & (F.col("value") != "")
    )
    return (
        polite.join(agents, ["host", "block"])
        .groupBy("host", "agent")
        .agg(
            F.max(
                F.when(
                    F.col("key") == "crawl-delay",
                    F.col("value").try_cast("double"),
                )
            ).alias("crawl_delay"),
            F.max(
                F.when(F.col("key") == "request-rate", F.col("value"))
            ).alias("request_rate"),
        )
    )


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` directives -> ``(host, sitemap_url)``, the standard
    sitemap-discovery channel (RFC 9309 §2.3 allows other records;
    sitemaps.org registers ``Sitemap`` as one).  These lines sit
    OUTSIDE user-agent groups — they apply to all agents — so this is a
    plain line scan, no group recovery; the output feeds
    :func:`parse_sitemaps` once the URLs are fetched.  Repeated
    declarations (same URL in several captures/lines) collapse."""
    return (
        _robots_lines(df, host_col, text_col)
        .filter((F.col("key") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def is_robots_url(url: Column) -> Column:
    """True when ``url``'s path is exactly the root ``/robots.txt`` —
    the only authoritative location (RFC 9309 §2.3).  Shared by rule
    harvesting and by the record filters that keep the robots fetch
    itself out of the corpus."""
    return F.coalesce(
        F.try_parse_url(url, F.lit("PATH")) == "/robots.txt", F.lit(False)
    )


def latest_robots_captures(
    records: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    order_col: str = "warc_date",
) -> DataFrame:
    """Crawl records -> ONE robots.txt text per host, the newest capture
    winning: ``(host, robots_txt)``.

    A crawl routinely captures a host's robots.txt more than once (http
    and https fetches, a file that changed mid-crawl so digest dedup
    keeps both).  Feeding every capture to :func:`parse_robots` would
    interleave line positions from different captures inside one host
    partition and corrupt user-agent group recovery — so reduce to the
    latest capture per host FIRST (one row_number window over the tiny
    robots subset; ties break on URL so https beats http
    deterministically, then on the payload bytes themselves — two
    same-second same-URL captures of a file that changed mid-crawl
    differ ONLY in payload, and without that final key the governing
    rules would vary with partitioning).  Only the ROOT ``/robots.txt``
    is authoritative
    (RFC 9309 §2.3): the path must equal it exactly — a mirrored copy
    at ``/static/robots.txt`` is just a file, and a suffix match would
    let it replace the host's real rules.  robots.txt is ASCII-by-spec;
    a lossy decode of a stray byte cannot flip a directive."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.col("_ord").desc(), F.col("_turl").desc(), F.col("robots_txt").desc()
    )
    return (
        records.filter(is_robots_url(F.col(url_col)))
        .select(
            F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST"))).alias("host"),
            F.col(payload_col).cast("string").alias("robots_txt"),
            F.col(order_col).alias("_ord"),
            F.col(url_col).alias("_turl"),
        )
        .filter(F.col("host").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("host", "robots_txt")
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Attach ``crawl_allowed`` to ``urls`` by evaluating ``rules``
    (from :func:`parse_robots`) for ``agent`` with RFC 9309 semantics:

    - a host that has a group for this exact agent uses ONLY that
      group; otherwise the ``*`` group applies;
    - among matching rules the longest pattern wins, ``allow`` wins
      ties; no matching rule (or no rules for the host) means allowed.

    Scale shape: rules collapse to one array cell per host (tiny), the
    URL side joins on host with ONE hash shuffle (AQE may broadcast a
    small rule table on its own), and the longest-match scan is a
    per-row ``aggregate`` fold over that host's rules — rule counts per
    host are bounded by the robots file itself."""
    agent = agent.lower()
    exact = rules.filter(F.col("agent") == agent)
    star = rules.filter(F.col("agent") == "*")
    hosts_with_exact = exact.select("host").distinct()
    effective = exact.unionByName(
        star.join(hosts_with_exact, "host", "left_anti")
    ) if agent != "*" else star
    cells = effective.groupBy("host").agg(
        F.collect_list(F.struct("priority", "directive", "regex")).alias("_rules")
    )
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # rules match the path INCLUDING the query string (RFC 9309 §2.2.2:
    # the URI path-and-query; "/search*q=" must catch "/search?q=x")
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    path = F.concat(
        path,
        F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    with_rules = urls.withColumn("_host", host).withColumn("_path", path).join(
        cells.withColumnRenamed("host", "_host"), "_host", "left"
    )
    # fold: carry (best priority, best directive); a rule beats the
    # accumulator when it matches AND (longer OR same-length-but-allow)
    best = F.expr(
        "aggregate(_rules, struct(CAST(-1 AS INT) AS prio, 'allow' AS dir), "
        "(acc, r) -> CASE WHEN regexp_like(_path, r.regex) AND "
        "(r.priority > acc.prio OR (r.priority = acc.prio AND r.directive = 'allow')) "
        "THEN struct(CAST(r.priority AS INT) AS prio, r.directive AS dir) "
        "ELSE acc END)"
    )
    return (
        with_rules.withColumn(
            "crawl_allowed",
            F.when(F.col("_rules").isNull(), F.lit(True)).otherwise(
                best["dir"] != "disallow"
            ),
        )
        .drop("_rules", "_host", "_path")
    )


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", text_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, sitemap XML) -> one row per ``<url>`` entry:
    ``(host, loc, lastmod, changefreq, priority, is_index)`` — the
    crawl-frontier complement of :func:`parse_robots` (robots says what
    NOT to fetch; sitemaps say what exists and how fresh it is).

    Handles both ``<urlset>`` documents and ``<sitemapindex>`` files
    (child sitemap locations come back with ``is_index=true`` so the
    caller can fetch-and-recurse).  The sitemap protocol's XML is
    rigidly flat, so the parse is pure JVM regexp over each ``<url>``/
    ``<sitemap>`` block — one ``regexp_extract_all`` explode, no XML
    library, no Python; entity-unescaping covers the five XML
    predefined entities sitemaps may contain.  ``is_index`` derives
    from each block's OWN element name (``<sitemap>`` vs ``<url>``,
    backreference-matched close tag), so a document that concatenates
    a ``<sitemapindex>`` and a ``<urlset>`` — or merely mentions the
    token in text — labels each entry correctly."""
    from .urls import xml_unescape

    block_re = r"(?s)<(url|sitemap)>.*?</\1>"

    def field(name: str) -> Column:
        v = F.regexp_extract("_block", f"(?s)<{name}>\\s*(.*?)\\s*</{name}>", 1)
        return F.when(v == "", F.lit(None)).otherwise(xml_unescape(v))

    blocks = df.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(block_re), F.lit(0))
        ).alias("_block"),
    )
    return blocks.select(
        "host",
        field("loc").alias("loc"),
        field("lastmod").alias("lastmod"),
        field("changefreq").alias("changefreq"),
        field("priority").cast("double").alias("priority"),
        F.col("_block").startswith("<sitemap>").alias("is_index"),
    ).filter(F.col("loc").isNotNull())
