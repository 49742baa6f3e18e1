"""HTML page metadata extraction: title, meta description, canonical
resolution, html lang, robots meta directives, charset integration."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
    _extract_page_meta,
    extract_page_meta,
)


def test_full_head():
    html = (
        '<html lang="de"><head>'
        "<title>Die  Seite </title>"
        '<meta name="description" content="Eine   kurze Beschreibung">'
        '<link rel="canonical" href="/artikel/42">'
        '<meta name="robots" content="NOINDEX, nofollow">'
        "</head><body>x</body></html>"
    )
    m = _extract_page_meta(html, "http://h.example/artikel/42?utm_source=x")
    assert m["title"] == "Die Seite"
    assert m["meta_description"] == "Eine kurze Beschreibung"
    assert m["canonical_url"] == "http://h.example/artikel/42"
    assert m["html_lang"] == "de"
    assert m["meta_noindex"] is True and m["meta_nofollow"] is True


def test_defaults_and_first_wins():
    m = _extract_page_meta("<p>no head at all</p>", "http://h.example/")
    assert m == {
        "title": None, "meta_description": None, "canonical_url": None,
        "html_lang": None, "meta_noindex": False, "meta_nofollow": False,
    }
    # first title/description/canonical win; robots 'none' = both flags
    html = (
        "<title>First</title><title>Second</title>"
        '<meta name="description" content="one">'
        '<meta name="description" content="two">'
        '<link rel="canonical" href="http://a.example/1">'
        '<link rel="canonical" href="http://a.example/2">'
        '<meta name="robots" content="none">'
    )
    m = _extract_page_meta(html, "http://h.example/")
    assert m["title"] == "First" and m["meta_description"] == "one"
    assert m["canonical_url"] == "http://a.example/1"
    assert m["meta_noindex"] is True and m["meta_nofollow"] is True


def test_canonical_resolves_via_base_and_rejects_non_web():
    html = '<base href="/c/"><link rel="canonical" href="page">'
    m = _extract_page_meta(html, "http://h.example/deep/x")
    assert m["canonical_url"] == "http://h.example/c/page"
    m2 = _extract_page_meta(
        '<link rel="canonical" href="javascript:void(0)">', "http://h.example/"
    )
    assert m2["canonical_url"] is None


def test_unclosed_title_and_malformed():
    m = _extract_page_meta("<title>Dangling title", "http://h.example/")
    assert m["title"] == "Dangling title"


def test_spark_lane_with_charset(spark):
    page = (
        '<html lang="ru"><head><title>Заголовок</title>'
        '<meta name="robots" content="noindex"></head><body>т</body></html>'
    )
    df = spark.createDataFrame(
        [
            ("http://r.example/p", page.encode("windows-1251"),
             "text/html; charset=windows-1251"),
            ("http://r.example/broken", None, "text/html"),
        ],
        "url string, payload binary, content_type string",
    )
    rows = {r["url"]: r for r in extract_page_meta(df).collect()}
    good = rows["http://r.example/p"]
    assert good["title"] == "Заголовок" and good["html_lang"] == "ru"
    assert good["meta_noindex"] is True and good["meta_nofollow"] is False
    broken = rows["http://r.example/broken"]
    assert broken["title"] is None and broken["meta_noindex"] is None
