"""ZIP and WARC corpus ingestion: archives explode to member/record rows
through the Arrow-batched lane; WARC HTTP envelopes strip; HTML payloads
extract to visible text; corrupt archives quarantine to zero rows."""

from __future__ import annotations

import gzip
import io
import zipfile

from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
    _extract_text,
    html_to_text,
    read_warc,
    read_zip_members,
)

HTML = (
    b"<html><head><title>T</title><style>body{x}</style></head>"
    b"<body><h1>Head  line</h1><p>First para.</p><script>var x=1;</script>"
    b"<div>Second   bit</div></body></html>"
)


def _warc_record(rtype, url, body, extra=""):
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http_response(payload, ctype=b"text/html", status=b"200 OK"):
    return (
        b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype
        + b"\r\nContent-Length: " + str(len(payload)).encode() + b"\r\n\r\n" + payload
    )


def test_zip_members_explode_and_filter(spark, tmp_path):
    zdir = tmp_path / "zips"
    zdir.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("docs/a.txt", "alpha")
        zf.writestr("docs/b.txt", "bravo")
        zf.writestr("img/c.bin", b"\x00\x01")
        zf.writestr("docs/", "")  # directory entry: skipped
    (zdir / "bundle.zip").write_bytes(buf.getvalue())
    (zdir / "broken.zip").write_bytes(b"PK\x03\x04corrupt")

    rows = read_zip_members(spark, str(zdir)).collect()
    assert {(r["member"], bytes(r["payload"])) for r in rows} == {
        ("docs/a.txt", b"alpha"), ("docs/b.txt", b"bravo"), ("img/c.bin", b"\x00\x01"),
    }
    only_txt = read_zip_members(spark, str(zdir), suffix=".txt").collect()
    assert {r["member"] for r in only_txt} == {"docs/a.txt", "docs/b.txt"}


def test_warc_gz_roundtrip_and_http_strip(spark, tmp_path):
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    rec1 = _warc_record("warcinfo", "-", b"software: test")
    rec2 = _warc_record("response", "http://x.example/a", _http_response(HTML))
    rec3 = _warc_record("request", "http://x.example/a", b"GET /a HTTP/1.1")
    rec4 = _warc_record(
        "response", "http://x.example/b",
        _http_response(b"plain body", ctype=b"text/plain", status=b"404 NF"),
    )
    # .warc.gz: each record its own gzip member
    gz = b"".join(gzip.compress(r) for r in (rec1, rec2, rec3, rec4))
    (wdir / "crawl.warc.gz").write_bytes(gz)
    # plain .warc too
    (wdir / "crawl2.warc").write_bytes(rec2)
    (wdir / "bad.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")

    df = read_warc(spark, str(wdir))
    rows = df.collect()
    # responses only (default), corrupt file quarantined
    assert all(r["record_type"] == "response" for r in rows)
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url["http://x.example/a"]) == 2  # gz + plain copies
    a = by_url["http://x.example/a"][0]
    assert a["http_status"] == 200 and a["content_type"] == "text/html"
    assert bytes(a["payload"]) == HTML  # HTTP envelope stripped
    b = by_url["http://x.example/b"][0]
    assert b["http_status"] == 404 and bytes(b["payload"]) == b"plain body"

    # record_types=() keeps every record type
    all_types = {r["record_type"] for r in read_warc(spark, str(wdir), record_types=()).collect()}
    assert all_types == {"warcinfo", "response", "request"}


def test_html_to_text_extraction(spark, tmp_path):
    assert _extract_text(HTML.decode()) == "T\nHead line\nFirst para.\nSecond bit"
    wdir = tmp_path / "w"
    wdir.mkdir()
    rec = _warc_record("response", "http://x.example/a", _http_response(HTML))
    (wdir / "c.warc").write_bytes(rec)
    out = html_to_text(read_warc(spark, str(wdir))).collect()
    assert out[0]["text"] == "T\nHead line\nFirst para.\nSecond bit"
    # and the pipeline composes into the documents shape downstream
    assert out[0]["url"] == "http://x.example/a"


def test_corpus_cli_from_warc(spark, tmp_path, capsys):
    """crawl.warc.gz -> corpus CLI: extract, gate, dedup, split — the
    full crawl-to-training-corpus journey in one command."""
    import gzip as _gzip

    from polygon_io_data_ingestion_pipeline_spark.cli import main

    body = (
        "<html><body><p>"
        + "the data in a table is the value of the row and the key for the "
        "batch while the line in a window is the part of the sort"
        + "</p></body></html>"
    ).encode()
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    recs = [
        _warc_record("response", "http://x.example/good", _http_response(body)),
        _warc_record("response", "http://x.example/good?utm_source=feed", _http_response(body)),
        _warc_record("response", "http://x.example/dup", _http_response(body)),
        _warc_record("response", "http://x.example/short", _http_response(b"<p>tiny</p>")),
        _warc_record(
            "response", "http://x.example/img",
            _http_response(b"\x89PNG...", ctype=b"image/png"),
        ),
    ]
    (wdir / "c.warc.gz").write_bytes(b"".join(_gzip.compress(r) for r in recs))
    out = str(tmp_path / "corpus")
    rc = main([
        "corpus", "--src", str(wdir), "--out", out,
        "--input-format", "warc", "--master", "local[4]",
    ])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "read=3" in msg  # image skipped; utm refetch URL-deduped
    result = spark.read.parquet(out)
    rows = result.collect()
    # short doc gated out; identical texts deduped to one representative
    assert len(rows) == 1
    assert rows[0]["url"] in ("http://x.example/good", "http://x.example/dup")
    assert rows[0]["text"].startswith("the data in a table")


def test_corpus_cli_from_zip(spark, tmp_path, capsys):
    import io as _io
    import zipfile as _zipfile

    from polygon_io_data_ingestion_pipeline_spark.cli import main

    good = (
        "a scan of the table shows the key and the value where the row of "
        "the batch meets the line of the window in a sort of merge"
    )
    buf = _io.BytesIO()
    with _zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", good)
        zf.writestr("b.txt", "short junk")
        zf.writestr("c.bin", b"\x00\x01")
    zdir = tmp_path / "zips"
    zdir.mkdir()
    (zdir / "bundle.zip").write_bytes(buf.getvalue())
    out = str(tmp_path / "corpus")
    rc = main([
        "corpus", "--src", str(zdir), "--out", out,
        "--input-format", "zip", "--master", "local[4]",
    ])
    assert rc == 0
    assert "read=2" in capsys.readouterr().out  # .bin filtered by suffix
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["url"] == "a.txt"


def test_http_bare_lf_head_still_strips(spark, tmp_path):
    """Responses captured from bare-LF servers must still have their
    envelope stripped — otherwise the text/* filter silently drops
    them."""
    body = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\npayload-bytes"
    wdir = tmp_path / "w"
    wdir.mkdir()
    (wdir / "lf.warc").write_bytes(
        _warc_record("response", "http://x.example/lf", body)
    )
    r = read_warc(spark, str(wdir)).collect()[0]
    assert r["http_status"] == 200
    assert r["content_type"] == "text/plain"
    assert bytes(r["payload"]) == b"payload-bytes"


def test_tar_members_explode(spark, tmp_path):
    import io as _io
    import tarfile as _tarfile

    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        read_tar_members,
    )

    tdir = tmp_path / "tars"
    tdir.mkdir()
    for name, mode in (("b.tar", "w"), ("b.tar.gz", "w:gz")):
        buf = _io.BytesIO()
        with _tarfile.open(fileobj=buf, mode=mode) as tf:
            for member, data in (("docs/a.txt", b"alpha"), ("c.bin", b"\x00")):
                info = _tarfile.TarInfo(member)
                info.size = len(data)
                tf.addfile(info, _io.BytesIO(data))
        (tdir / name).write_bytes(buf.getvalue())
    (tdir / "broken.tar").write_bytes(b"definitely not a tar archive")

    rows = read_tar_members(spark, str(tdir)).collect()
    assert len(rows) == 4  # 2 members x 2 archives; broken quarantined
    assert {(r["member"], bytes(r["payload"])) for r in rows} == {
        ("docs/a.txt", b"alpha"), ("c.bin", b"\x00"),
    }
    txt = read_tar_members(spark, str(tdir), suffix=".txt").collect()
    assert {r["member"] for r in txt} == {"docs/a.txt"}


# --- round 8: charset-aware decode ------------------------------------------


def test_charset_header_roundtrip_exact(spark, tmp_path):
    """windows-1251 and shift_jis pages whose charset sits in the HTTP
    Content-Type round-trip exactly — no mojibake, decode_ok true."""
    ru = "<html><body><p>Привет мир</p></body></html>".encode("windows-1251")
    ja = "<html><body><p>こんにちは世界</p></body></html>".encode("shift_jis")
    wdir = tmp_path / "w"
    wdir.mkdir()
    recs = [
        _warc_record(
            "response", "http://x.example/ru",
            _http_response(ru, ctype=b"text/html; charset=windows-1251"),
        ),
        _warc_record(
            "response", "http://x.example/ja",
            _http_response(ja, ctype=b"text/html; charset=shift_jis"),
        ),
    ]
    (wdir / "c.warc").write_bytes(b"".join(recs))
    rows = {r["url"]: r for r in html_to_text(read_warc(spark, str(wdir))).collect()}
    assert rows["http://x.example/ru"]["text"] == "Привет мир"
    assert rows["http://x.example/ru"]["charset"] == "cp1251"
    assert rows["http://x.example/ru"]["decode_ok"] is True
    assert rows["http://x.example/ja"]["text"] == "こんにちは世界"
    assert rows["http://x.example/ja"]["charset"] == "shift_jis"
    assert rows["http://x.example/ja"]["decode_ok"] is True


def test_charset_meta_bom_and_whatwg(spark, tmp_path):
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _decode_payload,
        sniff_charset,
    )

    # <meta charset> prescan when the header says nothing
    gbk = '<html><head><meta charset="gb2312"></head><body>你好</body></html>'.encode("gbk")
    assert sniff_charset(gbk, "text/html") == ("gbk", "meta")  # WHATWG: gb2312->gbk
    assert _decode_payload(gbk, "text/html")[0].endswith("你好</body></html>")
    # BOM outranks a (wrong) header label
    utf16 = "﻿<p>bom wins</p>".encode("utf-16-le")
    enc, src = sniff_charset(utf16, "text/html; charset=windows-1251")
    assert (enc, src) == ("utf-16-le", "bom")
    text, charset, ok = _decode_payload(utf16, "text/html; charset=windows-1251")
    assert "bom wins" in text and ok
    # WHATWG: declared latin1/iso-8859-1 decodes as its cp1252 superset
    em = b"<p>a \x97 dash</p>"
    text, charset, ok = _decode_payload(em, "text/html; charset=iso-8859-1")
    assert charset == "cp1252" and "—" in text and ok


def test_mojibake_quarantined_on_corpus_cli_path(spark, tmp_path, capsys):
    """A page whose declared charset lies (invalid byte under both the
    label and utf-8) decodes lossily -> decode_ok false -> quarantined
    by the corpus CLI with the count in the accounting line."""
    import gzip as _gzip

    from polygon_io_data_ingestion_pipeline_spark.cli import main

    good = (
        "<html><body><p>"
        "the data in a table is the value of the row and the key for the "
        "batch while the line in a window is the part of the sort"
        "</p></body></html>"
    ).encode()
    # shift_jis-declared but NOT valid shift_jis nor utf-8: 0x80 is a
    # lead byte with an invalid continuation in both
    bad = b"<html><body><p>broken \x80\x80\x80\x80 bytes</p></body></html>"
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    recs = [
        _warc_record("response", "http://x.example/good", _http_response(good)),
        _warc_record(
            "response", "http://x.example/bad",
            _http_response(bad, ctype=b"text/html; charset=shift_jis"),
        ),
    ]
    (wdir / "c.warc.gz").write_bytes(b"".join(_gzip.compress(r) for r in recs))
    out = str(tmp_path / "corpus")
    assert main([
        "corpus", "--src", str(wdir), "--out", out,
        "--input-format", "warc", "--master", "local[4]",
    ]) == 0
    msg = capsys.readouterr().out
    assert "quarantined=1" in msg
    rows = spark.read.parquet(out).collect()
    assert [r["url"] for r in rows] == ["http://x.example/good"]


# --- round 8: main-content (boilerplate) extraction --------------------------


BOILER_HTML = (
    "<html><body>"
    "<nav><a href='/'>Home</a> <a href='/about'>About</a> <a href='/faq'>FAQ</a></nav>"
    "<div class='cookie-banner'>We use cookies to improve your browsing experience"
    " on this site. Accept all</div>"
    "<article><h1>Real Title</h1>"
    "<p>This is the real article body text that we keep verbatim in the corpus.</p>"
    "</article>"
    "<div><a href='/p/1'>Prev</a> <a href='/p/2'>Next</a></div>"
    "<footer>Copyright 2026 Example Corp. All rights reserved.</footer>"
    "</body></html>"
)


def test_main_content_strips_chrome_keeps_body():
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    main_text = _extract_main_text(BOILER_HTML)
    assert main_text == (
        "Real Title\n"
        "This is the real article body text that we keep verbatim in the corpus."
    )
    # the keep-everything variant still sees the chrome
    assert "Home" in _extract_text(BOILER_HTML)
    assert "cookies" in _extract_text(BOILER_HTML)


def test_main_content_changes_gopher_gate_in_expected_direction(spark):
    """On a templated fixture (body drowned in repeated nav chrome) the
    Gopher gate fails the full text on duplicate-word ratio but passes
    the main-content text — boilerplate stripping must move the gate
    toward keeping real articles."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        quality_filter,
    )
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    chrome = "<nav>" + " ".join(
        "<a href='/{0}'>Home About Contact Blog Shop</a>".format(i) for i in range(30)
    ) + "</nav>"
    body = (
        "<article><p>the data in a table is the value of the row and the key "
        "for the batch while the line in a window is the part of the sort and "
        "the merge of the scan gives the shape of the plan</p></article>"
    )
    page = f"<html><body>{chrome}{body}</body></html>"
    df = spark.createDataFrame(
        [(1, _extract_text(page)), (2, _extract_main_text(page))],
        "doc_id long, text string",
    )
    keep = {r["doc_id"]: r["keep"] for r in quality_filter(df).collect()}
    assert keep[1] is False and keep[2] is True


# --- round 8: payload digest + revisit records --------------------------------


def test_revisit_record_dedups_original_via_digest(spark, tmp_path):
    """A revisit record (same WARC-Payload-Digest, empty payload) and a
    duplicate response collapse onto the original response WITHOUT any
    payload hashing; distinct digests and null digests pass through."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        warc_digest_dedup,
    )

    digest = "sha1:AAAABBBBCCCCDDDDEEEEFFFFGGGG"
    wdir = tmp_path / "w"
    wdir.mkdir()
    recs = [
        _warc_record(
            "response", "http://x.example/orig", _http_response(HTML),
            extra=f"WARC-Payload-Digest: {digest}\r\n",
        ),
        _warc_record(
            "revisit", "http://x.example/again",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
            extra=f"WARC-Payload-Digest: {digest}\r\n"
            "WARC-Refers-To-Target-URI: http://x.example/orig\r\n",
        ),
        _warc_record(
            "response", "http://x.example/copy", _http_response(HTML),
            # later refetch (duplicate header: last occurrence wins)
            extra=f"WARC-Payload-Digest: {digest}\r\n"
            "WARC-Date: 2026-08-15T00:00:00Z\r\n",
        ),
        _warc_record(
            "response", "http://x.example/other", _http_response(b"<p>different</p>"),
            extra="WARC-Payload-Digest: sha1:ZZZZYYYYXXXX\r\n",
        ),
        _warc_record("response", "http://x.example/nodigest", _http_response(HTML)),
    ]
    (wdir / "c.warc").write_bytes(b"".join(recs))
    raw = read_warc(spark, str(wdir))  # default keeps response + revisit
    assert {r["record_type"] for r in raw.collect()} == {"response", "revisit"}
    deduped = warc_digest_dedup(raw).collect()
    urls = {r["url"] for r in deduped}
    # one representative for the shared digest: the earliest RESPONSE
    assert "http://x.example/orig" in urls
    assert "http://x.example/again" not in urls  # revisit never represents
    assert "http://x.example/copy" not in urls
    assert urls >= {"http://x.example/other", "http://x.example/nodigest"}
    assert len(deduped) == 3


# --- round 8: streaming (bounded-memory) archive walk -------------------------


def test_warc_record_parse_is_incremental():
    """The record parser must pull chunks lazily: after k records are
    consumed, only ~k record-sized chunks may have been served — the
    bounded-buffer contract that lets an oversized WARC stream through
    a task without materializing."""
    from itertools import islice

    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _warc_records_from_chunks,
    )

    records = [
        _warc_record("response", f"http://x.example/{i}", _http_response(HTML))
        for i in range(100)
    ]
    served = 0

    def chunks():
        nonlocal served
        for rec in records:
            served += 1
            yield rec

    it = _warc_records_from_chunks(chunks())
    first3 = list(islice(it, 3))
    assert [h["warc-target-uri"] for h, _ in first3] == [
        "http://x.example/0", "http://x.example/1", "http://x.example/2",
    ]
    assert served <= 5, f"parser buffered {served} chunks for 3 records"
    assert len(list(it)) == 97  # and the rest still parse


def test_oversized_archives_stream_in_bounded_batches(spark, tmp_path):
    """Readers with a batch cap far below the archive size still produce
    complete, correct output — the archive is walked incrementally, one
    bounded batch at a time."""
    import gzip as _gzip
    import io as _io
    import tarfile as _tarfile

    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        read_tar_members,
    )

    wdir = tmp_path / "w"
    wdir.mkdir()
    recs = [
        _warc_record("response", f"http://x.example/{i}",
                     _http_response(f"<p>page {i}</p>".encode()))
        for i in range(50)
    ]
    (wdir / "big.warc.gz").write_bytes(b"".join(_gzip.compress(r) for r in recs))
    got = read_warc(spark, str(wdir), batch_rows=4, batch_bytes=256).collect()
    assert sorted(r["url"] for r in got) == sorted(
        f"http://x.example/{i}" for i in range(50)
    )

    tdir = tmp_path / "t"
    tdir.mkdir()
    buf = _io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for i in range(50):
            data = f"member {i}".encode()
            info = _tarfile.TarInfo(f"m{i:03d}.txt")
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    (tdir / "big.tar.gz").write_bytes(buf.getvalue())
    rows = read_tar_members(spark, str(tdir), batch_rows=4, batch_bytes=64).collect()
    assert len(rows) == 50
    assert {r["member"] for r in rows} == {f"m{i:03d}.txt" for i in range(50)}


def test_zip_members_decode_charset_aware(spark, tmp_path, capsys):
    """Bundle members decode charset-aware: a BOM'd UTF-16 member
    round-trips exactly, an undeclared cp1251 member is QUARANTINED
    (decode_ok false) instead of shipping as replacement-char soup."""
    import io as _io
    import zipfile as _zipfile

    from polygon_io_data_ingestion_pipeline_spark.cli import main
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        decode_text_members,
        read_zip_members,
    )

    good = ("a scan of the table shows the key and the value where the row "
            "of the batch meets the line of the window in a sort of merge")
    buf = _io.BytesIO()
    with _zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("utf16.txt", b"\xff\xfe" + good.encode("utf-16-le"))
        zf.writestr("ru.txt", "Привет мир".encode("windows-1251"))
    zdir = tmp_path / "zips"
    zdir.mkdir()
    (zdir / "bundle.zip").write_bytes(buf.getvalue())

    rows = {
        r["member"]: r
        for r in decode_text_members(read_zip_members(spark, str(zdir))).collect()
    }
    assert rows["utf16.txt"]["text"] == good
    assert rows["utf16.txt"]["charset"] == "utf-16-le"
    assert rows["utf16.txt"]["decode_ok"] is True
    assert rows["ru.txt"]["decode_ok"] is False  # undeclared cp1251: flagged

    out = str(tmp_path / "corpus")
    assert main([
        "corpus", "--src", str(zdir), "--out", out,
        "--input-format", "zip", "--master", "local[4]",
    ]) == 0
    msg = capsys.readouterr().out
    assert "quarantined=1" in msg
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["text"] == good


def test_corpus_cli_robots_filter(spark, tmp_path, capsys):
    """--robots replays the crawl's own robots.txt captures: pages the
    host disallows are dropped, allowed pages survive, and the robots
    files themselves never become documents."""
    import gzip as _gzip

    from polygon_io_data_ingestion_pipeline_spark.cli import main

    good = (
        "<html><body><p>"
        "the data in a table is the value of the row and the key for the "
        "batch while the line in a window is the part of the sort"
        "</p></body></html>"
    ).encode()
    robots = b"User-agent: *\nDisallow: /private/\n"
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    recs = [
        _warc_record(
            "response", "http://x.example/robots.txt",
            _http_response(robots, ctype=b"text/plain"),
        ),
        _warc_record("response", "http://x.example/public/a", _http_response(good)),
        _warc_record("response", "http://x.example/private/b", _http_response(good)),
    ]
    (wdir / "c.warc.gz").write_bytes(b"".join(_gzip.compress(r) for r in recs))
    out = str(tmp_path / "corpus")
    assert main([
        "corpus", "--src", str(wdir), "--out", out,
        "--input-format", "warc", "--robots", "--master", "local[4]",
    ]) == 0
    msg = capsys.readouterr().out
    assert "blocked=1" in msg
    rows = spark.read.parquet(out).collect()
    assert [r["url"] for r in rows] == ["http://x.example/public/a"]


def test_nested_same_name_plain_tag_keeps_boiler_scope():
    """A plain <div> nested inside <div class="nav"> must not end the
    boiler scope at its own </div> — chrome after the inner close is
    still chrome (per-entry depth counting, not name-presence pop)."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    html = (
        "<html><body>"
        '<div class="nav"><div>Inner chrome text here</div>'
        "Outer chrome after inner close</div>"
        "<p>Real body paragraph with enough length to keep.</p>"
        "</body></html>"
    )
    main = _extract_main_text(html)
    assert "Real body paragraph" in main
    assert "Inner chrome" not in main
    assert "Outer chrome after inner close" not in main


def test_text_directly_after_boiler_close_is_kept():
    """Bare text between a closed boiler container and the next block
    tag is NOT chrome: the scope must end at the close itself, not at
    the next flush."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    html = (
        "<html><body>"
        '<div class="nav">menu menu menu</div>'
        "This long legitimate sentence follows the navigation close directly."
        "<p>Another real paragraph with enough length to keep around.</p>"
        "</body></html>"
    )
    main = _extract_main_text(html)
    assert "legitimate sentence follows" in main
    assert "Another real paragraph" in main
    assert "menu" not in main


def test_unclosed_inner_same_name_recovers_at_closed_ancestor():
    """Tag soup: an UNCLOSED plain <div> inside <div class="nav"> means
    the nav's own </div> closes the inner one (browser auto-close), so
    the scope genuinely leaks — but it must recover at the nearest
    properly-closed ancestor (here </header>), not persist to
    end-of-document as per-name depth counting would."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    html = (
        "<html><body><header>"
        '<div class="nav"><div>chrome a</div><div>chrome b</div>'  # 2nd div unclosed
        "</header>"
        "<p>Real article body paragraph long enough to survive scoring.</p>"
        "</body></html>"
    )
    main = _extract_main_text(html)
    assert "Real article body" in main
    assert "chrome a" not in main


def test_main_tag_flushes_pending_chrome_before_clearing():
    """Text accumulated inside a still-open chrome scope when <main>
    opens must ship as boiler — <main> clears the scope for what
    FOLLOWS, not retroactively."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    html = (
        '<html><body><div class="nav">Home About Contact'
        "<main><p>Real article body text long enough to survive scoring.</p>"
        "</main></div></body></html>"
    )
    main = _extract_main_text(html)
    assert "Real article body" in main
    assert "Home About Contact" not in main


def test_misnested_inline_close_does_not_end_boiler_container():
    """A stray inline close ('</b>' opened before the nav) must not
    auto-close the structural container — text still inside the nav
    stays chrome (browsers run the adoption agency here, they never
    close the div)."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_blocks,
        _extract_main_text,
    )

    html = (
        '<html><body><b>bold<div class="nav"><p>one</p></b>'
        "<p>two three four nav links</p></div>"
        "<p>Real body paragraph long enough to survive the scoring.</p>"
        "</body></html>"
    )
    blocks = {t: b for t, _l, b in _extract_blocks(html)}
    assert blocks["two three four nav links"] is True  # still chrome
    main = _extract_main_text(html)
    assert "Real body paragraph" in main
    assert "nav links" not in main


def test_main_tag_clears_leaked_boiler_scope():
    """<main> is an authoritative main-content signal: even when broken
    markup leaks a boiler scope with no closed ancestor before the
    body, content inside <main> is kept."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        _extract_main_text,
    )

    html = (
        "<html><body>"
        '<div class="nav"><div>chrome x</div><div>chrome y'  # never recovers
        "<main><p>Body text inside main long enough to survive scoring.</p></main>"
        "</body></html>"
    )
    main = _extract_main_text(html)
    assert "Body text inside main" in main
    assert "chrome x" not in main


def test_corpus_cli_meta_robots_canonical_and_pdf(spark, tmp_path, capsys):
    """The page-level compliance journey: noindex pages drop with
    accounting, rel=canonical duplicates collapse to one fetch, and an
    application/pdf record extracts through the PDF codec — all in one
    corpus command."""
    import gzip as _gzip
    import zlib as _zlib

    from polygon_io_data_ingestion_pipeline_spark.cli import main

    body_text = (
        "the data in a table is the value of the row and the key for the "
        "batch while the line in a window is the part of the sort"
    )
    page = f"<html><body><p>{body_text}</p></body></html>".encode()
    noindex_page = (
        '<html><head><meta name="robots" content="noindex"></head>'
        f"<body><p>{body_text} but this one said noindex</p></body></html>"
    ).encode()
    canon = (
        '<html><head><link rel="canonical" href="http://x.example/canon">'
        f"</head><body><p>{body_text} syndicated copy</p></body></html>"
    ).encode()
    pdf_words = " ".join(
        ["a scan of the table shows the key and the value where the row of",
         "the batch meets the line of the window in a sort of merge"]
    )
    pdf_stream = _zlib.compress(f"BT ({pdf_words}) Tj ET".encode())
    pdf = b"\n".join([
        b"%PDF-1.4",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj",
        b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream" % len(pdf_stream),
        pdf_stream,
        b"endstream\nendobj",
        b"trailer\n<< /Root 1 0 R >>\n%%EOF",
    ])
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    recs = [
        _warc_record("response", "http://x.example/keep", _http_response(page)),
        _warc_record("response", "http://x.example/hidden", _http_response(noindex_page)),
        _warc_record("response", "http://x.example/copy-1", _http_response(canon)),
        _warc_record("response", "http://x.example/copy-2", _http_response(canon)),
        _warc_record(
            "response", "http://x.example/report.pdf",
            _http_response(pdf, ctype=b"application/pdf"),
        ),
    ]
    (wdir / "c.warc.gz").write_bytes(b"".join(_gzip.compress(r) for r in recs))
    out = str(tmp_path / "corpus")
    rc = main([
        "corpus", "--src", str(wdir), "--out", out,
        "--input-format", "warc", "--meta-robots", "--canonical-dedup",
        "--master", "local[4]",
    ])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "meta-robots: noindex=1" in msg
    rows = spark.read.parquet(out).collect()
    urls = sorted(r["url"] for r in rows)
    # noindex page dropped; the two canonical copies collapsed to the
    # earliest fetch; the PDF extracted as a document
    assert "http://x.example/hidden" not in urls
    assert urls == [
        "http://x.example/copy-1", "http://x.example/keep",
        "http://x.example/report.pdf",
    ]
    by_url = {r["url"]: r["text"] for r in rows}
    assert by_url["http://x.example/report.pdf"] == pdf_words


def test_read_wet_and_corpus_cli(spark, tmp_path, capsys):
    """Common Crawl WET sidecar: conversion records are pre-extracted
    text — read_wet decodes them (charset lane, quarantine accounting)
    and the corpus CLI ingests them end to end with the multilingual
    gate."""
    import gzip as _gzip

    from polygon_io_data_ingestion_pipeline_spark.cli import main
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import read_wet

    en = (
        "the data in a table is the value of the row and the key for the "
        "batch while the line in a window is the part of the sort"
    )
    de = (
        "das wetter war kalt und die kinder blieben mit ihren eltern zu "
        "hause weil der regen den ganzen tag nicht aufhören wollte und "
        "die straßen unter wasser standen"
    )

    def conv(url, text):
        body = text.encode()
        head = (
            f"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-08-14T00:00:00Z\r\nContent-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    wdir = tmp_path / "wet"
    wdir.mkdir()
    (wdir / "c.warc.wet.gz").write_bytes(
        b"".join(_gzip.compress(r) for r in (
            conv("http://x.example/en", en),
            conv("http://de.example/artikel", de),
        ))
    )
    rows = {r["url"]: r for r in read_wet(spark, str(wdir)).collect()}
    assert rows["http://x.example/en"]["text"] == en
    assert rows["http://de.example/artikel"]["decode_ok"] is True

    out = str(tmp_path / "corpus")
    rc = main([
        "corpus", "--src", str(wdir), "--out", out,
        "--input-format", "wet", "--master", "local[4]",
    ])
    assert rc == 0
    result = {r["url"]: r for r in spark.read.parquet(out).collect()}
    # BOTH documents survive: the German page passes the multilingual
    # gate (the English-only stopword set would have rejected it)
    assert set(result) == {"http://x.example/en", "http://de.example/artikel"}
