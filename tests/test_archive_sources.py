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
