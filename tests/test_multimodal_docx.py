"""Office document text extraction (multimodal/docx.py — DOCX/ODT as
stdlib zip+XML): paragraph/table/tab/break semantics, ODT run-length
spaces, sniffing (plain zips fall through), typed quarantine, the
decode-lane integration, and the crawl-to-corpus CLI journey."""

from __future__ import annotations

import gzip
import io
import zipfile

import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.docx import (
    OfficeFormatError,
    extract_docx_text,
    extract_odt_text,
    sniff_office_kind,
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_docx(body_xml: str) -> bytes:
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W}">'
        f"<w:body>{body_xml}</w:body></w:document>"
    ).encode()
    return _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "word/document.xml": doc,
        }
    )


def make_odt(body_xml: str) -> bytes:
    doc = (
        f'<?xml version="1.0"?>'
        f'<office:document-content xmlns:office="o" xmlns:text="{_T}">'
        f"<office:body><office:text>{body_xml}</office:text>"
        f"</office:body></office:document-content>"
    ).encode()
    return _zip_bytes(
        {
            "mimetype": b"application/vnd.oasis.opendocument.text",
            "content.xml": doc,
        }
    )


def test_docx_paragraphs_runs_tabs_breaks():
    data = make_docx(
        "<w:p><w:r><w:t>Hello</w:t></w:r>"
        '<w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>'
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t>"
        "<w:br/><w:t>c</w:t></w:r></w:p>"
    )
    assert sniff_office_kind(data) == "docx"
    assert extract_docx_text(data) == "Hello world\na\tb\nc"


def test_docx_table_cells_extract_in_order():
    data = make_docx(
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>c1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>c2</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
    )
    assert extract_docx_text(data) == "before\nc1\nc2\nafter"


def test_odt_blocks_spaces_tabs_breaks_and_spans():
    data = make_odt(
        "<text:h>Title</text:h>"
        '<text:p>a<text:s text:c="3"/>b<text:tab/>c'
        "<text:line-break/>d</text:p>"
        '<text:p>x <text:span>in <text:a href="u">link</text:a>'
        "</text:span> tail</text:p>"
    )
    assert sniff_office_kind(data) == "odt"
    assert extract_odt_text(data) == (
        "Title\na   b\tc\nd\nx in link tail"
    )


def test_plain_zip_is_not_an_office_doc():
    data = _zip_bytes({"readme.txt": b"hello", "data.bin": b"\x00\x01"})
    assert sniff_office_kind(data) is None
    assert sniff_office_kind(b"not a zip at all") is None


def test_malformed_document_xml_quarantines_typed():
    data = _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "word/document.xml": b"<w:document ... not xml",
        }
    )
    assert sniff_office_kind(data) == "docx"
    with pytest.raises(OfficeFormatError, match="malformed"):
        extract_docx_text(data)


def test_truncated_container_is_not_sniffed():
    whole = make_docx("<w:p><w:r><w:t>x</w:t></w:r></w:p>")
    # keep the zip magic, destroy the central directory
    assert sniff_office_kind(whole[: len(whole) // 2]) is None


def test_decode_lane_routes_office_docs(spark):
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        decode_text_members,
    )

    docx = make_docx("<w:p><w:r><w:t>docx body text</w:t></w:r></w:p>")
    odt = make_odt("<text:p>odt body text</text:p>")
    broken = _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "word/document.xml": b"<broken",
        }
    )
    plain_zip = _zip_bytes({"a.txt": b"not routed here"})
    df = spark.createDataFrame(
        [
            (1, bytearray(docx)),
            (2, bytearray(odt)),
            (3, bytearray(broken)),
            (4, bytearray(b"plain text payload")),
            (5, bytearray(plain_zip)),
        ],
        "id long, payload binary",
    )
    rows = {
        r["id"]: r for r in decode_text_members(df).collect()
    }
    assert rows[1]["text"] == "docx body text"
    assert rows[1]["charset"] == "docx"
    assert rows[1]["decode_ok"] is True
    assert rows[2]["text"] == "odt body text"
    assert rows[2]["charset"] == "odt"
    assert rows[3]["text"] is None
    assert rows[3]["charset"] == "docx"
    assert rows[3]["decode_ok"] is False
    assert rows[4]["text"] == "plain text payload"
    # a plain zip is NOT an office doc: falls through to the charset
    # lane (binary -> quarantine there), never charset='docx'
    assert rows[5]["charset"] not in ("docx", "odt")


def test_corpus_cli_extracts_docx_from_crawl(spark, tmp_path, capsys):
    """A WARC crawl carrying a DOCX response extracts its text into the
    corpus through the same command as HTML and PDF."""
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    body = (
        "the data in the table is the value of the row and the key of "
        "the batch while the line in the window is the part of the sort"
    )
    docx = make_docx(f"<w:p><w:r><w:t>{body}</w:t></w:r></w:p>")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/vnd."
        b"openxmlformats-officedocument.wordprocessingml.document\r\n"
        b"Content-Length: " + str(len(docx)).encode() + b"\r\n\r\n" + docx
    )
    rec = (
        (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: http://x.example/report.docx\r\n"
            "WARC-Date: 2026-08-14T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        + http
        + b"\r\n\r\n"
    )
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(gzip.compress(rec))
    out = str(tmp_path / "corpus")
    assert main(
        [
            "corpus",
            "--src",
            str(src / "*.warc.gz"),
            "--input-format",
            "warc",
            "--out",
            out,
            "--master",
            "local[4]",
        ]
    ) == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert body in rows[0]["text"]
    assert rows[0]["url"] == "http://x.example/report.docx"


_A = "http://schemas.openxmlformats.org/drawingml/2006/main"


def make_pptx(slides: list[str]) -> bytes:
    members = {"ppt/presentation.xml": b"<p:presentation/>"}
    for i, body in enumerate(slides, 1):
        members[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?><p:sld xmlns:p="pp" xmlns:a="{_A}">'
            f"<p:cSld>{body}</p:cSld></p:sld>"
        ).encode()
    return _zip_bytes(members)


def test_pptx_slides_extract_in_deck_order():
    from polygon_io_data_ingestion_pipeline_spark.multimodal.docx import (
        extract_pptx_text,
    )

    # write slide2 FIRST so member order differs from deck order
    members = {"ppt/presentation.xml": b"<p:presentation/>"}
    s2 = (
        f'<p:sld xmlns:p="pp" xmlns:a="{_A}"><a:p><a:r>'
        "<a:t>second slide</a:t></a:r></a:p></p:sld>"
    ).encode()
    s1 = (
        f'<p:sld xmlns:p="pp" xmlns:a="{_A}">'
        "<a:p><a:r><a:t>first</a:t></a:r><a:br/>"
        "<a:r><a:t>line</a:t></a:r></a:p></p:sld>"
    ).encode()
    members["ppt/slides/slide2.xml"] = s2
    members["ppt/slides/slide1.xml"] = s1
    data = _zip_bytes(members)
    assert sniff_office_kind(data) == "pptx"
    assert extract_pptx_text(data) == "first\nline\nsecond slide"


def test_pptx_through_decode_lane(spark):
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        decode_text_members,
    )

    data = make_pptx(["<a:p><a:r><a:t>deck text</a:t></a:r></a:p>"])
    df = spark.createDataFrame(
        [(1, bytearray(data))], "id long, payload binary"
    )
    row = decode_text_members(df).collect()[0]
    assert row["text"] == "deck text"
    assert row["charset"] == "pptx"
    assert row["decode_ok"] is True


def test_docx_textbox_alternatecontent_emits_text_once():
    """Regression: Word writes text boxes as mc:AlternateContent with a
    mc:Choice + mc:Fallback DUPLICATE of the same runs, and the boxed
    w:p nests inside the anchoring paragraph — naive iteration emitted
    the boxed text up to 4 times (Choice + Fallback, inline + as its
    own paragraph).  It must appear exactly once."""
    data = make_docx(
        "<w:p><w:r><w:t>anchor </w:t></w:r>"
        '<mc:AlternateContent xmlns:mc="m">'
        "<mc:Choice><w:drawing><w:txbxContent>"
        "<w:p><w:r><w:t>boxed</w:t></w:r></w:p>"
        "</w:txbxContent></w:drawing></mc:Choice>"
        "<mc:Fallback><w:pict>"
        "<w:p><w:r><w:t>boxed</w:t></w:r></w:p>"
        "</w:pict></mc:Fallback>"
        "</mc:AlternateContent></w:p>"
    )
    assert extract_docx_text(data) == "anchor boxed"


def test_ods_and_odp_are_not_text_documents():
    """Regression: ODS/ODP share the ODF container layout; the mimetype
    member's CONTENT must gate, or spreadsheets dump cells as prose."""
    ods = _zip_bytes(
        {
            "mimetype": b"application/vnd.oasis.opendocument.spreadsheet",
            "content.xml": b"<office:document-content/>",
        }
    )
    assert sniff_office_kind(ods) is None
    odp = _zip_bytes(
        {
            "mimetype": b"application/vnd.oasis.opendocument.presentation",
            "content.xml": b"<office:document-content/>",
        }
    )
    assert sniff_office_kind(odp) is None
