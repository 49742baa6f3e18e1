"""Structured spreadsheet extraction (multimodal/sheet.py): XLSX and
ODS workbooks round-trip to identical typed cell rows, formula/error
cells skip with accounting, the prose gate stays intact, repeats and
merges behave, and the sheetcells CLI reports honestly."""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.sheet import (
    SheetFormatError,
    build_ods,
    build_xlsx,
    extract_sheet_cells,
    sheet_cells,
    sniff_sheet_kind,
)

SPEC = [
    (1, 1, "n", 17), (1, 2, "s", "alpha"),
    (2, 1, "n", 42.5), (2, 2, "s", "beta"),
    (3, 1, "f", 99), (3, 2, "e", "#DIV/0!"),
]
WANT_CELLS = [
    ("S", 1, 1, "n", "17", 17.0),
    ("S", 1, 2, "s", "alpha", None),
    ("S", 2, 1, "n", "42.5", 42.5),
    ("S", 2, 2, "s", "beta", None),
]


def test_xlsx_and_ods_converge_on_identical_typed_rows():
    kx, (cx, nfx, nex) = extract_sheet_cells(build_xlsx(SPEC))
    ko, (co, nfo, neo) = extract_sheet_cells(build_ods(SPEC))
    assert (kx, ko) == ("xlsx", "ods")
    assert cx == WANT_CELLS and co == WANT_CELLS
    # xlsx distinguishes error cells; ODS errors are formula cells
    assert (nfx, nex) == (1, 1)
    assert (nfo, neo) == (2, 0)


def test_booleans_and_shared_string_reuse():
    spec = [(1, 1, "b", True), (1, 2, "s", "x"), (2, 2, "s", "x")]
    _, (cells, _, _) = extract_sheet_cells(build_xlsx(spec))
    assert cells == [
        ("S", 1, 1, "b", "1", 1.0),
        ("S", 1, 2, "s", "x", None),
        ("S", 2, 2, "s", "x", None),
    ]
    _, (ocells, _, _) = extract_sheet_cells(build_ods(spec))
    assert ocells[0] == ("S", 1, 1, "b", "true", 1.0)


def test_ods_repeats_and_covered_cells():
    """number-columns-repeated expands VALUED cells; covered (merged)
    and empty repeated cells advance the grid without emitting — the
    LibreOffice trailing-repeat padding never explodes into rows."""
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="R">'
        "<table:table-row>"
        '<table:table-cell table:number-columns-repeated="1000"/>'
        '<table:table-cell office:value-type="float" office:value="7" '
        'table:number-columns-repeated="3"><text:p>7</text:p>'
        "</table:table-cell>"
        "<table:covered-table-cell/>"
        '<table:table-cell office:value-type="string">'
        "<text:p>end</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "mimetype", b"application/vnd.oasis.opendocument.spreadsheet"
        )
        zf.writestr("content.xml", content)
    _, (cells, _, _) = extract_sheet_cells(buf.getvalue())
    assert cells == [
        ("R", 1, 1001, "n", "7", 7.0),
        ("R", 1, 1002, "n", "7", 7.0),
        ("R", 1, 1003, "n", "7", 7.0),
        ("R", 1, 1005, "s", "end", None),
    ]


def test_prose_gate_stays_intact():
    """Workbook containers never reach the text lane, and prose
    containers never reach the sheet lane — the two sniffers partition
    the Office space."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.docx import (
        sniff_office_kind,
        try_extract_office,
    )

    wb = build_ods(SPEC)
    assert sniff_office_kind(wb) is None  # ODS is NOT prose
    assert try_extract_office(wb) is None
    assert sniff_sheet_kind(wb) == "ods"
    xl = build_xlsx(SPEC)
    assert sniff_office_kind(xl) is None
    assert sniff_sheet_kind(xl) == "xlsx"
    # and the reverse: a DOCX is not a workbook
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<d/>")
    assert sniff_sheet_kind(buf.getvalue()) is None
    with pytest.raises(SheetFormatError, match="not an XLSX/ODS"):
        extract_sheet_cells(buf.getvalue())


def test_spark_lane_markers_and_quarantine(spark):
    """sheet_cells: cell rows carry kind + skip accounting; an
    all-formula workbook surfaces as a marker row; garbage quarantines
    with decode_ok=false."""
    rows = [
        (1, bytearray(build_xlsx(SPEC))),
        (2, bytearray(build_xlsx([(1, 1, "f", 5)]))),
        (3, bytearray(b"not a workbook")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = sheet_cells(df).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    cells1 = [r for r in by_id[1] if r["sheet"] is not None]
    assert len(cells1) == 4
    assert all(
        (r["kind"], r["skipped_formula"], r["skipped_error"]) == ("xlsx", 1, 1)
        for r in cells1
    )
    [m2] = by_id[2]
    assert (m2["sheet"], m2["kind"], m2["skipped_formula"], m2["decode_ok"]) == (
        None, "xlsx", 1, True
    )
    [m3] = by_id[3]
    assert (m3["sheet"], m3["kind"], m3["decode_ok"]) == (None, None, False)


def test_sheetcells_cli_journey(spark, tmp_path, capsys):
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    rows = [
        (1, bytearray(build_xlsx(SPEC))),
        (2, bytearray(build_ods(SPEC))),
        (3, bytearray(b"garbage")),
    ]
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(src)
    out = str(tmp_path / "out")
    assert main(["sheetcells", "--src", src, "--out", out,
                 "--master", "local[4]"]) == 0
    msg = capsys.readouterr().out
    assert ("workbooks=3 decoded=2 quarantined=1 cells=8 "
            "skipped_formula=3 skipped_error=1") in msg
    cells = spark.read.parquet(out + "/cells").collect()
    assert len(cells) == 8
    assert {r["value_string"] for r in cells} == {"17", "42.5", "alpha", "beta"}


def test_ods_row_repeats_expand_and_account():
    """table:number-rows-repeated on a VALUED row expands its cells
    (dropping the copies would silently lose data, violating the
    nothing-vanishes contract) and formula skips count per emitted row
    copy (round-11 review finding)."""
    import io
    import zipfile

    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="R">'
        '<table:table-row table:number-rows-repeated="3">'
        '<table:table-cell office:value-type="float" office:value="7">'
        "<text:p>7</text:p></table:table-cell>"
        '<table:table-cell table:formula="of:=1+1" '
        'office:value-type="float" office:value="2">'
        "<text:p>2</text:p></table:table-cell>"
        "</table:table-row>"
        '<table:table-cell/>'
        "<table:table-row>"
        '<table:table-cell office:value-type="string">'
        "<text:p>after</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "mimetype", b"application/vnd.oasis.opendocument.spreadsheet"
        )
        zf.writestr("content.xml", content)
    _, (cells, nf, ne) = extract_sheet_cells(buf.getvalue())
    assert cells == [
        ("R", 1, 1, "n", "7", 7.0),
        ("R", 2, 1, "n", "7", 7.0),
        ("R", 3, 1, "n", "7", 7.0),
        ("R", 4, 1, "s", "after", None),
    ]
    assert (nf, ne) == (3, 0)  # the formula skipped once per row copy


def test_xlsx_cells_without_r_attribute_infer_position():
    """ECMA-376 makes both row@r and c@r optional (streaming writers
    omit them) — cells must extract by sequential position inference,
    never silently drop (round-11 review finding)."""
    import io
    import zipfile

    ws = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main"><sheetData>'
        "<row><c><v>5</v></c><c><v>6</v></c></row>"
        '<row r="5"><c r="B5"><v>7</v></c><c><v>8</v></c></row>'
        "<row><c><v>9</v></c></row>"
        "</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
        'xmlformats.org/package/2006/relationships"><Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", ws)
    _, (cells, _, _) = extract_sheet_cells(buf.getvalue())
    assert cells == [
        ("S", 1, 1, "n", "5", 5.0),
        ("S", 1, 2, "n", "6", 6.0),
        ("S", 5, 2, "n", "7", 7.0),
        ("S", 5, 3, "n", "8", 8.0),
        ("S", 6, 1, "n", "9", 9.0),
    ]


def test_sheetcells_cli_warc_lane(spark, tmp_path, capsys):
    """Crawl -> cell extraction directly: zip-magic responses from WARC
    files extract (content sniff is authoritative — servers label
    workbooks octet-stream constantly); a plain zip quarantines; HTML
    is never considered; the media/ mapping resolves cells back to
    URLs."""
    import gzip
    import io
    import zipfile

    from polygon_io_data_ingestion_pipeline_spark.cli import main

    def _rec(url, body, ctype):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
            + b"\r\nContent-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    plain_zip = io.BytesIO()
    with zipfile.ZipFile(plain_zip, "w") as zf:
        zf.writestr("readme.txt", "not a workbook")
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    recs = [
        # mislabeled octet-stream: the content sniff must still take it
        _rec("http://a.x/q.xlsx", build_xlsx(SPEC), b"application/octet-stream"),
        _rec("http://a.x/q.ods", build_ods(SPEC),
             b"application/vnd.oasis.opendocument.spreadsheet"),
        _rec("http://a.x/archive.zip", plain_zip.getvalue(), b"application/zip"),
        _rec("http://a.x/page", b"<html><body>hi</body></html>", b"text/html"),
    ]
    (crawl / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    out = str(tmp_path / "cells_out")
    assert main([
        "sheetcells", "--src", str(crawl / "*.warc.gz"), "--out", out,
        "--input-format", "warc", "--master", "local[4]",
    ]) == 0
    text = capsys.readouterr().out
    assert "workbooks=3 decoded=2 quarantined=1 cells=8" in text
    urls = {r["media_id"]: r["url"]
            for r in spark.read.parquet(out + "/media").collect()}
    by_url = {}
    for r in spark.read.parquet(out + "/cells").collect():
        by_url.setdefault(urls[r["media_id"]], []).append(r)
    assert set(by_url) == {"http://a.x/q.xlsx", "http://a.x/q.ods"}
    assert all(len(v) == 4 for v in by_url.values())
    # id/payload overrides are a usage error with the warc lane
    assert main([
        "sheetcells", "--src", str(crawl / "*.warc.gz"), "--out", out,
        "--input-format", "warc", "--id-col", "x",
    ]) == 2


def test_xlsx_dates_surface_typed_and_converge_with_ods():
    """A date in xlsx is a STYLE over a 1900-system serial, not a
    storage type — date-styled numbers surface as value_type 'd' with
    an ISO value_string (serial kept in value_num), converging with
    ODS date cells on (sheet,row,col,type,string); custom numFmt codes
    with date tokens outside quotes/brackets count, number formats do
    not."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.sheet import (
        _is_date_format,
        _serial_to_iso,
    )

    # serial 45000 = 2023-03-15; 45000.5 adds 12:00:00
    _, (xc, _, _) = extract_sheet_cells(build_xlsx([
        (1, 1, "d", 45000), (1, 2, "n", 45000), (2, 1, "d", 45000.5),
    ]))
    assert xc == [
        ("S", 1, 1, "d", "2023-03-15", 45000.0),
        ("S", 1, 2, "n", "45000", 45000.0),  # unstyled: stays a number
        ("S", 2, 1, "d", "2023-03-15T12:00:00", 45000.5),
    ]
    _, (oc, _, _) = extract_sheet_cells(build_ods([(1, 1, "d", "2023-03-15")]))
    assert oc[0][:5] == xc[0][:5]  # cross-format convergence (no serial in ODS)

    assert _is_date_format("yyyy-mm-dd")
    assert _is_date_format("[red]dd/mm")
    assert not _is_date_format('0.00"m"')  # quoted literal m is not a token
    assert not _is_date_format("#,##0.00")
    assert _serial_to_iso(60) == "1900-02-28"  # the documented base convention


def test_junk_styled_dates_and_corrupt_styles_quarantine_typed():
    """Review findings: a phone number styled as a date overflows the
    calendar — it stays an honest NUMBER instead of failing the
    workbook; a corrupt styles.xml quarantines typed (ParseError
    subclasses SyntaxError, which no except clause caught)."""
    import io
    import zipfile

    _, (cells, _, _) = extract_sheet_cells(build_xlsx([
        (1, 1, "d", 15551234567), (1, 2, "d", 45000),
    ]))
    assert cells == [
        ("S", 1, 1, "n", "15551234567", 15551234567.0),
        ("S", 1, 2, "d", "2023-03-15", 45000.0),
    ]

    # corrupt styles part -> SheetFormatError (so the Spark lane emits
    # a quarantine marker, not a task failure)
    good = build_xlsx([(1, 1, "d", 45000)])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(good)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            dst.writestr(
                name,
                b"<styleSheet" if name == "xl/styles.xml" else src.read(name),
            )
    with pytest.raises(SheetFormatError, match="malformed"):
        extract_sheet_cells(buf.getvalue())
    # and through the Spark lane: marker row, decode_ok false
    import pyspark.sql  # noqa: F401  (spark fixture used below)


def test_corrupt_styles_spark_lane_quarantines(spark):
    import io
    import zipfile

    good = build_xlsx([(1, 1, "d", 45000)])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(good)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            dst.writestr(
                name,
                b"<styleSheet" if name == "xl/styles.xml" else src.read(name),
            )
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    [row] = sheet_cells(df).collect()
    assert (row["sheet"], row["decode_ok"]) == (None, False)


def _ods_payload(body: str) -> bytes:
    import io
    import zipfile

    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="R">{body}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "mimetype", b"application/vnd.oasis.opendocument.spreadsheet"
        )
        zf.writestr("content.xml", content)
    return buf.getvalue()


def test_repeat_product_bomb_quarantines():
    """Round-11 advisor finding: number-rows-repeated and
    number-columns-repeated are each capped at 16384, but their PRODUCT
    is not — a <1 KB crafted ODS from the untrusted WARC lane can
    demand ~2.7e8 cell tuples in one Python worker.  The per-workbook
    cell budget must quarantine it (SheetFormatError), never emit."""
    bomb = _ods_payload(
        '<table:table-row table:number-rows-repeated="16384">'
        '<table:table-cell office:value-type="float" office:value="7" '
        'table:number-columns-repeated="16384"><text:p>7</text:p>'
        "</table:table-cell></table:table-row>"
    )
    assert len(bomb) < 1024
    with pytest.raises(SheetFormatError, match="cell budget"):
        extract_sheet_cells(bomb)


def test_repeat_product_bomb_spark_lane_quarantines(spark):
    bomb = _ods_payload(
        '<table:table-row table:number-rows-repeated="16384">'
        '<table:table-cell office:value-type="float" office:value="7" '
        'table:number-columns-repeated="16384"><text:p>7</text:p>'
        "</table:table-cell></table:table-row>"
    )
    df = spark.createDataFrame(
        [(1, bytearray(bomb))], "media_id long, payload binary"
    )
    [row] = sheet_cells(df).collect()
    assert (row["sheet"], row["decode_ok"]) == (None, False)


def test_formula_accounting_caps_column_repeat():
    """The formula skip count must apply the SAME per-axis cap as
    valued-cell emission — a crafted number-columns-repeated must not
    inflate skipped_formula past what emission would allow (round-11
    advisor finding); ODS error cells fold into the formula class by
    design (an ODF error IS a formula result), so skipped_error
    stays 0."""
    wb = _ods_payload(
        '<table:table-row table:number-rows-repeated="2">'
        '<table:table-cell table:formula="of:=1/0" '
        'office:value-type="float" office:value="0" '
        'table:number-columns-repeated="999999999">'
        "<text:p>#DIV/0!</text:p></table:table-cell>"
        "</table:table-row>"
        "<table:table-row>"
        '<table:table-cell office:value-type="string">'
        "<text:p>after</text:p></table:table-cell>"
        "</table:table-row>"
    )
    _, (cells, nf, ne) = extract_sheet_cells(wb)
    assert cells == [("R", 3, 1, "s", "after", None)]
    assert (nf, ne) == (16384 * 2, 0)
