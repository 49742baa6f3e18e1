"""Structured spreadsheet extraction: XLSX and ODS -> typed cell rows.

The Office prose codecs (:mod:`.docx`) deliberately REFUSE spreadsheets
— dumping a grid's cells as running text poisons a text corpus (that
gate stays intact).  But the data itself is valuable to a training-data
pipeline as STRUCTURE: this module extracts workbooks into
``(sheet, row, col, value_type, value_string, value_num)`` rows — the
long-format frame every downstream tabular consumer (the datasheet
report card, table-QA corpus builders, schema profilers) wants.

Containers, pure stdlib (zipfile + ElementTree, like :mod:`.docx`):

- **XLSX** — sniffed by the ``xl/workbook.xml`` member.  Sheet names
  and order come from the workbook part, resolved to worksheet parts
  through ``xl/_rels/workbook.xml.rels`` (member NAMES are generator
  whim; the relationship graph is normative).  Shared strings
  (including rich-text runs), inline strings, booleans and numbers
  decode; dates stay as their serial numbers (type ``n`` — date-ness
  is a cell STYLE in xlsx, not a storage type).
- **ODS** — sniffed by the ODF ``mimetype`` member content
  (``opendocument.spreadsheet``), the same content-gate discipline the
  prose codec uses in reverse.  ``office:value-type`` drives typing;
  ``table:number-columns-repeated`` expands for VALUED cells (empty
  trailing repeats — LibreOffice pads to 2^14 columns — are skipped).
  Repeat bombs are bounded twice: each axis caps at ``_MAX_REPEAT``,
  and because rows-repeated × columns-repeated MULTIPLIES, a total
  per-workbook budget (``_MAX_CELLS``) quarantines any workbook whose
  valued expansion would exceed it — a <1 KB crafted ODS can otherwise
  demand ~2.7e8 tuples from one Python worker.
- **ODS error cells** fold into the formula skip count (an ODF error
  IS a formula result), so ``skipped_error`` is always 0 for ODS;
  xlsx reports the two classes separately.
- **XLS (BIFF8)** — sniffed by the OLE2 magic plus a Workbook-stream
  directory probe (a legacy ``.doc`` is the same container; the probe
  keeps prose out of the sheet lane).  Decoded by :mod:`.xls`
  (pure-stdlib CFB walk + BIFF8 records) into the SAME typed rows;
  FILEPASS-encrypted workbooks quarantine typed (round-12 ask #6).

**Formula and error cells are SKIPPED with accounting**, not emitted:
a formula's cached value is the producing application's claim, not
document content, and error literals (``#DIV/0!``) are noise.  The
per-workbook skip counts ride the output rows so the CLI can report
them without a second decode pass.

Spark lane: Arrow-batched ``mapInPandas`` (the one legitimate Python
stage — no JVM xlsx codec), one decode per payload; undecodable or
cell-less workbooks yield a single marker row (NULL sheet) carrying
``decode_ok`` and the skip accounting, so nothing silently vanishes.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SheetFormatError(ValueError):
    """Unsupported or corrupt workbook container."""


_ZIP_MAGIC = b"PK\x03\x04"
_ODS_MIME = b"application/vnd.oasis.opendocument.spreadsheet"

#: cap on expanding table:number-columns-repeated for VALUED cells —
#: xlsx's own column limit; repeats past it are generator padding
_MAX_REPEAT = 16384

#: cap on TOTAL emitted cells per workbook. The per-axis repeat cap is
#: not enough on its own: rows-repeated × columns-repeated multiplies
#: (16384² ≈ 2.7e8 tuples from a <1 KB crafted ODS on the untrusted
#: WARC lane — an executor-OOM vector). A workbook that exceeds the
#: budget quarantines via SheetFormatError rather than truncating, so
#: downstream accounting never sees a silently partial sheet.
_MAX_CELLS = 1_000_000


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def sniff_sheet_kind(data: bytes) -> str | None:
    """'xlsx' / 'ods' / 'xls' when the payload is a workbook container,
    else None (plain zips, prose Office documents, non-Workbook OLE2
    compound files and corrupt containers fall through to their own
    lanes)."""
    from .xls import CFB_MAGIC, cfb_has_stream

    if data.startswith(CFB_MAGIC):
        # legacy BIFF8: an OLE2 compound file CONTAINING a Workbook
        # stream (a .doc is also CFB — the directory probe is the
        # gate); directory-only, never materializes the stream
        return "xls" if cfb_has_stream(data) else None
    if not data.startswith(_ZIP_MAGIC):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return _kind_from_zip(zf)
    except Exception:
        return None


def _kind_from_zip(zf: zipfile.ZipFile) -> str | None:
    names = set(zf.namelist())
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "content.xml" in names and "mimetype" in names:
        try:
            if zf.read("mimetype").strip() == _ODS_MIME:
                return "ods"
        except Exception:
            return None
    return None


def _xml(zf: zipfile.ZipFile, member: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(zf.read(member))
    except KeyError as e:
        raise SheetFormatError(f"missing container member: {e}") from e
    except ElementTree.ParseError as e:
        raise SheetFormatError(f"malformed workbook XML: {e}") from e


#: extraction result: (cells, n_skipped_formula, n_skipped_error);
#: cell = (sheet, row, col, value_type, value_string, value_num)
Cells = tuple[list[tuple], int, int]

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = _xml(zf, "xl/sharedStrings.xml")  # ParseError -> typed quarantine
    out: list[str] = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        # plain <t> or rich-text <r><t> runs, concatenated in order
        out.append(
            "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
        )
    return out


#: built-in numFmtIds that are date/time formats (ECMA-376 §18.8.30:
#: 14-22 dates/datetimes, 27-36 era/locale dates, 45-47 times,
#: 50-58 locale datetimes)
_BUILTIN_DATE_FMTS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + [45, 46, 47]
    + list(range(50, 59))
)


def _is_date_format(code: str) -> bool:
    """A custom number-format CODE is a date/time format when it uses
    date tokens (y/m/d/h/s) OUTSIDE quoted literals, [brackets] and
    backslash escapes — the standard heuristic every reader uses
    (m is ambiguous month/minute; either way the cell is temporal)."""
    out = []
    i, n = 0, len(code)
    while i < n:
        ch = code[i]
        if ch == '"':
            j = code.find('"', i + 1)
            i = n if j < 0 else j + 1
        elif ch == "[":
            j = code.find("]", i + 1)
            i = n if j < 0 else j + 1
        elif ch == "\\":
            i += 2
        else:
            out.append(ch)
            i += 1
    return bool(re.search(r"[ymdhsYMDHS]", "".join(out)))


def _date_styles(zf: zipfile.ZipFile) -> set[int]:
    """Indices into cellXfs (what a cell's ``s=`` attribute references)
    whose number format is a date/time — built-in ids plus custom
    formatCodes that pass :func:`_is_date_format`."""
    if "xl/styles.xml" not in zf.namelist():
        return set()
    # _xml, not raw fromstring: a corrupt styles part must quarantine
    # typed (ParseError subclasses SyntaxError, which no caller catches)
    root = _xml(zf, "xl/styles.xml")
    custom_date_ids = {
        int(nf.get("numFmtId"))
        for nf in root.iter()
        if _local(nf.tag) == "numFmt"
        and nf.get("numFmtId")
        and _is_date_format(nf.get("formatCode") or "")
    }
    date_ids = _BUILTIN_DATE_FMTS | custom_date_ids
    out: set[int] = set()
    for el in root.iter():
        if _local(el.tag) != "cellXfs":
            continue
        for i, xf in enumerate(x for x in el if _local(x.tag) == "xf"):
            fid = xf.get("numFmtId")
            if fid is not None and int(fid) in date_ids:
                out.add(i)
        break
    return out


def _serial_to_iso(serial: float) -> str:
    """Excel 1900-system serial -> ISO date / datetime string.  Base
    1899-12-30 (the standard library convention, correct for every
    serial >= 61; the Lotus 1900 leap-bug window of Jan-Feb 1900 is off
    by one in Excel ITSELF — readers uniformly pick this base).  A pure
    date (integral serial) renders date-only; fractions render seconds
    rounded to the nearest second."""
    import datetime as _dt

    base = _dt.datetime(1899, 12, 30)
    secs = round(serial * 86400)
    dt = base + _dt.timedelta(seconds=secs)
    if secs % 86400 == 0:
        return dt.date().isoformat()
    return dt.isoformat(sep="T")


def _xlsx_cells(zf: zipfile.ZipFile) -> Cells:
    wb = _xml(zf, "xl/workbook.xml")
    # r:id -> worksheet member via the rels part (names are generator
    # whim; the relationship graph is the normative mapping)
    rels = {}
    if "xl/_rels/workbook.xml.rels" in zf.namelist():
        for rel in _xml(zf, "xl/_rels/workbook.xml.rels"):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            rels[rel.get("Id")] = target
    sheets: list[tuple[str, str]] = []
    for el in wb.iter():
        if _local(el.tag) != "sheet":
            continue
        rid = next(
            (v for k, v in el.attrib.items() if _local(k) == "id"), None
        )
        member = rels.get(rid)
        if member is None:
            raise SheetFormatError(f"sheet {el.get('name')!r} has no part")
        sheets.append((el.get("name") or "", member))
    shared = _shared_strings(zf)
    date_styles = _date_styles(zf)
    cells: list[tuple] = []
    n_formula = n_error = 0
    for sheet_name, member in sheets:
        root = _xml(zf, member)
        row_iter = (
            el for el in root.iter() if _local(el.tag) in ("row", "c")
        )
        # position inference: ECMA-376 makes both row@r and c@r OPTIONAL
        # (streaming writers omit them; readers infer sequentially) —
        # a missing reference must not silently drop the cell
        cur_row = 0
        cur_col = 0
        for el in row_iter:
            if _local(el.tag) == "row":
                r_attr = el.get("r")
                cur_row = int(r_attr) if r_attr else cur_row + 1
                cur_col = 0
                continue
            # xlsx cells are explicit (no repeat multiplier), but a
            # high-ratio zip member can still inflate — same budget,
            # checked PER CELL (a single-row sheet never re-enters the
            # row branch — round-12 review finding)
            if len(cells) >= _MAX_CELLS:
                raise SheetFormatError(
                    f"cell budget exceeded (> {_MAX_CELLS} cells)"
                )
            c = el
            ref = c.get("r") or ""
            m = _CELL_REF_RE.fullmatch(ref)
            if m is not None:
                col, row = _col_index(m.group(1)), int(m.group(2))
            else:
                col, row = cur_col + 1, cur_row
            cur_col = col
            ctype = c.get("t") or "n"
            has_formula = any(_local(ch.tag) == "f" for ch in c)
            if has_formula or ctype == "str":
                # 'str' is a formula's cached STRING result — same claim
                n_formula += 1
                continue
            if ctype == "e":
                n_error += 1
                continue
            v = next((ch for ch in c if _local(ch.tag) == "v"), None)
            if ctype == "inlineStr":
                text = "".join(
                    t.text or "" for t in c.iter() if _local(t.tag) == "t"
                )
                cells.append((sheet_name, row, col, "s", text, None))
            elif ctype == "s":
                if v is None or v.text is None:
                    continue
                idx = int(v.text)
                if not 0 <= idx < len(shared):
                    raise SheetFormatError(f"shared string {idx} out of range")
                cells.append((sheet_name, row, col, "s", shared[idx], None))
            elif ctype == "b":
                if v is None or v.text is None:
                    continue
                cells.append(
                    (sheet_name, row, col, "b", v.text.strip(),
                     float(int(v.text.strip() != "0")))
                )
            else:  # 'n' — numbers; DATE-styled numbers type 'd'
                if v is None or v.text is None:
                    continue
                raw = v.text.strip()
                s_attr = c.get("s")
                iso = None
                if s_attr is not None and int(s_attr) in date_styles:
                    # a date is a STYLE in xlsx, not a storage type:
                    # surface it typed (ISO string, serial kept as
                    # value_num) so it converges with ODS date cells.
                    # Junk styled as a date (a phone number, 1e999)
                    # overflows the calendar — keep it an honest NUMBER
                    # rather than failing the workbook
                    try:
                        iso = _serial_to_iso(float(raw))
                    except (OverflowError, ValueError, OSError):
                        iso = None
                if iso is not None:
                    cells.append(
                        (sheet_name, row, col, "d", iso, float(raw))
                    )
                else:
                    cells.append((sheet_name, row, col, "n", raw, float(raw)))
    return cells, n_formula, n_error


_ODS_TYPE = {"float": "n", "percentage": "n", "currency": "n",
             "boolean": "b", "string": "s", "date": "d", "time": "d"}


def _ods_cells(zf: zipfile.ZipFile) -> Cells:
    root = _xml(zf, "content.xml")
    cells: list[tuple] = []
    n_formula = n_error = 0
    for tbl in root.iter():
        if _local(tbl.tag) != "table":
            continue
        sheet_name = next(
            (v for k, v in tbl.attrib.items() if _local(k) == "name"), ""
        )
        row_no = 0
        for tr in tbl:
            if _local(tr.tag) != "table-row":
                continue
            row_rep = int(
                next((v for k, v in tr.attrib.items()
                      if _local(k) == "number-rows-repeated"), 1)
            )
            row_no += 1
            col_no = 0
            row_cells: list[tuple] = []
            for tc in tr:
                tag = _local(tc.tag)
                if tag not in ("table-cell", "covered-table-cell"):
                    continue
                rep = int(
                    next((v for k, v in tc.attrib.items()
                          if _local(k) == "number-columns-repeated"), 1)
                )
                attrs = {_local(k): v for k, v in tc.attrib.items()}
                if tag == "covered-table-cell" or "value-type" not in attrs:
                    col_no += rep  # merged shadows / empty padding: skip
                    continue
                if "formula" in attrs:
                    # ODS error cells are formula cells too (an error
                    # IS a formula result in ODF) — they fold into
                    # n_formula, so skipped_error is always 0 for ODS;
                    # count per EMITTED copy with BOTH repeats capped,
                    # mirroring the valued-cell emission caps, so a
                    # crafted number-columns-repeated cannot inflate
                    # the accounting past what emission would allow
                    n_formula += min(rep, _MAX_REPEAT) * min(row_rep, _MAX_REPEAT)
                    col_no += rep
                    continue
                vtype = _ODS_TYPE.get(attrs["value-type"])
                if vtype is None:
                    col_no += rep
                    continue
                text = "".join(
                    "".join(p.itertext())
                    for p in tc
                    if _local(p.tag) == "p"
                )
                if vtype == "n":
                    raw = attrs.get("value", text)
                    val = (raw, float(raw))
                elif vtype == "b":
                    raw = attrs.get("boolean-value", text)
                    val = (raw, float(raw == "true"))
                elif vtype == "d":
                    raw = attrs.get("date-value") or attrs.get(
                        "time-value", text
                    )
                    val = (raw, None)
                else:
                    val = (text, None)
                # budget check INSIDE the per-cell loop: one row with
                # many repeated valued cells accumulates row_cells
                # before the row-level check would ever run (round-12
                # review finding — the within-row half of the bomb)
                if (
                    len(cells) + len(row_cells) + min(rep, _MAX_REPEAT)
                    > _MAX_CELLS
                ):
                    raise SheetFormatError(
                        f"cell budget exceeded (> {_MAX_CELLS} cells)"
                    )
                for i in range(min(rep, _MAX_REPEAT)):
                    row_cells.append((col_no + 1 + i, vtype) + val)
                col_no += rep
            # number-rows-repeated EXPANDS valued rows (dropping the
            # repeated copies would silently lose data — the column
            # repeat expands, so must this one), same cap discipline;
            # the total budget guards the rep×row_rep PRODUCT the
            # per-axis caps cannot
            n_expand = min(row_rep, _MAX_REPEAT) * len(row_cells)
            if len(cells) + n_expand > _MAX_CELLS:
                raise SheetFormatError(
                    f"cell budget exceeded (> {_MAX_CELLS} cells)"
                )
            for rr in range(min(row_rep, _MAX_REPEAT)):
                for col1, vtype, vs, vn in row_cells:
                    cells.append((sheet_name, row_no + rr, col1, vtype, vs, vn))
            row_no += row_rep - 1
    return cells, n_formula, n_error


def extract_sheet_cells(data: bytes) -> tuple[str, Cells]:
    """(kind, (cells, skipped_formula, skipped_error)) for an XLSX or
    ODS payload; raises :class:`SheetFormatError` for anything else
    (including prose Office documents — those belong to the text lane)."""
    from struct import error as _struct_error

    from .xls import CFB_MAGIC, xls_cells

    if data.startswith(CFB_MAGIC):
        # legacy BIFF8 (.xls) — round-12 ask #6; FILEPASS-encrypted
        # workbooks and malformed containers quarantine typed here
        try:
            return "xls", xls_cells(data)
        except (ValueError, IndexError, KeyError, _struct_error) as e:
            raise SheetFormatError(f"corrupt xls workbook: {e}") from e
    if not data.startswith(_ZIP_MAGIC):
        raise SheetFormatError("not a zip container")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception as e:
        raise SheetFormatError(f"unreadable container: {e}") from e
    with zf:
        kind = _kind_from_zip(zf)
        if kind is None:
            raise SheetFormatError("not an XLSX/ODS workbook")
        try:
            return kind, (_xlsx_cells if kind == "xlsx" else _ods_cells)(zf)
        except (ValueError, IndexError) as e:
            raise SheetFormatError(f"corrupt {kind} workbook: {e}") from e


def _col_letters(col: int) -> str:
    out = ""
    while col > 0:
        col, rem = divmod(col - 1, 26)
        out = chr(65 + rem) + out
    return out


#: fixture/test cell spec: (row, col, type, value) with type in
#: n(umber) / s(tring) / b(ool) / f(ormula -> skipped) / e(rror -> skipped)
def build_xlsx(cells: list[tuple], sheet: str = "S") -> bytes:
    """Minimal spec-legal single-sheet XLSX — the fixture/test encoder
    (shared strings for 's' cells, a cached <v> for formulas, real
    rels), exact inverse of the extractor on its supported surface."""
    shared: list[str] = []
    by_row: dict[int, list[tuple]] = {}
    for row, col, t, v in cells:
        by_row.setdefault(row, []).append((col, t, v))
    body = []
    for row in sorted(by_row):
        cs = []
        for col, t, v in sorted(by_row[row]):
            ref = f"{_col_letters(col)}{row}"
            if t == "n":
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
            elif t == "s":
                if v not in shared:
                    shared.append(v)
                cs.append(
                    f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
                )
            elif t == "b":
                cs.append(f'<c r="{ref}" t="b"><v>{int(bool(v))}</v></c>')
            elif t == "d":  # value = 1900-system serial; styled as date
                cs.append(f'<c r="{ref}" s="1"><v>{v}</v></c>')
            elif t == "f":
                cs.append(f'<c r="{ref}"><f>1+1</f><v>{v}</v></c>')
            else:  # error
                cs.append(f'<c r="{ref}" t="e"><v>{v}</v></c>')
        body.append(f'<row r="{row}">' + "".join(cs) + "</row>")
    ws = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main"><sheetData>'
        + "".join(body) + "</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        f'<sheet name="{sheet}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
        'xmlformats.org/package/2006/relationships"><Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats'
        '.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>"
    )
    styles = (
        '<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main"><cellXfs count="2">'
        '<xf numFmtId="0"/><xf numFmtId="14"/></cellXfs></styleSheet>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", ws)
        if any(t == "d" for _r, _c, t, _v in cells):
            zf.writestr("xl/styles.xml", styles)
        if shared:
            zf.writestr("xl/sharedStrings.xml", sst)
    return buf.getvalue()


def build_ods(cells: list[tuple], sheet: str = "S") -> bytes:
    """Minimal single-sheet ODS fixture encoder (formula AND error
    cells both carry table:formula — ODS's one skipped class)."""
    by_row: dict[int, dict[int, tuple]] = {}
    for row, col, t, v in cells:
        by_row.setdefault(row, {})[col] = (t, v)
    rows_xml = []
    for row in range(1, max(by_row, default=0) + 1):
        cs = []
        for col in range(1, max(by_row.get(row, {0: None}), default=0) + 1):
            spec = by_row.get(row, {}).get(col)
            if spec is None:
                cs.append("<table:table-cell/>")
                continue
            t, v = spec
            if t == "n":
                cs.append(
                    f'<table:table-cell office:value-type="float" '
                    f'office:value="{v}"><text:p>{v}</text:p>'
                    "</table:table-cell>"
                )
            elif t == "s":
                cs.append(
                    '<table:table-cell office:value-type="string">'
                    f"<text:p>{v}</text:p></table:table-cell>"
                )
            elif t == "b":
                bv = "true" if v else "false"
                cs.append(
                    f'<table:table-cell office:value-type="boolean" '
                    f'office:boolean-value="{bv}"><text:p>{bv}</text:p>'
                    "</table:table-cell>"
                )
            elif t == "d":  # value = ISO date string
                cs.append(
                    f'<table:table-cell office:value-type="date" '
                    f'office:date-value="{v}"><text:p>{v}</text:p>'
                    "</table:table-cell>"
                )
            else:  # formula or error: both carry table:formula
                cs.append(
                    f'<table:table-cell table:formula="of:=1+1" '
                    f'office:value-type="float" office:value="{0}">'
                    f"<text:p>{v}</text:p></table:table-cell>"
                )
        rows_xml.append(
            "<table:table-row>" + "".join(cs) + "</table:table-row>"
        )
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="{sheet}">'
        + "".join(rows_xml)
        + "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", _ODS_MIME)
        zf.writestr("content.xml", content)
    return buf.getvalue()


#: mapInPandas output schema — cell rows plus a NULL-sheet marker row
#: per workbook carrying decode_ok and the skip accounting
SHEET_CELLS_SCHEMA = (
    "sheet string, row int, col int, value_type string, "
    "value_string string, value_num double, kind string, "
    "skipped_formula int, skipped_error int, decode_ok boolean"
)


def sheet_cells(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Workbook payloads -> typed cell rows (one decode pass).  The
    formula/error skip counts and the container kind ride every cell
    row; a workbook that decodes to ZERO cells (all formulas, empty) or
    fails to decode emits one marker row (``sheet`` NULL, ``decode_ok``
    honest) so nothing silently vanishes at 100 TB.  Filter
    ``sheet IS NOT NULL`` for the pure cell frame."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[tuple] = []
            for rid, p in zip(batch[id_col], batch[payload_col]):
                try:
                    if p is None:
                        raise SheetFormatError("null payload")
                    kind, (cells, nf, ne) = extract_sheet_cells(bytes(p))
                except SheetFormatError:
                    rows.append(
                        (rid, None, None, None, None, None, None, None,
                         0, 0, False)
                    )
                    continue
                for sheet, row, col, vt, vs, vn in cells:
                    rows.append(
                        (rid, sheet, row, col, vt, vs, vn, kind, nf, ne, True)
                    )
                if not cells:
                    # cell-less decode still surfaces (marker row): the
                    # skip accounting must not vanish with the cells
                    rows.append(
                        (rid, None, None, None, None, None, None, kind,
                         nf, ne, True)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sheet", "row", "col", "value_type",
                    "value_string", "value_num", "kind",
                    "skipped_formula", "skipped_error", "decode_ok",
                ],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, " + SHEET_CELLS_SCHEMA
    )
