"""Office document text extraction, pure stdlib — DOCX (OOXML
WordprocessingML), PPTX (PresentationML) and ODT (OpenDocument Text),
the word-processor/slide formats a real crawl carries after HTML and
PDF.  All are ZIP containers of XML, so the whole codec is ``zipfile``
+ ``xml.etree.ElementTree``; no external library.

Surface:

- **DOCX**: ``word/document.xml`` walked in document order — ``w:p``
  paragraphs (one output line each; covers table cells too, since
  ``w:tc`` contains its own ``w:p``), ``w:t`` text runs (including
  ``xml:space="preserve"`` whitespace runs), ``w:tab`` as a tab,
  ``w:br``/``w:cr`` as in-paragraph line breaks.  Namespace handling is
  by local tag name, so documents using a non-standard prefix (or the
  strict-OOXML namespace) extract identically.
- **PPTX**: ``ppt/slides/slideN.xml`` in numeric deck order (zip
  member order is generator-dependent) — one line per ``a:p``
  paragraph of each shape, ``a:br`` expanded; notes/masters are chrome
  and skipped.
- **ODT**: ``content.xml`` — ``text:p`` and ``text:h`` blocks in
  order, with ``text:s`` (run-length encoded spaces, ``text:c``
  count), ``text:tab`` and ``text:line-break`` expanded; nested spans
  and hyperlinks contribute their text via document-order iteration.

Sniffing lives in :func:`looks_like_office_doc`: payloads starting
with the ZIP magic whose archive carries ``word/document.xml`` (DOCX)
or an ODF ``mimetype``/``content.xml`` (ODT) route here from the
shared decode lane (``sources/archive.py:_decoded_text_column``), the
same pattern as the ``%PDF-`` sniff; any OTHER zip falls through to
the charset lane unchanged.  Malformed containers (truncated zip,
missing member, XML that does not parse) raise
:class:`OfficeFormatError` — typed quarantine, like every codec here.

Per-document Python riding the Arrow-batched ``mapInPandas`` decode
lane; never row-at-a-time.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree


class OfficeFormatError(ValueError):
    """Unsupported or corrupt Office (DOCX/ODT) document."""


#: MIME types crawls label these documents with (the WARC corpus lanes
#: admit them alongside text/* and application/pdf)
OFFICE_CONTENT_TYPES = (
    "application/vnd.openxmlformats-officedocument"
    ".wordprocessingml.document",
    "application/vnd.openxmlformats-officedocument"
    ".presentationml.presentation",
    "application/vnd.oasis.opendocument.text",
)

_ZIP_MAGIC = b"PK\x03\x04"


def _local(tag: str) -> str:
    """Local name of a namespaced XML tag ('{ns}p' -> 'p')."""
    return tag.rsplit("}", 1)[-1]


def sniff_office_kind(data: bytes) -> str | None:
    """'docx' / 'odt' when the payload is a ZIP carrying the
    corresponding document member, else None (including for plain
    ZIPs — those belong to the archive source, not this codec).
    Opening a zip reads only the central directory; a corrupt one
    returns None here and the caller's normal lane quarantines it."""
    if not data.startswith(_ZIP_MAGIC):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
    except Exception:
        return None
    if "word/document.xml" in names:
        return "docx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    if "content.xml" in names and (
        "mimetype" in names or "META-INF/manifest.xml" in names
    ):
        return "odt"
    return None


def _read_member(data: bytes, member: str) -> bytes:
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return zf.read(member)
    except (zipfile.BadZipFile, KeyError, OSError, EOFError) as e:
        raise OfficeFormatError(f"unreadable container member: {e}") from e


def _parse_xml(raw: bytes) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(raw)
    except ElementTree.ParseError as e:
        raise OfficeFormatError(f"malformed document XML: {e}") from e


def extract_docx_text(data: bytes) -> str:
    """DOCX bytes -> plain text, one line per ``w:p`` paragraph (table
    cells included — they hold their own paragraphs).  ``w:tab`` -> TAB,
    ``w:br``/``w:cr`` -> newline within the paragraph.  Raises
    :class:`OfficeFormatError` on a corrupt container or XML."""
    root = _parse_xml(_read_member(data, "word/document.xml"))
    out: list[str] = []

    def walk_para(p) -> str:
        parts: list[str] = []
        for el in p.iter():
            tag = _local(el.tag)
            if tag == "t":
                parts.append(el.text or "")
            elif tag == "tab":
                parts.append("\t")
            elif tag in ("br", "cr"):
                parts.append("\n")
        return "".join(parts)

    for el in root.iter():
        if _local(el.tag) == "p":
            out.append(walk_para(el))
    return "\n".join(out)


def extract_odt_text(data: bytes) -> str:
    """ODT bytes -> plain text, one line per ``text:p``/``text:h``
    block.  ``text:s`` expands its run-length ``text:c`` spaces,
    ``text:tab`` -> TAB, ``text:line-break`` -> newline; nested spans
    and links contribute in document order.  Raises
    :class:`OfficeFormatError` on a corrupt container or XML."""
    root = _parse_xml(_read_member(data, "content.xml"))
    out: list[str] = []

    def walk_block(p) -> str:
        parts: list[str] = []

        def rec(el) -> None:
            tag = _local(el.tag)
            if tag == "s":
                n = 1
                for k, v in el.attrib.items():
                    if _local(k) == "c":
                        try:
                            n = max(1, int(v))
                        except ValueError:
                            n = 1
                parts.append(" " * n)
            elif tag == "tab":
                parts.append("\t")
            elif tag == "line-break":
                parts.append("\n")
            else:
                if el.text:
                    parts.append(el.text)
                for child in el:
                    rec(child)
                    if child.tail:
                        parts.append(child.tail)
                return
            # replaced elements (s/tab/line-break) contribute no text
            # of their own, but their tails still belong to the parent
            # -- handled by the parent's loop above

        if p.text:
            parts.append(p.text)
        for child in p:
            rec(child)
            if child.tail:
                parts.append(child.tail)
        return "".join(parts)

    def blocks(el) -> None:
        tag = _local(el.tag)
        if tag in ("p", "h"):
            out.append(walk_block(el))
            return  # nested text:p inside frames handled by their own pass
        for child in el:
            blocks(child)

    blocks(root)
    return "\n".join(out)


def extract_pptx_text(data: bytes) -> str:
    """PPTX bytes -> plain text: slides in deck order (the numeric
    suffix of ``ppt/slides/slideN.xml`` — the zip's member order is
    whatever the generator wrote), one line per ``a:p`` paragraph of
    each shape, ``a:br`` as an in-paragraph break.  Slide notes and
    masters are chrome and skipped.  Raises :class:`OfficeFormatError`
    on a corrupt container or XML."""
    import re

    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            slides = sorted(
                (
                    int(m.group(1)), n
                )
                for n in zf.namelist()
                if (m := re.fullmatch(r"ppt/slides/slide(\d+)\.xml", n))
            )
            raws = [zf.read(n) for _, n in slides]
    except (zipfile.BadZipFile, OSError, EOFError) as e:
        raise OfficeFormatError(f"unreadable container: {e}") from e
    out: list[str] = []
    for raw in raws:
        root = _parse_xml(raw)
        for el in root.iter():
            if _local(el.tag) != "p":
                continue
            parts: list[str] = []
            for sub in el.iter():
                tag = _local(sub.tag)
                if tag == "t":
                    parts.append(sub.text or "")
                elif tag == "br":
                    parts.append("\n")
            out.append("".join(parts))
    return "\n".join(out)


_EXTRACTORS = {
    "docx": extract_docx_text,
    "odt": extract_odt_text,
    "pptx": extract_pptx_text,
}


def extract_office_text(data: bytes) -> str:
    """Dispatch on :func:`sniff_office_kind`; raises
    :class:`OfficeFormatError` when the payload is not a recognizable
    Office document (callers should sniff first and fall through to
    their normal lane instead of treating that as a quarantine)."""
    kind = sniff_office_kind(data)
    if kind is None:
        raise OfficeFormatError("not a DOCX/PPTX/ODT container")
    return _EXTRACTORS[kind](data)
