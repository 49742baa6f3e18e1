"""Baseline PDF text extraction, pure stdlib — the document format a
real crawl carries most after HTML.

Surface (the baseline subset that covers machine-generated text PDFs):

- **Object model**: objects located by a direct ``N G obj`` scan (no
  xref dependence — works on linearized, incrementally-updated and
  mildly damaged files alike); stream lengths honor ``/Length``
  (direct or indirect) with an ``endstream`` fallback; PDF 1.5+
  **object streams** (``/Type /ObjStm``) are unpacked so page trees of
  modern compressed PDFs resolve.
- **Filters**: unfiltered and ``/FlateDecode`` (zlib) content streams;
  ``/FlateDecode`` with a ``/DecodeParms`` predictor, and every other
  filter, quarantine.
- **Text**: page ``/Contents`` (single ref or array) parsed as a
  content stream — ``Tj``/``'``/``"``/``TJ`` show operators inside
  ``BT``/``ET``, literal strings with nesting/escapes/octal and hex
  strings, ``Td``/``TD``/``T*``/``Tm`` line breaks, TJ kern-to-space
  (< -100/1000 em), inline dict/array skipping.  Byte strings decode
  as Latin-1 (≈ PDFDocEncoding over the printable range) or UTF-16BE
  on BOM.

Quarantined variants raise :class:`PdfFormatError` (typed, like every
codec here): encrypted documents, non-Flate stream filters, predictor
DecodeParms, CID/Identity-H composite fonts (2-byte codes that would
decode to mojibake — honesty over noise).  See
:data:`UNSUPPORTED_FEATURES`.

Per-document Python riding the Arrow-batched ``mapInPandas`` decode
lane (``sources/archive.py:decode_text_members`` routes ``%PDF-``
payloads here), like every codec in this package.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import re
import zlib


class PdfFormatError(ValueError):
    """Unsupported or corrupt PDF document."""


#: quarantined (typed-error) classes — kept in sync with the module
#: docstring by tests/test_multimodal_pdf.py
UNSUPPORTED_FEATURES = (
    "encrypted",
    "non-Flate stream filters",
    "predictor DecodeParms",
    "CID/Identity-H composite fonts",
)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
# position-anchored probes (used via .match(data, pos) — never slice the
# file remainder per object; that turns the scan O(objects x file size))
_STREAM_KW_RE = re.compile(rb"\s*stream(\r\n|\n|\r)")
_ENDSTREAM_RE = re.compile(rb"\s*endstream")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _parse_dict_region(body: bytes) -> bytes:
    """The object's leading ``<< ... >>`` dictionary bytes (balanced),
    or b'' when the object has none."""
    i = 0
    n = len(body)
    while i < n and body[i : i + 1] in (b" ", b"\r", b"\n", b"\t"):
        i += 1
    if body[i : i + 2] != b"<<":
        return b""
    depth = 0
    j = i
    while j < n - 1:
        two = body[j : j + 2]
        if two == b"<<":
            depth += 1
            j += 2
        elif two == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return body[i:j]
        else:
            j += 1
    return body[i:]


def _dict_span(body: bytes) -> tuple[bytes, int]:
    """(dict bytes, offset just past the dict) — the span variant of
    :func:`_parse_dict_region`, for callers that must anchor what
    FOLLOWS the dict (the ``stream`` keyword)."""
    d = _parse_dict_region(body)
    if not d:
        return b"", 0
    return d, body.find(d) + len(d)


def _dict_int(d: bytes, key: bytes) -> int | None:
    # \b before the lookahead: without it, '/Length 12 0 R' backtracks
    # to match '1' (the lookahead rejects '12' but not its prefix) and
    # returns a truncated bogus direct length instead of None
    m = re.search(rb"/" + key + rb"\s+(\d+)\b(?!\s+\d+\s+R)", d)
    return int(m.group(1)) if m else None


def _dict_ref(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", d)
    return int(m.group(1)) if m else None


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """object number -> raw object body.  Later definitions win —
    incremental updates append replacements.

    Stream-aware: a body that opens a stream extends to its
    ``endstream`` (located via ``/Length`` — direct or an
    integer-object indirect ref — with a forward ``endstream`` search
    as fallback), and header-shaped byte runs INSIDE that stream's
    compressed data neither truncate it nor register garbage objects.
    Without a usable Length, literal ``endstream`` bytes inside
    compressed data can still end a stream early — the residual
    xref-free ambiguity, quarantined downstream by the zlib error."""
    # integer objects ('5 0 obj 42 endobj') pre-resolved for indirect
    # /Length refs — these precede or follow their stream freely
    int_objs = {
        int(m.group(1)): int(m.group(2))
        for m in re.finditer(rb"(\d+)\s+\d+\s+obj\s*(\d+)\s*endobj", data)
    }
    headers = list(_OBJ_RE.finditer(data))
    objs: dict[int, bytes] = {}
    consumed = 0
    for k, m in enumerate(headers):
        if m.start() < consumed:
            continue  # header-shaped bytes inside a consumed stream
        e, num = m.end(), int(m.group(1))
        next_pos = len(data)
        for m2 in headers[k + 1 :]:
            if m2.start() >= e:
                next_pos = m2.start()
                break
        seg = data[e:next_pos]
        d, dict_end = _dict_span(seg)
        # a stream's keyword sits IMMEDIATELY after its dict (PDF
        # syntax); searching the whole segment would let a literal
        # string containing "stream\n" in a plain dict object open a
        # phantom stream and swallow every object up to some far
        # endstream
        sm = _STREAM_KW_RE.match(seg, dict_end) if d else None
        if sm is None:
            objs[num] = seg
            consumed = next_pos
            continue
        sstart = e + sm.end()  # sm matched seg at pos=dict_end: end() is absolute
        length = _dict_int(d, b"Length")
        if length is None:
            ref = _dict_ref(d, b"Length")
            if ref is not None:
                length = int_objs.get(ref)
        end = -1
        if length is not None and sstart + length <= len(data):
            # match at a POSITION, never data[pos:]: slicing the file
            # remainder per stream object is O(objects x file size) in
            # memcpy on multi-thousand-object PDFs
            if _ENDSTREAM_RE.match(data, sstart + length):
                end = data.find(b"endstream", sstart + length)
        if end < 0:
            end = data.find(b"endstream", sstart)
        if end < 0:
            objs[num] = seg
            consumed = next_pos
            continue
        bend = end + len(b"endstream")
        objs[num] = data[e:bend]
        consumed = bend
    return objs


def _stream_bytes(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    """The raw (still-filtered) stream payload of an object body, or
    None when the object has no stream.  ``/Length`` (direct or an
    indirect ref into ``objs``) bounds the read; a missing/unusable
    Length falls back to the last ``endstream``."""
    d, dict_end = _dict_span(body)
    m = re.match(rb"\s*stream(\r\n|\n|\r)", body[dict_end:]) if d else None
    if m is None:
        return None
    start = dict_end + m.end()
    length = _dict_int(d, b"Length")
    if length is None:
        ref = _dict_ref(d, b"Length")
        if ref is not None and ref in objs:
            lm = re.match(rb"\s*(\d+)", objs[ref])
            if lm:
                length = int(lm.group(1))
    if length is not None and start + length <= len(body):
        tail = body[start + length :]
        if re.match(rb"\s*endstream", tail):
            return body[start : start + length]
    end = body.rfind(b"endstream")
    if end < start:
        raise PdfFormatError("stream without endstream")
    return body[start:end].rstrip(b"\r\n")


def _decode_stream(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    raw = _stream_bytes(body, objs)
    if raw is None:
        return None
    d = _parse_dict_region(body)
    if re.search(rb"/DecodeParms\b", d):
        raise PdfFormatError("predictor DecodeParms unsupported")
    filt = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", d)
    if filt is None:
        return raw
    names = re.findall(rb"/([A-Za-z0-9]+)", filt.group(1))
    if names == [b"FlateDecode"]:
        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfFormatError(f"bad Flate stream: {exc}") from exc
    raise PdfFormatError(
        "unsupported stream filter(s): "
        + b",".join(names).decode("latin-1")
    )


def _expand_object_streams(objs: dict[int, bytes]) -> None:
    """PDF 1.5 ``/Type /ObjStm``: compressed objects live INSIDE a
    stream — header is N (objnum, offset) integer pairs, bodies follow
    from /First.  Unpacked entries join the object map (existing
    top-level definitions win: they are incremental-update overrides)."""
    for body in list(objs.values()):
        d = _parse_dict_region(body)
        if not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        n = _dict_int(d, b"N")
        first = _dict_int(d, b"First")
        payload = _decode_stream(body, objs)
        if n is None or first is None or payload is None:
            raise PdfFormatError("malformed object stream")
        nums = re.findall(rb"(\d+)\s+(\d+)", payload[:first])[:n]
        for k, (num, off) in enumerate(nums):
            start = first + int(off)
            end = (
                first + int(nums[k + 1][1]) if k + 1 < len(nums) else len(payload)
            )
            objs.setdefault(int(num), payload[start:end])


def _pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal(content: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal string starting at the '('; returns
    (bytes, index after the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(content)
    while i < n and depth:
        c = content[i : i + 1]
        if c == b"\\":
            nxt = content[i + 1 : i + 2]
            oct_m = re.match(rb"[0-7]{1,3}", content[i + 1 : i + 4])
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif oct_m:  # \8 and \9 are NOT octal: unknown-escape path
                out.append(int(oct_m.group(0), 8) & 0xFF)
                i += 1 + len(oct_m.group(0))
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and content[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 2  # unknown escape: drop the backslash
                out += nxt
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _content_text(content: bytes) -> str:
    """Text shown by a content stream: show operators inside BT/ET,
    line-positioning operators become newlines, TJ kerns below
    -100/1000 em become spaces."""
    out: list[str] = []
    line: list[str] = []
    operands: list = []  # parsed strings (str) and numbers (float)
    in_array = False
    array_acc: list = []

    def endline():
        text = "".join(line).strip()
        if text:
            out.append(text)
        line.clear()

    i = 0
    n = len(content)
    while i < n:
        c = content[i : i + 1]
        if c in _WS:
            i += 1
        elif c == b"%":  # comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _parse_literal(content, i)
            (array_acc if in_array else operands).append(_pdf_string(s))
        elif content[i : i + 2] == b"<<":  # inline dict: skip balanced
            depth = 0
            while i < n - 1:
                if content[i : i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif content[i : i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        break
                else:
                    i += 1
        elif c == b"<":  # hex string
            j = content.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", content[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            (array_acc if in_array else operands).append(
                _pdf_string(bytes.fromhex(hx.decode("ascii")))
            )
            i = j + 1
        elif c == b"[":
            in_array, array_acc = True, []
            i += 1
        elif c == b"]":
            in_array = False
            operands.append(array_acc)
            i += 1
        elif c == b"/":  # name
            i += 1
            while i < n and content[i : i + 1] not in _WS + _DELIM:
                i += 1
        elif re.match(rb"[-+.0-9]", c):
            m = re.match(rb"[-+.0-9]+", content[i:])
            try:
                val = float(m.group(0))
            except ValueError:
                val = 0.0
            (array_acc if in_array else operands).append(val)
            i = m.end() + i
        else:  # operator token
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            if not m:
                i += 1
                continue
            op = m.group(0)
            i += m.end()
            if op == b"Tj" and operands:
                if isinstance(operands[-1], str):
                    line.append(operands[-1])
            elif op in (b"'", b'"') and operands:
                endline()
                if isinstance(operands[-1], str):
                    line.append(operands[-1])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, str):
                        line.append(el)
                    elif isinstance(el, float) and el < -100:
                        line.append(" ")
            elif op in (b"Td", b"TD", b"T*", b"Tm", b"ET"):
                endline()
            operands = []
    endline()
    return "\n".join(out)


def _page_order(objs: dict[int, bytes], _raw: bytes | None = None) -> list[int]:
    """Page object numbers in PAGE-TREE order: /Type /Catalog ->
    /Pages -> depth-first /Kids walk (intermediate /Pages nodes
    recursed, /Page leaves collected).  Object numbers do NOT encode
    reading order — incremental updates append inserted pages with
    high numbers — so the tree is authoritative; a missing or broken
    tree falls back to object-number order over /Type /Page objects."""

    def is_page(num: int) -> bool:
        return num in objs and bool(
            re.search(rb"/Type\s*/Page\b(?!s)", _parse_dict_region(objs[num]))
        )

    pages: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        d = _parse_dict_region(objs[num])
        if is_page(num):
            pages.append(num)
            return
        kids = re.search(rb"/Kids\s*\[([^\]]*)\]", d)
        if kids:
            for ref in re.findall(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                walk(int(ref))

    # the governing catalog: the LAST trailer's /Root (incremental
    # updates append replacement trailers pointing at a NEW catalog
    # object — the stale low-numbered catalog must not govern), else an
    # xref-stream object's /Root (PDF 1.5 files carry no trailer
    # keyword), else the highest-numbered /Type /Catalog (later
    # definitions win, as everywhere in this scan)
    catalog = None
    if _raw is not None:
        for m in re.finditer(rb"trailer", _raw):
            d = _parse_dict_region(_raw[m.end() :])
            ref = _dict_ref(d, b"Root")
            if ref is not None:
                catalog = ref
    if catalog is None:
        for num in sorted(objs):
            d = _parse_dict_region(objs[num])
            if re.search(rb"/Type\s*/XRef\b", d):
                ref = _dict_ref(d, b"Root")
                if ref is not None:
                    catalog = ref
    if catalog is None:
        cats = [
            num
            for num in sorted(objs)
            if re.search(rb"/Type\s*/Catalog\b", _parse_dict_region(objs[num]))
        ]
        catalog = cats[-1] if cats else None
    if catalog is not None and catalog in objs:
        root = _dict_ref(_parse_dict_region(objs[catalog]), b"Pages")
        if root is not None:
            walk(root)
    if pages:
        return pages
    return [num for num in sorted(objs) if is_page(num)]


def extract_pdf_text(data: bytes) -> str:
    """Text of every page's content stream(s), in page-tree order.

    Raises :class:`PdfFormatError` on the quarantined classes
    (:data:`UNSUPPORTED_FEATURES`) and on documents with no
    recognizable page/content structure — honesty over silent empties.
    """
    if not data.startswith(b"%PDF-"):
        raise PdfFormatError("missing %PDF- header")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data):
        raise PdfFormatError("encrypted document")
    objs = _scan_objects(data)
    _expand_object_streams(objs)
    if any(
        re.search(rb"/Encoding\s*/Identity-H\b", _parse_dict_region(b))
        for b in objs.values()
    ):
        raise PdfFormatError("CID/Identity-H composite font")

    pages = _page_order(objs, data)
    if not pages:
        raise PdfFormatError("no page objects found")

    texts: list[str] = []
    for num in pages:
        d = _parse_dict_region(objs[num])
        m = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
        if m is None:
            continue
        refs = [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
        content = b"\n".join(
            s
            for r in refs
            if r in objs and (s := _decode_stream(objs[r], objs)) is not None
        )
        page_text = _content_text(content)
        if page_text:
            texts.append(page_text)
    return "\n".join(texts)
