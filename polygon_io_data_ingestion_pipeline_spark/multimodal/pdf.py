"""Baseline PDF text extraction, pure stdlib — the document format a
real crawl carries most after HTML.

Surface (the baseline subset that covers machine-generated text PDFs):

- **Object model**: objects located by a direct ``N G obj`` scan (no
  xref dependence — works on linearized, incrementally-updated and
  mildly damaged files alike); stream lengths honor ``/Length``
  (direct or indirect) with an ``endstream`` fallback; PDF 1.5+
  **object streams** (``/Type /ObjStm``) are unpacked so page trees of
  modern compressed PDFs resolve.
- **Filters**: unfiltered and ``/FlateDecode`` (zlib) content streams,
  including ``/DecodeParms`` predictors — PNG predictors 10-15 (the
  row-filter unfiltering shared with :mod:`.png`) and the TIFF
  horizontal predictor 2 at 8 bits/component, the forms nearly every
  machine-generated PDF emits for its xref/object streams.  Every
  other filter, unknown predictor values, and indirect DecodeParms
  quarantine.
- **Text**: page ``/Contents`` (single ref or array) parsed as a
  content stream — ``Tj``/``'``/``"``/``TJ`` show operators inside
  ``BT``/``ET``, literal strings with nesting/escapes/octal and hex
  strings, ``Td``/``TD``/``T*``/``Tm`` line breaks, TJ kern-to-space
  (< -100/1000 em), inline dict/array skipping.  Byte strings decode
  as Latin-1 (≈ PDFDocEncoding over the printable range) or UTF-16BE
  on BOM.
- **CID text**: ``/Encoding /Identity-H`` composite fonts decode
  through their ``/ToUnicode`` CMap (``bfchar`` + both ``bfrange``
  forms, multi-char UTF-16BE targets) — the form every modern PDF
  generator emits for embedded-subset fonts.  Font selection follows
  ``Tf`` against the page's ``/Resources /Font`` names (page-level
  names win over names collected from the rest of the document).

- **Encryption**: the standard security handler's ubiquitous
  "owner-password-only" case — documents encrypted with an EMPTY user
  password (most secured PDFs on the web: anyone can read, the owner
  password only gates editing).  RC4 at revisions 2/3, AES-128-CBC
  (``/V 4`` crypt filters, ``/AESV2``) and AES-256 (``/V 5`` revisions
  5/6 — SHA-2 key derivation incl. the ISO 32000-2 algorithm-2.B
  iterated hash, ``/UE`` file-key unwrap, whole-document key per
  algorithm 1.A, ``/Perms`` verified when present) decrypt with the
  standard derivations; the empty password is VERIFIED against ``/U``
  first, so a genuinely password-protected document quarantines
  instead of extracting mojibake.  RC4 and the AES cipher (128- and
  256-bit schedules) are pure stdlib (hashlib + table math).

Quarantined variants raise :class:`PdfFormatError` (typed, like every
codec here): password-protected documents (non-empty user password),
unsupported encryption variants (non-Standard handlers, unknown crypt
filter methods), encrypted documents whose /Encrypt
dictionary is missing, non-Flate stream filters, unsupported predictor
variants, and text SHOWN under a CID font that has no usable ToUnicode
CMap (2-byte codes that would decode to mojibake — honesty over noise;
a merely-declared unused CID font no longer blocks the document).  See
:data:`UNSUPPORTED_FEATURES`.

Per-document Python riding the Arrow-batched ``mapInPandas`` decode
lane (``sources/archive.py:decode_text_members`` routes ``%PDF-``
payloads here), like every codec in this package.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import functools
import re
import zlib


class PdfFormatError(ValueError):
    """Unsupported or corrupt PDF document."""


#: quarantined (typed-error) classes — kept in sync with the module
#: docstring by tests/test_multimodal_pdf.py
UNSUPPORTED_FEATURES = (
    "password-protected documents (non-empty user password)",
    "unsupported encryption variants",
    "encrypted documents with a missing /Encrypt dictionary",
    "non-Flate stream filters",
    "unsupported predictor variants",
    "CID text shown without a usable ToUnicode CMap",
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


def _scan_objects(
    data: bytes, gens_out: dict[int, int] | None = None
) -> dict[int, bytes]:
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
        if gens_out is not None:
            # generation numbers for the decryptor's per-object keys,
            # recorded HERE (consumed-stream-aware) — a raw regex over
            # the file would let header-shaped bytes inside encrypted
            # stream data poison the key (last-wins) and turn a
            # decryptable document into garbage
            gens_out[num] = int(m.group(2))
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


def _decode_parms(d: bytes) -> dict[bytes, int] | None:
    """The ``/DecodeParms`` dictionary's integer entries, or None when
    the key is absent.  Accepts the direct ``<< ... >>`` form and the
    single-filter array form ``[ << ... >> ]`` (nulls skipped);
    indirect refs and multi-dict arrays quarantine — they accompany
    filter chains this codec rejects anyway."""
    m = re.search(rb"/(?:DecodeParms|DP)\s*(<<|\[|\d+\s+\d+\s+R)", d)
    if m is None:
        return None
    tok = m.group(1)
    if tok not in (b"<<", b"["):
        raise PdfFormatError("unsupported predictor variants: indirect DecodeParms")
    region = d[m.start(1) :]
    if tok == b"[":
        inner = region[1 : region.find(b"]")]
        dicts = re.findall(rb"<<.*?>>", inner, re.S)
        if len(dicts) != 1:
            raise PdfFormatError(
                "unsupported predictor variants: DecodeParms array"
            )
        region = dicts[0]
    parms_dict = _parse_dict_region(region)
    out: dict[bytes, int] = {}
    for key in (b"Predictor", b"Columns", b"Colors", b"BitsPerComponent"):
        if re.search(rb"/" + key + rb"\s+\d+\s+\d+\s+R", parms_dict):
            # an indirect VALUE would read as "key absent" and skip the
            # predictor reversal entirely — garbage text extracted
            # silently; quarantine instead (honesty over noise)
            raise PdfFormatError(
                "unsupported predictor variants: indirect DecodeParms value"
            )
        v = _dict_int(parms_dict, key)
        if v is not None:
            out[key] = v
    return out


def _apply_predictor(data: bytes, parms: dict[bytes, int]) -> bytes:
    """Reverse a FlateDecode predictor: PNG row filters 10-15 (delegated
    to the shared :func:`..multimodal.png._unfilter`) or the TIFF
    horizontal predictor 2 at 8 bits/component.  Row geometry from
    Columns/Colors/BitsPerComponent (defaults 1/1/8)."""
    pred = parms.get(b"Predictor", 1)
    if pred == 1:
        return data
    cols = parms.get(b"Columns", 1)
    colors = parms.get(b"Colors", 1)
    bits = parms.get(b"BitsPerComponent", 8)
    if cols < 1 or colors < 1 or bits < 1:
        raise PdfFormatError("unsupported predictor variants: bad geometry")
    row_bytes = (cols * colors * bits + 7) // 8
    bpp = max(1, (colors * bits) // 8)
    if pred == 2:
        if bits != 8:
            raise PdfFormatError(
                "unsupported predictor variants: TIFF predictor below 8 bits"
            )
        if len(data) % row_bytes:
            raise PdfFormatError("predictor data is not whole rows")
        import numpy as np

        arr = np.frombuffer(data, np.uint8).reshape(-1, row_bytes).copy()
        for x in range(bpp, row_bytes):
            arr[:, x] += arr[:, x - bpp]
        return arr.tobytes()
    if 10 <= pred <= 15:
        if len(data) % (row_bytes + 1):
            raise PdfFormatError("predictor data is not whole rows")
        from .png import PngFormatError, _unfilter

        try:
            rows, _ = _unfilter(data, 0, len(data) // (row_bytes + 1), row_bytes, bpp)
        except PngFormatError as exc:
            raise PdfFormatError(f"bad predictor rows: {exc}") from exc
        return rows.tobytes()
    raise PdfFormatError(f"unsupported predictor variants: predictor {pred}")


def _decode_stream(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    raw = _stream_bytes(body, objs)
    if raw is None:
        return None
    d = _parse_dict_region(body)
    parms = _decode_parms(d)
    filt = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", d)
    if filt is None:
        return raw
    names = re.findall(rb"/([A-Za-z0-9]+)", filt.group(1))
    if names == [b"FlateDecode"]:
        try:
            out = zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfFormatError(f"bad Flate stream: {exc}") from exc
        return _apply_predictor(out, parms) if parms else out
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


def _parse_cmap(data: bytes) -> dict[int, str]:
    """code -> text from a ToUnicode CMap stream: ``bfchar`` pairs and
    both ``bfrange`` forms (``<lo> <hi> <dstStart>`` increments the
    LAST UTF-16 code unit; ``<lo> <hi> [<d1> <d2> ...]`` lists each
    destination).  Destinations are UTF-16BE and may be multi-char
    (ligature expansions)."""

    def dst(hx: bytes) -> str:
        if len(hx) % 4:  # not whole UTF-16BE units: take as one unit
            v = int(hx, 16)
            if v > 0x10FFFF:  # malformed destination: not a code point
                return "�"
            return chr(v)
        return bytes.fromhex(hx.decode("ascii")).decode(
            "utf-16-be", errors="replace"
        )

    cmap: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for sm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            cmap[int(sm.group(1), 16)] = dst(sm.group(2))
    entry = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])",
        re.S,
    )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for sm in entry.finditer(m.group(1)):
            lo, hi = int(sm.group(1), 16), int(sm.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:
                continue
            third = sm.group(3)
            if third.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", third)
                for k in range(min(hi - lo + 1, len(dsts))):
                    cmap[lo + k] = dst(dsts[k])
            else:
                base = third[1:-1]
                text = dst(base)
                if not text:
                    continue
                head, last = text[:-1], ord(text[-1])
                for k in range(hi - lo + 1):
                    if last + k > 0x10FFFF:  # range runs off Unicode
                        break
                    cmap[lo + k] = head + chr(last + k)
    return cmap


def _cid_font_cmaps(objs: dict[int, bytes]) -> dict[int, dict[int, str] | None]:
    """font object number -> ToUnicode cmap for every ``/Encoding
    /Identity-H`` font; None marks a CID font with no usable CMap
    (text shown under it quarantines at show time)."""
    out: dict[int, dict[int, str] | None] = {}
    for num, body in objs.items():
        d = _parse_dict_region(body)
        if not re.search(rb"/Encoding\s*/Identity-H\b", d):
            continue
        cmap = None
        ref = _dict_ref(d, b"ToUnicode")
        if ref is not None and ref in objs:
            try:
                payload = _decode_stream(objs[ref], objs)
            except PdfFormatError:
                payload = None
            if payload:
                try:
                    parsed = _parse_cmap(payload)
                except ValueError:
                    # malformed CMap syntax: typed-quarantine contract —
                    # the font stays unusable (None), never a raw crash
                    parsed = None
                if parsed:
                    cmap = parsed
        out[num] = cmap
    return out


def _resource_font_names(
    d: bytes, objs: dict[int, bytes]
) -> dict[bytes, int]:
    """``/Resources`` (direct dict or ref) -> the ``/Font`` subdict's
    name -> font-object-number pairs."""
    res = d
    ref = _dict_ref(d, b"Resources")
    if ref is not None and ref in objs:
        res = _parse_dict_region(objs[ref])
    m = re.search(rb"/Font\s*(<<.*?>>|\d+\s+\d+\s+R)", res, re.S)
    if m is None:
        return {}
    region = m.group(1)
    if not region.startswith(b"<<"):
        fref = int(re.match(rb"(\d+)", region).group(1))
        if fref not in objs:
            return {}
        region = _parse_dict_region(objs[fref])
    return {
        name: int(num)
        for name, num in re.findall(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", region)
    }


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


def _content_text(
    content: bytes, fonts: dict[bytes, dict[int, str] | None] | None = None
) -> str:
    """Text shown by a content stream: show operators inside BT/ET,
    line-positioning operators become newlines, TJ kerns below
    -100/1000 em become spaces.

    ``fonts`` maps resource font NAMES to ToUnicode cmaps for the
    page's CID (Identity-H) fonts: while such a font is selected
    (``Tf``), show strings decode as 2-byte codes through its cmap; a
    CID font mapped to None (no usable ToUnicode) raises
    :class:`PdfFormatError` the moment text is SHOWN under it —
    selection alone is harmless.  Fonts absent from the map are simple
    fonts (Latin-1 / UTF-16BE-on-BOM byte strings, as before)."""
    fonts = fonts or {}
    out: list[str] = []
    line: list[str] = []
    operands: list = []  # raw strings (bytes), numbers (float), names
    in_array = False
    array_acc: list = []
    cur_cmap: dict[int, str] | None = None  # selected CID font's cmap
    cur_cid_unmapped = False  # selected font is CID with no cmap

    def show(raw: bytes) -> None:
        if cur_cid_unmapped:
            raise PdfFormatError(
                "CID text shown without a usable ToUnicode CMap"
            )
        if cur_cmap is not None:
            chars = []
            for k in range(0, len(raw) - 1, 2):
                code = (raw[k] << 8) | raw[k + 1]
                chars.append(cur_cmap.get(code, "�"))
            line.append("".join(chars))
        else:
            line.append(_pdf_string(raw))

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
            (array_acc if in_array else operands).append(s)
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
                bytes.fromhex(hx.decode("ascii"))
            )
            i = j + 1
        elif c == b"[":
            in_array, array_acc = True, []
            i += 1
        elif c == b"]":
            in_array = False
            operands.append(array_acc)
            i += 1
        elif c == b"/":  # name: pushed so Tf can resolve the font
            i += 1
            start = i
            while i < n and content[i : i + 1] not in _WS + _DELIM:
                i += 1
            (array_acc if in_array else operands).append(
                ("name", content[start:i])
            )
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
                if isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op in (b"'", b'"') and operands:
                endline()
                if isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, float) and el < -100:
                        line.append(" ")
            elif op == b"Tf" and operands:
                names = [
                    o[1]
                    for o in operands
                    if isinstance(o, tuple) and o[0] == "name"
                ]
                if names:
                    selected = fonts.get(names[-1], "simple")
                    if selected == "simple":
                        cur_cmap, cur_cid_unmapped = None, False
                    elif selected is None:
                        cur_cmap, cur_cid_unmapped = None, True
                    else:
                        cur_cmap, cur_cid_unmapped = selected, False
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


# ---------------------------------------------------------------------------
# Standard security handler — the empty-user-password ("owner password
# only") case.  ISO 32000-1 §7.6.3: algorithms 2 (file key), 1 (object
# key), 6 (user-password check).  Pure stdlib: md5 + RC4 + an AES-128
# inverse cipher over the public FIPS-197 tables.
# ---------------------------------------------------------------------------

#: the standard 32-byte password padding string (ISO 32000-1 table 19)
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


#: FIPS-197 S-box (public constant), its inverse derived from it
_AES_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_AES_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_AES_SBOX):
    _AES_INV_SBOX[_v] = _i
_AES_INV_SBOX = bytes(_AES_INV_SBOX)


def _xt(a: int) -> int:  # GF(2^8) multiply by x
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xt(a)
        b >>= 1
    return p


def _aes_round_keys(key: bytes) -> list[bytes]:
    """FIPS-197 key expansion for 128- OR 256-bit keys (Nk = 4 / 8,
    Nr = Nk + 6).  The 256-bit branch adds the extra SubWord step at
    ``i % Nk == 4`` — the only difference from the 128-bit schedule."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise PdfFormatError(f"unsupported AES key length {len(key)}")
    nr = nk + 6
    rcon = 1
    words = [key[i : i + 4] for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        w = words[i - 1]
        if i % nk == 0:
            w = bytes(
                [
                    _AES_SBOX[w[1]] ^ rcon,
                    _AES_SBOX[w[2]],
                    _AES_SBOX[w[3]],
                    _AES_SBOX[w[0]],
                ]
            )
            rcon = _xt(rcon)
        elif nk == 8 and i % nk == 4:
            w = bytes(_AES_SBOX[b] for b in w)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], w)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _aes128_round_keys(key: bytes) -> list[bytes]:
    return _aes_round_keys(key)


def _aes128_decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1  # 10 (AES-128) or 14 (AES-256): same round body
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows (column-major state: byte r + 4*c)
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[r + 4 * ((c + r) % 4)] = s[r + 4 * c]
        # InvSubBytes
        for i in range(16):
            t[i] = _AES_INV_SBOX[t[i]]
        # AddRoundKey
        for i in range(16):
            t[i] ^= rk[rnd][i]
        if rnd > 0:
            # InvMixColumns
            for c in range(4):
                a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
                t[4 * c + 0] = (
                    _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9)
                )
                t[4 * c + 1] = (
                    _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13)
                )
                t[4 * c + 2] = (
                    _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11)
                )
                t[4 * c + 3] = (
                    _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14)
                )
        s = t
    return bytes(s)


def _aes_cbc_decrypt(key: bytes, blob: bytes) -> bytes:
    """PDF AESV2 stream layout: 16-byte IV prefix + CBC ciphertext +
    PKCS#5 padding.  Truncated/odd-length data quarantines (typed)."""
    if len(blob) < 32 or (len(blob) - 16) % 16:
        raise PdfFormatError("encrypted stream is not AES-block aligned")
    rk = _aes128_round_keys(key)
    prev = blob[:16]
    out = bytearray()
    for i in range(16, len(blob), 16):
        ct = blob[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_aes128_decrypt_block(rk, ct), prev))
        prev = ct
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise PdfFormatError("encrypted stream has invalid AES padding")
    return bytes(out[:-pad])


def _aes128_encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    """Forward AES cipher — the fixture/test encoder's half (decryption
    is the product path); same FIPS-197 tables."""
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, nr + 1):
        for i in range(16):
            s[i] = _AES_SBOX[s[i]]
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = s[r + 4 * ((c + r) % 4)]
        s = t
        if rnd < nr:
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                s[4 * c + 0] = _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3
                s[4 * c + 1] = a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3
                s[4 * c + 2] = a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3)
                s[4 * c + 3] = _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2)
        for i in range(16):
            s[i] ^= rk[rnd][i]
    return bytes(s)


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """PDF AESV2 forward encryption: IV prefix + CBC + PKCS#5 padding —
    exact inverse of :func:`_aes_cbc_decrypt` (fixture/test encoder)."""
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    rk = _aes128_round_keys(key)
    out, prev = bytearray(iv), iv
    for i in range(0, len(data), 16):
        ct = _aes128_encrypt_block(
            rk, bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        )
        out += ct
        prev = ct
    return bytes(out)


def _aes_cbc_nopad(
    key: bytes, data: bytes, iv: bytes, encrypt: bool
) -> bytes:
    """Raw AES-CBC without padding or IV prefix — the shape ISO 32000-2
    uses for /UE//OE unwrapping (zero IV) and inside hash 2.B."""
    if len(data) % 16:
        raise PdfFormatError("AES-CBC payload is not block aligned")
    rk = _aes_round_keys(key)
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        if encrypt:
            ct = _aes128_encrypt_block(
                rk, bytes(a ^ b for a, b in zip(blk, prev))
            )
            out += ct
            prev = ct
        else:
            out += bytes(
                a ^ b for a, b in zip(_aes128_decrypt_block(rk, blk), prev)
            )
            prev = blk
    return bytes(out)


def hash_2b(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B — the R6 iterated SHA-2 hash: start
    from SHA-256(pw + salt + udata), then rounds of AES-128-CBC over 64
    copies of (pw + K + udata) keyed/IV'd from K, picking SHA-256/384/
    512 by the first 16 bytes' sum mod 3, until >= 64 rounds AND the
    last byte of the AES output <= round - 32.  Public: the fixture
    encoder computes /U //UE with the same function the decryptor
    consumes (the std_* discipline)."""
    import hashlib

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = _aes_cbc_nopad(k[:16], k1, k[16:32], encrypt=True)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e) if mod == 0
            else hashlib.sha384(e) if mod == 1
            else hashlib.sha512(e)
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


@functools.lru_cache(maxsize=256)
def _v5_password_hash(pw: bytes, salt: bytes, r: int) -> bytes:
    """R5 (Adobe ExtensionLevel 3): plain SHA-256(pw + salt); R6
    (ISO 32000-2): algorithm 2.B.  Memoized: 2.B costs ~10k pure-Python
    AES block ops per call by DESIGN (it is a password KDF), and the
    empty-password crawl path recomputes it for every document — the
    same (pw, salt) pairs recur constantly (the fixture lanes reuse one
    salt corpus-wide), so a small pure-function cache removes the KDF
    from the per-document cost entirely."""
    import hashlib

    return (
        hashlib.sha256(pw + salt).digest() if r == 5 else hash_2b(pw, salt)
    )


def std_v5_entries(
    user_pw: bytes, file_key: bytes, vsalt: bytes, ksalt: bytes, r: int
) -> tuple[bytes, bytes]:
    """(/U, /UE) for a V5 document — fixture encoder half.  /U =
    password hash over the validation salt + both salts; /UE = the
    32-byte file key wrapped with AES-256-CBC (zero IV, no padding)
    under the key-salt hash (ISO 32000-2 algorithms 8/8.A)."""
    u = _v5_password_hash(user_pw, vsalt, r) + vsalt + ksalt
    ik = _v5_password_hash(user_pw, ksalt, r)
    ue = _aes_cbc_nopad(ik, file_key, bytes(16), encrypt=True)
    return u, ue


def std_v5_perms(p: int, file_key: bytes) -> bytes:
    """/Perms per ISO 32000-2 algorithm 10: 16 bytes = signed /P
    (little-endian, sign-extended to 8 bytes) + 'T' (EncryptMetadata) +
    'adb' + 4 arbitrary bytes, AES-256-ECB-encrypted with the file
    key.  Fixture encoder half of the _std_security_handler check."""
    import struct

    # SIGN extension, not a hardcoded high dword: /P >= 0 extends with
    # zeros (round-12 review finding — real readers compare the dword)
    blk = struct.pack("<q", p) + b"Tadb" + b"poly"
    rk = _aes_round_keys(file_key)
    return _aes128_encrypt_block(rk, blk)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PW_PAD)[:32]


def std_owner_entry(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """/O per ISO 32000-1 algorithm 3 — the fixture encoder's half of
    the standard security handler (the product path only consumes it)."""
    import hashlib

    h = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    o = _rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def std_file_key(
    o: bytes, p: int, id0: bytes, r: int, n: int, user_pw: bytes = b""
) -> bytes:
    """File encryption key per algorithm 2 (fixture encoder; mirrors
    the consuming derivation in :func:`_std_security_handler`)."""
    import hashlib

    seed = _pad_pw(user_pw) + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def std_user_entry(key: bytes, id0: bytes, r: int) -> bytes:
    """/U per algorithms 4 (R2) / 5 (R>=3) — fixture encoder."""
    import hashlib

    if r == 2:
        return _rc4(key, _PW_PAD)
    x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # arbitrary 16-byte tail per spec


def _dict_string(d: bytes, key: bytes) -> bytes | None:
    """A PDF string value (literal with escapes, or hex) for ``key``."""
    m = re.search(rb"/" + key + rb"\s*\(", d)
    if m:
        raw, _end = _parse_literal(d, m.end() - 1)
        return raw
    m = re.search(rb"/" + key + rb"\s*<([0-9A-Fa-f\s]*)>", d)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return None


def _file_id0(data: bytes) -> bytes:
    """First element of the trailer /ID array (hex or literal form);
    empty when the document has none (key derivation then omits it)."""
    m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    m = re.search(rb"/ID\s*\[\s*\(", data)
    if m:
        raw, _end = _parse_literal(data, m.end() - 1)
        return raw
    return b""


def _std_security_handler(
    enc_dict: bytes, data: bytes
) -> tuple[str | None, bytes]:
    """(method, file_key) for the standard handler with the EMPTY user
    password: method 'rc4' | 'aes' | None (/Identity — encrypted in
    name only).  Raises the typed quarantines for non-Standard
    handlers, unsupported revisions/methods, and documents whose /U
    does not verify against the empty password (a REAL password)."""
    import hashlib

    fm = re.search(rb"/Filter\s*/(\w+)", enc_dict)
    if fm is None or fm.group(1) != b"Standard":
        raise PdfFormatError(
            "unsupported encryption handler "
            f"{(fm.group(1).decode('latin-1') if fm else '(none)')!r}"
        )
    v = _dict_int(enc_dict, b"V") or 0
    r = _dict_int(enc_dict, b"R") or 2
    o = _dict_string(enc_dict, b"O")
    u = _dict_string(enc_dict, b"U")
    # /P is SIGNED (a 32-bit permissions word, typically negative) —
    # _dict_int's unsigned match would miss it
    pm = re.search(rb"/P\s+(-?\d+)\b", enc_dict)
    p = int(pm.group(1)) if pm else None
    if o is None or u is None or p is None:
        raise PdfFormatError("unsupported encryption: incomplete /Encrypt dict")
    if v == 5:
        # AES-256 (R5 = Adobe ExtensionLevel 3 / R6 = ISO 32000-2):
        # SHA-2 key derivation, /UE unwrap, whole-document file key
        # (V5 has NO per-object md5 derivation — algorithm 1.A).
        if r not in (5, 6):
            raise PdfFormatError(
                f"unsupported encryption version /V {v} /R {r}"
            )
        sm = re.search(rb"/StmF\s*/(\w+)", enc_dict)
        # ISO 32000-2: an absent /StmF defaults to Identity (streams
        # NOT encrypted) — treating it as AESV3 would "decrypt"
        # plaintext streams into garbage (round-13 ADVICE fix)
        if sm is None or sm.group(1) == b"Identity":
            return None, b""
        cm = re.search(rb"/CFM\s*/(\w+)", enc_dict)
        if cm and cm.group(1) != b"AESV3":
            raise PdfFormatError(
                f"unsupported encryption crypt filter method "
                f"{cm.group(1).decode('latin-1')!r}"
            )
        ue = _dict_string(enc_dict, b"UE")
        if len(u) < 48 or ue is None or len(ue) < 32:
            raise PdfFormatError(
                "unsupported encryption: malformed V5 /U //UE entries"
            )
        vsalt, ksalt = u[32:40], u[40:48]
        # verify the EMPTY user password before touching any key
        if _v5_password_hash(b"", vsalt, r) != u[:32]:
            raise PdfFormatError(
                "password-protected document (non-empty user password)"
            )
        ik = _v5_password_hash(b"", ksalt, r)
        file_key = _aes_cbc_nopad(ik, ue[:32], bytes(16), encrypt=False)
        perms = _dict_string(enc_dict, b"Perms")
        if perms is not None and len(perms) >= 16:
            rk = _aes_round_keys(file_key)
            dec = _aes128_decrypt_block(rk, perms[:16])
            if dec[9:12] != b"adb":
                raise PdfFormatError(
                    "unsupported encryption: /Perms does not verify"
                )
        return "aes256", file_key
    method = "rc4"
    if v == 4:
        sm = re.search(rb"/StmF\s*/(\w+)", enc_dict)
        stmf = sm.group(1) if sm else b"Identity"  # absent = Identity (ISO 32000)
        if stmf == b"Identity":
            # streams unencrypted — readable regardless of any password,
            # so skip the /U verification entirely (mirrors the V5 branch)
            return None, b""
        else:
            cm = re.search(rb"/CFM\s*/(\w+)", enc_dict)
            cfm = cm.group(1) if cm else b""
            if cfm == b"AESV2":
                method = "aes"
            elif cfm == b"V2":
                method = "rc4"
            else:
                raise PdfFormatError(
                    f"unsupported encryption crypt filter method "
                    f"{cfm.decode('latin-1')!r}"
                )
    elif v not in (1, 2):
        raise PdfFormatError(f"unsupported encryption version /V {v} /R {r}")
    if r not in (2, 3, 4):
        raise PdfFormatError(f"unsupported encryption revision /R {r}")
    n = 5 if r == 2 else max(5, (_dict_int(enc_dict, b"Length") or 40) // 8)
    id0 = _file_id0(data)
    # algorithm 2: file key from the (empty -> all-pad) user password
    seed = _PW_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    if r >= 4:
        em = re.search(rb"/EncryptMetadata\s+(true|false)", enc_dict)
        if em and em.group(1) == b"false":
            seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    # algorithm 6: verify the empty user password against /U
    if r == 2:
        ok = _rc4(key, _PW_PAD) == u[:32]
    else:
        x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x == u[:16]
    if not ok:
        raise PdfFormatError(
            "password-protected document (non-empty user password)"
        )
    return method, key


def _object_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    import hashlib

    seed = key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        seed += b"sAlT"
    return hashlib.md5(seed).digest()[: min(len(key) + 5, 16)]


def _decrypt_streams(
    objs: dict[int, bytes], gens: dict[int, int], method: str, key: bytes
) -> None:
    """Decrypt every top-level object's stream in place (algorithm 1
    per-object keys), rebuilding each body with a literal /Length so
    downstream slicing stays exact.  XRef streams are never encrypted
    (spec) and objects later unpacked from an /ObjStm are covered by
    the container's decryption — both fall out naturally because this
    runs BEFORE _expand_object_streams and skips /Type /XRef.
    ``gens`` comes from the consumed-stream-aware scan — see the note
    in :func:`_scan_objects`."""
    for num, body in list(objs.items()):
        raw = _stream_bytes(body, objs)
        if raw is None:
            continue
        d = _parse_dict_region(body)
        if re.search(rb"/Type\s*/XRef\b", d):
            continue
        if method == "aes256":
            # V5: the FILE key encrypts every stream (algorithm 1.A) —
            # no per-object md5 derivation
            ok = key
        else:
            ok = _object_key(key, num, gens.get(num, 0), method == "aes")
        dec = (
            _aes_cbc_decrypt(ok, raw)
            if method in ("aes", "aes256")
            else _rc4(ok, raw)
        )
        nd = re.sub(
            rb"/Length\s+\d+(?:\s+\d+\s+R)?",
            b"/Length %d" % len(dec),
            d,
            count=1,
        )
        if nd == d and b"/Length" not in d:
            nd = d[:-2].rstrip() + b" /Length %d >>" % len(dec)
        objs[num] = nd + b"\nstream\n" + dec + b"\nendstream"


def extract_pdf_text(data: bytes) -> str:
    """Text of every page's content stream(s), in page-tree order.

    Raises :class:`PdfFormatError` on the quarantined classes
    (:data:`UNSUPPORTED_FEATURES`) and on documents with no
    recognizable page/content structure — honesty over silent empties.
    """
    if not data.startswith(b"%PDF-"):
        raise PdfFormatError("missing %PDF- header")
    gens: dict[int, int] = {}
    objs = _scan_objects(data, gens_out=gens)
    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data)
    if em:
        enc = objs.get(int(em.group(1)))
        if enc is None:
            raise PdfFormatError(
                "encrypted document with a missing /Encrypt dictionary"
            )
        method, key = _std_security_handler(_parse_dict_region(enc), data)
        if method is not None:
            _decrypt_streams(objs, gens, method, key)
    _expand_object_streams(objs)
    cid_cmaps = _cid_font_cmaps(objs)

    pages = _page_order(objs, data)
    if not pages:
        raise PdfFormatError("no page objects found")

    # font NAME -> cmap maps: page /Resources names win; names collected
    # from every other object's /Font dict (Pages-node inheritance, odd
    # generators) fill the gaps.  Only CID fonts enter the map — simple
    # fonts keep the byte-string decode.
    global_names: dict[bytes, int] = {}
    for body in objs.values():
        global_names.update(_resource_font_names(_parse_dict_region(body), objs))

    texts: list[str] = []
    for num in pages:
        d = _parse_dict_region(objs[num])
        m = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
        if m is None:
            continue
        names = dict(global_names)
        names.update(_resource_font_names(d, objs))
        fonts = {
            name: cid_cmaps[fnum]
            for name, fnum in names.items()
            if fnum in cid_cmaps
        }
        refs = [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
        content = b"\n".join(
            s
            for r in refs
            if r in objs and (s := _decode_stream(objs[r], objs)) is not None
        )
        page_text = _content_text(content, fonts)
        if page_text:
            texts.append(page_text)
    return "\n".join(texts)
