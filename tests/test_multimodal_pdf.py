"""Baseline PDF text extraction: object scan, Flate streams, object
streams, content-stream text operators, string syntax, typed
quarantines — and the decode-lane integration."""

from __future__ import annotations

import zlib

import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
    PdfFormatError,
    UNSUPPORTED_FEATURES,
    extract_pdf_text,
)


def _pdf(objects: dict[int, bytes], trailer: bytes = b"<< /Root 1 0 R >>") -> bytes:
    out = [b"%PDF-1.5"]
    for num in sorted(objects):
        out.append(b"%d 0 obj\n" % num + objects[num] + b"\nendobj")
    out.append(b"trailer\n" + trailer + b"\nstartxref\n0\n%%EOF")
    return b"\n".join(out)


def _stream_obj(d: bytes, payload: bytes) -> bytes:
    return d + b"\nstream\n" + payload + b"\nendstream"


def _doc(content: bytes, flate: bool = False, extra: dict[int, bytes] | None = None) -> bytes:
    payload = zlib.compress(content) if flate else content
    filt = b" /Filter /FlateDecode" if flate else b""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(
            b"<< /Length %d%s >>" % (len(payload), filt), payload
        ),
    }
    if extra:
        objs.update(extra)
    return _pdf(objs)


def test_plain_content_stream():
    pdf = _doc(b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET")
    assert extract_pdf_text(pdf) == "Hello World"


def test_flate_stream_lines_and_tj_kerning():
    content = (
        b"BT 72 720 Td (First line) Tj 0 -14 Td "
        b"[(Se) -50 (cond) -250 (word)] TJ T* (Third) Tj ET"
    )
    pdf = _doc(content, flate=True)
    # -50 is glyph kerning (joined); -250 becomes a word space
    assert extract_pdf_text(pdf) == "First line\nSecond word\nThird"


def test_string_syntax_escapes_octal_nesting_hex():
    content = (
        rb"BT (paren \( pair \) kept) Tj "
        rb"0 -14 Td (octal \101\102\103) Tj "
        b"0 -14 Td ((nested) parens) Tj "
        b"0 -14 Td <48 65 78> Tj ET"
    )
    assert extract_pdf_text(_doc(content)) == (
        "paren ( pair ) kept\noctal ABC\n(nested) parens\nHex"
    )


def test_multiple_pages_and_contents_array():
    c1, c2a, c2b = b"BT (page one) Tj ET", b"BT (two-a) Tj ET", b"BT (two-b) Tj ET"
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length %d >>" % len(c1), c1),
        5: b"<< /Type /Page /Parent 2 0 R /Contents [6 0 R 7 0 R] >>",
        6: _stream_obj(b"<< /Length %d >>" % len(c2a), c2a),
        7: _stream_obj(b"<< /Length %d >>" % len(c2b), c2b),
    })
    assert extract_pdf_text(pdf) == "page one\ntwo-a\ntwo-b"


def test_indirect_length_resolves():
    content = b"BT (indirect) Tj ET"
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length 5 0 R >>", content),
        5: b"%d" % len(content),
    })
    assert extract_pdf_text(pdf) == "indirect"


def test_object_stream_page_tree():
    """PDF 1.5: the page objects live compressed inside a /ObjStm."""
    inner = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    )
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    o3 = b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    header = b"1 0 2 %d 3 %d " % (len(o1), len(o1) + len(o2))
    payload = zlib.compress(header + o1 + o2 + o3)
    content = b"BT (from objstm) Tj ET"
    pdf = _pdf({
        9: _stream_obj(
            b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>"
            % (len(header), len(payload)),
            payload,
        ),
        4: _stream_obj(b"<< /Length %d >>" % len(content), content),
    }, trailer=b"<< /Root 1 0 R >>")
    assert inner  # fixture sanity
    assert extract_pdf_text(pdf) == "from objstm"


def test_quarantines_are_typed():
    ok = _doc(b"BT (x) Tj ET")
    with pytest.raises(PdfFormatError, match="header"):
        extract_pdf_text(b"GIF89a not a pdf")
    with pytest.raises(PdfFormatError, match="encrypted"):
        extract_pdf_text(ok.replace(
            b"<< /Root 1 0 R >>", b"<< /Root 1 0 R /Encrypt 9 0 R >>"
        ))
    with pytest.raises(PdfFormatError, match="filter"):
        extract_pdf_text(_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream_obj(b"<< /Length 4 /Filter /DCTDecode >>", b"\xff\xd8\xff\xe0"),
        }))
    unknown_pred = zlib.compress(b"\x00xy")
    with pytest.raises(PdfFormatError, match="predictor"):
        extract_pdf_text(_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream_obj(
                b"<< /Length %d /Filter /FlateDecode "
                b"/DecodeParms << /Predictor 5 >> >>" % len(unknown_pred),
                unknown_pred,
            ),
        }))
    with pytest.raises(PdfFormatError, match="DecodeParms"):
        extract_pdf_text(_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream_obj(
                b"<< /Length %d /Filter /FlateDecode "
                b"/DecodeParms 9 0 R >>" % len(unknown_pred),
                unknown_pred,
            ),
        }))
    with pytest.raises(PdfFormatError, match="ToUnicode"):
        # text SHOWN under an Identity-H font with no ToUnicode
        extract_pdf_text(_doc(
            b"BT /F1 12 Tf <00480069> Tj ET",
            extra={8: b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>"},
        ).replace(
            b"/Type /Page /Parent 2 0 R /Contents 4 0 R",
            b"/Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 8 0 R >> >>",
        ))
    with pytest.raises(PdfFormatError, match="page"):
        extract_pdf_text(_pdf({1: b"<< /Type /Catalog >>"}))


def test_docstring_matches_unsupported_features():
    """Drift guard (the decode_jpeg convention): every quarantined class
    named in UNSUPPORTED_FEATURES appears in the module docstring."""
    import polygon_io_data_ingestion_pipeline_spark.multimodal.pdf as mod

    for feat in UNSUPPORTED_FEATURES:
        assert feat.split("/")[0].split()[0].lower() in mod.__doc__.lower(), feat


def test_decode_lane_routes_pdf(spark):
    """decode_text_members: %PDF- payloads extract through the codec
    (charset='pdf', decode_ok=true); quarantined PDFs come back NULL
    with decode_ok=false (the mojibake accounting); plain text still
    charset-decodes."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        decode_text_members,
    )

    good = _doc(b"BT (report body text) Tj ET", flate=True)
    bad = _doc(b"BT (x) Tj ET").replace(
        b"<< /Root 1 0 R >>", b"<< /Root 1 0 R /Encrypt 9 0 R >>"
    )
    df = spark.createDataFrame(
        [
            ("a.pdf", good, "application/pdf"),
            ("b.pdf", bad, "application/pdf"),
            ("c.txt", "plain words".encode(), "text/plain"),
        ],
        "member string, payload binary, content_type string",
    )
    rows = {r["member"]: r for r in decode_text_members(df).collect()}
    assert rows["a.pdf"]["text"] == "report body text"
    assert rows["a.pdf"]["charset"] == "pdf" and rows["a.pdf"]["decode_ok"] is True
    assert rows["b.pdf"]["text"] is None and rows["b.pdf"]["decode_ok"] is False
    assert rows["c.txt"]["text"] == "plain words"


def test_indirect_multidigit_length_resolves():
    """Regression: '/Length 10 0 R' once backtracked to a bogus direct
    length of 1 (the lookahead rejected '10' but not its prefix '1');
    a Flate payload ending in newline bytes then got rstripped by the
    endstream fallback and quarantined."""
    content = zlib.compress(b"BT (multi digit) Tj ET")
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length 10 0 R /Filter /FlateDecode >>", content),
        10: b"%d" % len(content),
    })
    assert extract_pdf_text(pdf) == "multi digit"


def test_unknown_digit_escape_drops_backslash():
    """\\8 and \\9 are not octal: the backslash drops, the digit stays
    (spec behavior for unknown escapes) — regression for the
    AttributeError crash path."""
    pdf = _doc(rb"BT (top\88 list) Tj ET")
    assert extract_pdf_text(pdf) == "top88 list"


def test_fake_obj_header_inside_stream_data():
    """Header-shaped bytes inside stream data must neither truncate the
    stream nor register a garbage object that shadows a real one."""
    content = b"BT (before 5 0 obj marker) Tj 0 -14 Td (after) Tj ET"
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length %d >>" % len(content), content),
        5: b"<< /Type /RealObject >>",
    })
    assert extract_pdf_text(pdf) == "before 5 0 obj marker\nafter"
    # and the real object 5 was not shadowed by stream garbage
    from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
        _scan_objects,
    )

    assert b"/Type /RealObject" in _scan_objects(pdf)[5]


def test_page_tree_order_beats_object_number_order():
    """An incrementally-updated PDF appends an INSERTED page with a high
    object number; /Kids order is authoritative."""
    c5, c3 = b"BT (first by tree) Tj ET", b"BT (second by tree) Tj ET"
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [9 0 R 3 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length %d >>" % len(c3), c3),
        9: b"<< /Type /Page /Parent 2 0 R /Contents 10 0 R >>",
        10: _stream_obj(b"<< /Length %d >>" % len(c5), c5),
    })
    assert extract_pdf_text(pdf) == "first by tree\nsecond by tree"


def test_stream_keyword_inside_literal_string_is_not_a_stream():
    """A plain dict object whose literal string contains 'stream\\n'
    must not open a phantom stream that swallows the page objects up
    to some far endstream (regression: the keyword is now anchored
    immediately after the dict)."""
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length 19 >>", b"BT (survives) Tj ET"),
        6: b"<< /Subject (data stream\nprocessing) >>",
    })
    assert extract_pdf_text(pdf) == "survives"


def test_incremental_update_replacement_catalog_wins():
    """An incremental update appends a NEW catalog object and a trailer
    pointing at it; the stale low-numbered catalog must not govern the
    page walk."""
    old_page = b"BT (old page) Tj ET"
    new_page = b"BT (new page) Tj ET"
    base = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(b"<< /Length %d >>" % len(old_page), old_page),
    })
    update = b"\n".join([
        b"7 0 obj\n<< /Type /Catalog /Pages 8 0 R >>\nendobj",
        b"8 0 obj\n<< /Type /Pages /Kids [9 0 R] /Count 1 >>\nendobj",
        b"9 0 obj\n<< /Type /Page /Contents 10 0 R >>\nendobj",
        b"10 0 obj\n<< /Length %d >>\nstream" % len(new_page),
        new_page,
        b"endstream\nendobj",
        b"trailer\n<< /Root 7 0 R /Prev 0 >>\nstartxref\n0\n%%EOF",
    ])
    assert extract_pdf_text(base + b"\n" + update) == "new page"


def _png_predict(data: bytes, columns: int, ftype: int) -> bytes:
    """PNG-predictor-encode ``data`` (len must be a columns multiple)
    as rows of (filter byte + filtered bytes), bpp=1."""
    assert len(data) % columns == 0
    out = bytearray()
    prev = bytes(columns)
    for r in range(len(data) // columns):
        row = data[r * columns : (r + 1) * columns]
        out.append(ftype)
        if ftype == 0:
            out += row
        elif ftype == 1:  # Sub
            out += bytes((row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(columns))
        elif ftype == 2:  # Up
            out += bytes((row[i] - prev[i]) & 0xFF for i in range(columns))
        else:
            raise AssertionError("fixture supports filters 0/1/2")
        prev = row
    return bytes(out)


def _pred_doc(content: bytes, columns: int, ftype: int, predictor: int = 12) -> bytes:
    payload = zlib.compress(_png_predict(content, columns, ftype))
    return _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(
            b"<< /Length %d /Filter /FlateDecode /DecodeParms "
            b"<< /Predictor %d /Columns %d >> >>"
            % (len(payload), predictor, columns), payload,
        ),
    })


def test_flate_png_predictors_decode():
    """PNG predictors 10-15 (/DecodeParms) — what most machine-generated
    PDFs apply to their compressed streams — now decode instead of
    quarantining; Up and Sub row filters exercised."""
    content = b"BT (predictor text here) Tj ET"
    pad = (-len(content)) % 6
    content += b" " * pad
    assert extract_pdf_text(_pred_doc(content, 6, 2)) == "predictor text here"
    assert extract_pdf_text(_pred_doc(content, 6, 1)) == "predictor text here"
    # array-form DecodeParms [ << ... >> ] for the single Flate filter
    payload = zlib.compress(_png_predict(content, 6, 2))
    arr = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(
            b"<< /Length %d /Filter [/FlateDecode] /DecodeParms "
            b"[ << /Predictor 12 /Columns 6 >> ] >>" % len(payload), payload,
        ),
    })
    assert extract_pdf_text(arr) == "predictor text here"


def test_flate_tiff_predictor_2_decodes():
    content = b"BT (tiff horizontal) Tj ET"
    pad = (-len(content)) % 13
    content += b" " * pad
    rows = []
    for r in range(len(content) // 13):
        row = content[r * 13 : (r + 1) * 13]
        rows.append(bytes((row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(13)))
    payload = zlib.compress(b"".join(rows))
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: _stream_obj(
            b"<< /Length %d /Filter /FlateDecode /DecodeParms "
            b"<< /Predictor 2 /Columns 13 >> >>" % len(payload), payload,
        ),
    })
    assert extract_pdf_text(pdf) == "tiff horizontal"


def _cid_doc(content: bytes, cmap: bytes, resources: bytes | None = None) -> bytes:
    res = resources if resources is not None else b"<< /Font << /F7 8 0 R >> >>"
    cm = zlib.compress(cmap)
    return _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources " + res + b" >>",
        4: _stream_obj(b"<< /Length %d >>" % len(content), content),
        8: b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Font "
           b"/Encoding /Identity-H /ToUnicode 9 0 R >>",
        9: _stream_obj(
            b"<< /Length %d /Filter /FlateDecode >>" % len(cm), cm
        ),
    })


_CMAP = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincmap\n"
    b"2 beginbfchar\n<0003> <0020>\n<0156> <FB01>\nendbfchar\n"
    b"2 beginbfrange\n"
    b"<0024> <003D> <0041>\n"            # 0x24..0x3D -> A..Z
    b"<0044> <0046> [<0068> <0065> <006C>]\n"  # list form: h e l
    b"endbfrange\nendcmap\nend\n"
)


def test_identity_h_with_tounicode_decodes():
    """The big real-world class: Identity-H subset font WITH the
    generator's ToUnicode CMap — text extracts through bfchar + both
    bfrange forms; multi-char destinations (fi ligature) expand."""
    # codes: 0x24='A'(range scalar), 0x44 0x45 0x46='h''e''l' (list),
    # 0x03=space (bfchar), 0x0156=fi-ligature -> "fi" via U+FB01
    content = b"BT /F7 12 Tf <0024 0003 0044 0045 0046 0046 0156> Tj ET"
    assert extract_pdf_text(_cid_doc(content, _CMAP)) == "A hellﬁ"


def test_mixed_simple_and_cid_fonts_one_page():
    content = (
        b"BT /F7 12 Tf <00240025> Tj 0 -14 Td "
        b"/Fs 12 Tf (plain bytes) Tj ET"
    )
    res = b"<< /Font << /F7 8 0 R /Fs 11 0 R >> >>"
    pdf = _cid_doc(content, _CMAP, resources=res)
    pdf = pdf.replace(
        b"trailer", b"11 0 obj\n<< /Type /Font /Subtype /Type1 "
        b"/BaseFont /Helvetica >>\nendobj\ntrailer"
    )
    assert extract_pdf_text(pdf) == "AB\nplain bytes"


def test_unused_cid_font_no_longer_blocks_document():
    """Round-9 behavior quarantined any document merely DECLARING an
    Identity-H font; now only showing text under an unmapped one does."""
    pdf = _doc(
        b"BT (simple text) Tj ET",
        extra={8: b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>"},
    )
    assert extract_pdf_text(pdf) == "simple text"


def test_cid_unmapped_code_yields_replacement_char():
    content = b"BT /F7 12 Tf <0024 FFFE 0025> Tj ET"
    assert extract_pdf_text(_cid_doc(content, _CMAP)) == "A�B"


def test_malformed_cmap_never_raises_untyped(capsys):
    """Review regression: a ToUnicode CMap with out-of-Unicode hex
    destinations (<FFFFFF>, or a bfrange running past U+10FFFF) must
    never escape as a raw ValueError — bad destinations map to the
    replacement char, overflowing ranges stop at the Unicode ceiling."""
    bad_cmap = (
        b"begincmap\n"
        b"1 beginbfchar\n<0024> <FFFFFF>\nendbfchar\n"
        b"1 beginbfrange\n<0030> <0039> <10FFFE>\nendbfrange\n"
        b"endcmap\n"
    )
    content = b"BT /F7 12 Tf <0024 0030> Tj ET"
    text = extract_pdf_text(_cid_doc(content, bad_cmap))
    assert text[0] == "�"  # bad bfchar dst -> replacement char
    assert text[1] == chr(0x10FFFE)  # first range entry still valid


def test_indirect_decodeparms_value_quarantines():
    """Review regression: an INDIRECT /Predictor value inside a direct
    DecodeParms dict must quarantine, not silently skip the predictor
    reversal and extract garbage."""
    payload = zlib.compress(b"\x00garbage")
    with pytest.raises(PdfFormatError, match="indirect DecodeParms value"):
        extract_pdf_text(_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: _stream_obj(
                b"<< /Length %d /Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 9 0 R /Columns 5 >> >>" % len(payload),
                payload,
            ),
        }))


# ---------------------------------------------------------------------------
# Standard security handler: empty-user-password decryption (round 11).
# Fixtures are encrypted FORWARD here (RC4 is symmetric; AES gets a
# forward CBC encryptor built on the module's own tables) with /O and
# /U computed per ISO 32000-1 algorithms 3-5, so extract_pdf_text's
# decryption is verified against an independent construction.
# ---------------------------------------------------------------------------
from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
    _object_key,
    aes_cbc_encrypt as _aes_cbc_encrypt,
    _rc4,
    std_file_key,
    std_owner_entry,
    std_user_entry,
    std_v5_entries,
    std_v5_perms,
)

_ID0 = bytes(range(16))


def _compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    return std_owner_entry(owner_pw, user_pw, r, n)


def _file_key(o: bytes, p: int, r: int, n: int, user_pw: bytes = b"") -> bytes:
    return std_file_key(o, p, _ID0, r, n, user_pw=user_pw)


def _compute_u(key: bytes, r: int) -> bytes:
    return std_user_entry(key, _ID0, r)


def _encrypted_doc(mode: str, user_pw: bytes = b"", content: bytes | None = None) -> bytes:
    """One-page document whose content stream is Flate-compressed THEN
    encrypted (the spec's storage order), with /O /U /P computed for
    ``user_pw`` (empty = the owner-password-only case)."""
    content = content or b"BT 72 720 Td (Secret page text) Tj ET"
    p = -44  # typical permissions word (printing allowed, editing not)
    if mode in ("aes256-r5", "aes256-r6"):
        # V5: the file key is RANDOM in real encoders (never derived
        # from the password) — fixed here for determinism; /U //UE
        # computed by the module's own encoder half (std_v5_entries),
        # /O //OE are opaque to the empty-USER-password path
        r = 5 if mode.endswith("r5") else 6
        file_key = bytes(range(32, 64))
        vsalt, ksalt = b"VALSALT0", b"KEYSALT0"
        u, ue = std_v5_entries(user_pw, file_key, vsalt, ksalt, r)
        o, oe = bytes(48), bytes(32)
        perms = std_v5_perms(p, file_key)
        payload = _aes_cbc_encrypt(
            file_key, zlib.compress(content), iv=bytes(range(16, 32))
        )
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: _stream_obj(
                b"<< /Length %d /Filter /FlateDecode >>" % len(payload),
                payload,
            ),
            5: (
                b"<< /Filter /Standard /V 5 /R %d /P %d /Length 256"
                b" /O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s>"
                b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
                % (r, p, o.hex().encode(), u.hex().encode(),
                   oe.hex().encode(), ue.hex().encode(),
                   perms.hex().encode())
            ),
        }
        return _pdf(
            objs,
            trailer=b"<< /Root 1 0 R /Encrypt 5 0 R /ID [<%s> <%s>] >>"
            % (_ID0.hex().encode(), _ID0.hex().encode()),
        )
    if mode == "rc4-r2":
        v, r, n, enc_extra = 1, 2, 5, b""
    elif mode == "rc4-r3":
        v, r, n, enc_extra = 2, 3, 16, b" /Length 128"
    else:  # aes
        v, r, n = 4, 4, 16
        enc_extra = (
            b" /Length 128 /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
            b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        )
    o = _compute_o(b"owner-secret", user_pw, r, n)
    key = _file_key(o, p, r, n, user_pw=user_pw)
    u = _compute_u(key, r)
    payload = zlib.compress(content)
    objkey = _object_key(key, 4, 0, mode == "aes")
    if mode == "aes":
        payload = _aes_cbc_encrypt(objkey, payload, iv=bytes(range(16, 32)))
    else:
        payload = _rc4(objkey, payload)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(
            b"<< /Length %d /Filter /FlateDecode >>" % len(payload), payload
        ),
        5: (
            b"<< /Filter /Standard /V %d /R %d /P %d /O <%s> /U <%s>%s >>"
            % (v, r, p, o.hex().encode(), u.hex().encode(), enc_extra)
        ),
    }
    return _pdf(
        objs,
        trailer=b"<< /Root 1 0 R /Encrypt 5 0 R /ID [<%s> <%s>] >>"
        % (_ID0.hex().encode(), _ID0.hex().encode()),
    )


@pytest.mark.parametrize("mode", ["rc4-r2", "rc4-r3", "aes"])
def test_empty_user_password_decrypts(mode):
    """The owner-password-only case: RC4 R2/R3 and AES-V2 documents
    with an EMPTY user password extract their text end-to-end
    (decrypt -> inflate -> content operators)."""
    assert extract_pdf_text(_encrypted_doc(mode)) == "Secret page text"


@pytest.mark.parametrize("mode", ["rc4-r3", "aes"])
def test_real_user_password_still_quarantines(mode):
    """A genuinely password-protected document (non-empty USER
    password) fails the /U check and quarantines typed — never
    extracts mojibake."""
    pdf = _encrypted_doc(mode, user_pw=b"real-password")
    with pytest.raises(PdfFormatError, match="password-protected"):
        extract_pdf_text(pdf)


def test_unsupported_crypt_filter_quarantines():
    pdf = _encrypted_doc("aes").replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(PdfFormatError, match="crypt filter"):
        extract_pdf_text(pdf)


@pytest.mark.parametrize("v_r", [(4, 4), (5, 6)])
def test_absent_stmf_defaults_to_identity_streams(v_r):
    """ISO 32000: an /Encrypt dict that OMITS /StmF leaves streams
    unencrypted (Identity is the default) — both the V4 and V5
    handlers must extract the plaintext content instead of
    'decrypting' it into garbage (round-13 ADVICE fix).  The /O //U
    entries here are deliberately junk: with Identity streams the
    content is readable regardless of any password."""
    v, r = v_r
    content = b"BT 72 720 Td (Plain despite Encrypt) Tj ET"
    payload = zlib.compress(content)
    enc = (
        b"<< /Filter /Standard /V %d /R %d /P -44 /Length 256"
        b" /O <%s> /U <%s>"
        b" /CF << /StdCF << /CFM /%s /AuthEvent /DocOpen >> >> >>"
        % (v, r, (b"00" * 48), (b"00" * 48),
           b"AESV3" if v == 5 else b"AESV2")
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(
            b"<< /Length %d /Filter /FlateDecode >>" % len(payload), payload
        ),
        5: enc,
    }
    pdf = _pdf(
        objs,
        trailer=b"<< /Root 1 0 R /Encrypt 5 0 R /ID [<%s> <%s>] >>"
        % (_ID0.hex().encode(), _ID0.hex().encode()),
    )
    assert extract_pdf_text(pdf) == "Plain despite Encrypt"


def test_non_standard_handler_quarantines():
    pdf = _encrypted_doc("rc4-r3").replace(
        b"/Filter /Standard", b"/Filter /MySecurity"
    )
    with pytest.raises(PdfFormatError, match="encryption handler"):
        extract_pdf_text(pdf)


def test_gen_map_ignores_headers_inside_streams():
    """The decryptor's generation map comes from the consumed-stream-
    aware scan: header-shaped bytes INSIDE a stream's data must not
    override a real object's generation (they would poison the
    per-object decryption key — round-11 review finding)."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
        _scan_objects,
    )

    payload = b"prefix 4 7 obj suffix"  # fake header inside stream data
    pdf = _pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        4: _stream_obj(b"<< /Length %d >>" % len(payload), payload),
    })
    gens: dict[int, int] = {}
    objs = _scan_objects(pdf, gens_out=gens)
    assert 4 in objs and gens[4] == 0  # the REAL gen, not the in-stream 7


@pytest.mark.parametrize("mode", ["aes256-r5", "aes256-r6"])
def test_aes256_empty_user_password_decrypts(mode):
    """AES-256 (V5 R5/R6) owner-password-only documents extract their
    text end-to-end: SHA-2 password hash (plain SHA-256 at R5, the
    iterated algorithm-2.B at R6) verified against /U, the file key
    unwrapped from /UE, /Perms verified, and every stream decrypted
    with the whole-document key (algorithm 1.A — NO per-object md5)."""
    assert extract_pdf_text(_encrypted_doc(mode)) == "Secret page text"


@pytest.mark.parametrize("mode", ["aes256-r5", "aes256-r6"])
def test_aes256_real_user_password_quarantines(mode):
    pdf = _encrypted_doc(mode, user_pw=b"real-password")
    with pytest.raises(PdfFormatError, match="password-protected"):
        extract_pdf_text(pdf)


def test_aes256_tampered_perms_quarantines():
    """A /Perms block that does not decrypt to the 'adb' sentinel under
    the unwrapped file key means the document is inconsistent — typed
    quarantine, never silent acceptance."""
    import re as _re

    pdf = _encrypted_doc("aes256-r6")
    m = _re.search(rb"/Perms <([0-9a-f]+)>", pdf)
    bad = bytearray(bytes.fromhex(m.group(1).decode()))
    bad[0] ^= 0xFF
    pdf = pdf.replace(m.group(1), bad.hex().encode())
    with pytest.raises(PdfFormatError, match="Perms"):
        extract_pdf_text(pdf)


def test_aes256_core_fips_197_known_answers():
    """The 256-bit schedule is anchored to FIPS-197 appendix C.3 (and
    C.1 re-pins the 128-bit path) — an external vector, so the
    encoder/decoder pair cannot agree on a transcription error."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
        _aes128_decrypt_block,
        _aes128_encrypt_block,
        _aes_round_keys,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    ct256 = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rk = _aes_round_keys(k256)
    assert _aes128_encrypt_block(rk, pt) == ct256
    assert _aes128_decrypt_block(rk, ct256) == pt
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct128 = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rk = _aes_round_keys(k128)
    assert _aes128_encrypt_block(rk, pt) == ct128
    assert _aes128_decrypt_block(rk, ct128) == pt


def test_hash_2b_independent_restatement():
    """hash_2b checked against a structurally independent restatement
    (bytes-level loop, pycryptodome-style flow) — catches transcription
    slips in the production implementation; the AES core underneath is
    separately FIPS-anchored."""
    import hashlib

    from polygon_io_data_ingestion_pipeline_spark.multimodal.pdf import (
        _aes128_encrypt_block,
        _aes_round_keys,
        hash_2b,
    )

    def reference(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
        digests = {0: hashlib.sha256, 1: hashlib.sha384, 2: hashlib.sha512}
        k = hashlib.sha256(pw + salt + udata).digest()
        rounds = 0
        while True:
            block = (pw + k + udata) * 64
            rk = _aes_round_keys(k[:16])
            prev, out = k[16:32], bytearray()
            for off in range(0, len(block), 16):
                ct = _aes128_encrypt_block(
                    rk,
                    bytes(x ^ y for x, y in zip(block[off : off + 16], prev)),
                )
                out += ct
                prev = ct
            k = digests[sum(out[:16]) % 3](bytes(out)).digest()
            rounds += 1
            if rounds >= 64 and out[-1] <= rounds - 32:
                return k[:32]

    for pw, salt in [
        (b"", b"VALSALT0"),
        (b"", b"KEYSALT0"),
        (b"real-password", b"\x00" * 8),
        (b"x" * 40, b"saltsalt"),
    ]:
        assert hash_2b(pw, salt) == reference(pw, salt)
