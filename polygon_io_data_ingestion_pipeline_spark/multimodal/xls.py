"""Legacy Excel (.xls, BIFF8) cell extraction, pure stdlib — the
round-12 verdict ask #6: crawls carry plenty of old binary workbooks
that previously quarantined out of the sheet lane.

Two layers, both implemented here from the public specs:

- **CFB container** ([MS-CFB], the OLE2 compound file): header-declared
  sector size, DIFAT -> FAT chain walk, 128-byte directory entries, and
  the mini-stream (64-byte sectors inside the root entry's chain) for
  streams under the 4096-byte cutoff.  The ``Workbook`` (or legacy
  ``Book``) stream is the only one consumed.
- **BIFF records** ([MS-XLS]): the workbook-globals substream
  (``SST`` shared strings with CONTINUE re-option-byte splits, ``XF``
  cell formats, custom ``FORMAT`` codes, ``BOUNDSHEET`` names) followed
  by one substream per sheet (``LABELSST``/``LABEL``/``NUMBER``/``RK``/
  ``MULRK``/``BOOLERR`` cells; ``FORMULA``+cached ``STRING`` and error
  cells SKIP with the same accounting as the XLSX/ODS lanes).  The
  workbook ``BOF`` version field gates the dialect (round 13): 0x0600
  decodes as BIFF8, 0x0500 as BIFF5/7 (codepage BYTE strings — inline
  ``LABEL`` cells, short ``BOUNDSHEET``/``FORMAT`` names, ``CODEPAGE``
  record selects the codec), anything else is a typed quarantine —
  never a silent BIFF8-semantics misparse.

Typing converges on the modern lane's contract
(:mod:`.sheet`): strings ``s``, numbers ``n`` (integral doubles render
without a trailing ``.0`` so an XLSX/ODS/XLS trio of the same workbook
hashes identically), booleans ``b`` (``value_num`` 0/1), date-STYLED
numbers ``d`` (ISO string via the shared serial conversion — date-ness
is a format in BIFF exactly as it is a style in xlsx; the junk-date
fallback keeps honest numbers).  ``FILEPASS`` (encrypted workbook)
quarantines typed — RC4/XOR workbook encryption is a different
trust boundary than the PDF empty-password case (there is no
"empty-password" convention for .xls in crawls).

``build_xls`` is the fixture-encoder half (the std_* discipline): it
writes a real CFB + BIFF8 file this module then decodes, with the
Workbook stream padded past the mini-stream cutoff so the container
exercises the regular FAT path.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF

#: record ids
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_XF = 0x00E0
_FORMAT = 0x041E
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F

_CODEPAGE = 0x0042

#: sane bound on declared counts in a <2^31-byte file (DoS guard, same
#: discipline as the sheet lane's _MAX_REPEAT/_MAX_CELLS)
_MAX_DECL = 1 << 22

#: BOUNDSHEET count cap — Excel's own UI limit is 255 sheets and no
#: real workbook approaches this; an untrusted file declaring ~100k
#: sheet entries was a per-sheet-walk stall vector (round-13 ADVICE)
_MAX_SHEETS = 4096


class _Err(ValueError):
    pass


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------

def cfb_has_stream(
    data: bytes, names: tuple[str, ...] = ("Workbook", "Book")
) -> bool:
    """Directory-only probe: does this CFB container hold a stream with
    one of ``names``?  Walks header/DIFAT/FAT/directory but never
    materializes any stream's sectors — the sniff path runs this for
    EVERY OLE2 payload on a crawl (.doc/.ppt/.msi included), so paying
    the full Workbook-stream join there would double the per-workbook
    container cost and waste it entirely on non-sheet files (round-12
    review finding)."""
    try:
        _layout(data, names)
        return True
    except Exception:
        return False


def cfb_stream(data: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """Bytes of the first directory stream whose name is in ``names``.
    Raises ValueError (typed by the caller into SheetFormatError) on a
    malformed container or a missing stream."""
    (start, size), root_start, root_size, cutoff, mssz, fat, \
        minifat_start, n_minifat, sector, chain, limit = _layout(data, names)
    if size >= cutoff:
        blob = b"".join(sector(i) for i in chain(start, fat, limit))
        return blob[:size]
    # mini stream: 64-byte sectors inside the root entry's regular chain
    mini_container = b"".join(
        sector(i) for i in chain(root_start, fat, limit)
    )[:root_size]
    minifat: list[int] = []
    for i in chain(minifat_start, fat, limit) if n_minifat else []:
        s = sector(i)
        minifat += [_u32(s, 4 * j) for j in range(len(s) // 4)]
    out = b"".join(
        mini_container[i * mssz : (i + 1) * mssz]
        for i in chain(start, minifat, limit)
    )
    return out[:size]


def _layout(data: bytes, names: tuple[str, ...]):
    """Parse header + DIFAT + FAT + directory; locate the target stream
    WITHOUT materializing it.  Returns everything :func:`cfb_stream`
    needs to then read the sectors."""
    if not data.startswith(CFB_MAGIC) or len(data) < 512:
        raise _Err("not a CFB container")
    ssz = 1 << _u16(data, 30)
    mssz = 1 << _u16(data, 32)
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    n_minifat = _u32(data, 64)
    difat_start = _u32(data, 68)

    def sector(idx: int) -> bytes:
        off = 512 + idx * ssz
        if off + ssz > len(data):
            raise _Err("sector past end of file")
        return data[off : off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat: list[int] = [
        _u32(data, 76 + 4 * i) for i in range(109)
    ]
    seen = set()
    cur = difat_start
    while cur not in (_ENDOFCHAIN, _FREESECT) and cur < 0xFFFFFFFA:
        if cur in seen or len(seen) > _MAX_DECL:
            raise _Err("DIFAT chain cycle")
        seen.add(cur)
        s = sector(cur)
        difat += [_u32(s, 4 * i) for i in range((ssz // 4) - 1)]
        cur = _u32(s, ssz - 4)
    fat_sectors = [x for x in difat[: max(n_fat, 0)] if x < 0xFFFFFFFA]
    fat: list[int] = []
    for fs in fat_sectors:
        s = sector(fs)
        fat += [_u32(s, 4 * i) for i in range(ssz // 4)]

    def chain(start: int, table: list[int], limit: int) -> list[int]:
        out: list[int] = []
        cur = start
        while cur not in (_ENDOFCHAIN, _FREESECT) and cur < 0xFFFFFFFA:
            if cur >= len(table) or len(out) > limit:
                raise _Err("broken sector chain")
            out.append(cur)
            cur = table[cur]
        return out

    limit = len(data) // 64 + 16
    directory = b"".join(sector(i) for i in chain(dir_start, fat, limit))
    entries = []
    for off in range(0, len(directory) - 127, 128):
        nlen = _u16(directory, off + 64)
        if not 2 <= nlen <= 64:
            continue
        name = directory[off : off + nlen - 2].decode("utf-16-le", "replace")
        entries.append(
            (
                name,
                directory[off + 66],  # object type
                _u32(directory, off + 116),  # start sector
                _u32(directory, off + 120),  # size (low dword)
            )
        )
    if not entries or entries[0][1] != 5:
        raise _Err("missing CFB root entry")
    root_start, root_size = entries[0][2], entries[0][3]
    target = next(
        ((st, sz) for name, typ, st, sz in entries
         if typ == 2 and name in names),
        None,
    )
    if target is None:
        raise _Err("no Workbook stream in container")
    if target[1] > len(data):
        raise _Err("stream size past end of file")
    return (
        target, root_start, root_size, cutoff, mssz, fat,
        minifat_start, n_minifat, sector, chain, limit,
    )


# ---------------------------------------------------------------------------
# BIFF8 primitives
# ---------------------------------------------------------------------------

class _SSTReader:
    """Cursor over the concatenated SST + CONTINUE payloads that knows
    where the record boundaries fall: a unicode string whose CHARACTER
    data crosses into a CONTINUE record restarts with a fresh options
    byte there (the grbit re-declaration — the one genuinely tricky
    part of BIFF8), while length/run/ext fields never re-declare."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.si = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.segs[self.si]) - self.off

    def _advance(self) -> None:
        while self.si < len(self.segs) and self._avail() == 0:
            self.si += 1
            self.off = 0

    def take(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.si >= len(self.segs):
                raise _Err("truncated SST")
            k = min(n, self._avail())
            seg = self.segs[self.si]
            out += seg[self.off : self.off + k]
            self.off += k
            n -= k
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        if cch > _MAX_DECL:
            raise _Err("absurd SST string length")
        opts = self.take(1)[0]
        n_runs = struct.unpack("<H", self.take(2))[0] if opts & 0x08 else 0
        ext = struct.unpack("<I", self.take(4))[0] if opts & 0x04 else 0
        if n_runs > _MAX_DECL or ext > _MAX_DECL:
            raise _Err("absurd SST run/ext size")
        wide = opts & 0x01
        chars: list[str] = []
        remaining = cch
        while remaining > 0:
            self._advance()
            if self.si >= len(self.segs):
                raise _Err("truncated SST string")
            avail = self._avail()
            if avail == 0:
                continue
            per = 2 if wide else 1
            k = min(remaining, avail // per)
            if k == 0:
                # a lone byte at a segment end cannot hold a wide char;
                # the continuation re-declares width — consume nothing,
                # step to the next segment's option byte below
                k = 0
            raw = self.take(k * per)
            chars.append(
                raw.decode("utf-16-le" if wide else "latin-1", "replace")
            )
            remaining -= k
            if remaining > 0:
                # crossing into a CONTINUE record: fresh options byte
                self._advance()
                wide = self.take(1)[0] & 0x01
        # rich runs and extended data follow the characters; skip
        self.take(4 * n_runs)
        self.take(ext)
        return "".join(chars)


def _parse_string8(payload: bytes, off: int) -> str:
    """Inline BIFF8 unicode string (LABEL record form) — no CONTINUE
    splits apply inside a single cell record."""
    cch = _u16(payload, off)
    opts = payload[off + 2]
    p = off + 3
    n_runs = 0
    ext = 0
    if opts & 0x08:
        n_runs = _u16(payload, p)
        p += 2
    if opts & 0x04:
        ext = _u32(payload, p)
        p += 4
    if opts & 0x01:
        return payload[p : p + 2 * cch].decode("utf-16-le", "replace")
    return payload[p : p + cch].decode("latin-1", "replace")


def _codec_for(codepage: int | None) -> str:
    """Python codec for a BIFF CODEPAGE value; byte strings in BIFF5
    records decode through this (BIFF8 compressed strings stay latin-1:
    they are low UTF-16 bytes by spec, not codepage text)."""
    import codecs

    if codepage is None:
        return "latin-1"
    if codepage == 10000:
        return "mac-roman"
    try:
        codecs.lookup(f"cp{codepage}")
        return f"cp{codepage}"
    except LookupError:
        return "latin-1"


def _parse_bytestring16(payload: bytes, off: int, enc: str) -> str:
    """BIFF5 inline byte string with a 16-bit length (LABEL form): cch
    then codepage bytes — NO options byte (reading one is exactly the
    BIFF8-semantics misparse the round-13 version gate exists to stop)."""
    cch = _u16(payload, off)
    return payload[off + 2 : off + 2 + cch].decode(enc, "replace")


def _rk_value(rk: int) -> float:
    v: float
    if rk & 0x02:
        # 30-bit signed integer
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0] >> 2)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if rk & 0x01 else v


def _num_str(v: float) -> str:
    """Render a double the way the modern lanes carry numeric raws:
    integral values without the trailing .0 (an XLSX fixture writes
    '7', and the typed-row hash must converge across containers)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _records(stream: bytes, start: int = 0):
    """Record walk from ``start`` — per-sheet substreams pass their
    BOUNDSHEET offset here instead of slicing ``stream[bof_pos:]``
    (a full-stream copy PER SHEET: with a crafted workbook declaring
    ~100k BOUNDSHEETs that was an O(n_sheets x stream_size)
    executor-stall vector — round-13 ADVICE fix)."""
    pos, n = start, len(stream)
    while pos + 4 <= n:
        rid = _u16(stream, pos)
        ln = _u16(stream, pos + 2)
        yield rid, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def xls_cells(data: bytes):
    """(cells, n_formula, n_error) from a BIFF8 or BIFF5 ``.xls``
    payload — the same typed-rows contract as the XLSX/ODS lanes
    (sheet.py Cells).  The workbook BOF's version field selects the
    dialect; unsupported versions, malformed containers and
    FILEPASS-encrypted workbooks raise ValueError (typed quarantine)."""
    from .sheet import _MAX_CELLS, _serial_to_iso, _is_date_format, _BUILTIN_DATE_FMTS

    stream = cfb_stream(data)
    recs = list(_records(stream))
    # ---- BOF version gate (round-13 verdict ask #1): the container
    # probe accepts both stream names ("Workbook"/"Book"), but "Book"
    # is the BIFF5 name and BIFF5 strings are codepage BYTE strings —
    # decoding them through the BIFF8 unicode form emits silently-
    # garbled rows.  Decode 0x0600 as BIFF8 and 0x0500 as BIFF5
    # (Excel 5/95 share the layouts we read); anything else is a
    # typed quarantine, never a best-effort misparse. ----
    if not recs or recs[0][0] != _BOF or len(recs[0][1]) < 4:
        raise _Err("missing workbook BOF record")
    vers = _u16(recs[0][1], 0)
    if vers not in (0x0500, 0x0600):
        raise _Err(f"unsupported BIFF version 0x{vers:04X}")
    biff5 = vers == 0x0500
    # ---- globals substream: SST, XF formats, sheet names ----
    sst: list[str] = []
    xf_fmt: list[int] = []
    fmt_raw: list[bytes] = []
    bs_raw: list[bytes] = []
    codepage: int | None = None
    pos = 0
    # record positions, to validate BOUNDSHEET offsets point at records
    positions: set[int] = set()
    for rid, payload in recs:
        positions.add(pos)
        pos += 4 + len(payload)
    k = 0
    while k < len(recs):
        rid, payload = recs[k]
        if rid == _FILEPASS:
            raise _Err("encrypted workbook (FILEPASS)")
        if rid == _EOF:
            break  # end of the globals substream
        if rid == _SST:
            segs = [payload[8:]]
            j = k + 1
            while j < len(recs) and recs[j][0] == _CONTINUE:
                segs.append(recs[j][1])
                j += 1
            n_unique = _u32(payload, 4)
            if n_unique > _MAX_DECL:
                raise _Err("absurd SST count")
            rd = _SSTReader(segs)
            sst = [rd.read_string() for _ in range(n_unique)]
        elif rid == _XF:
            xf_fmt.append(_u16(payload, 2))
        elif rid == _CODEPAGE:
            codepage = _u16(payload, 0)
        elif rid == _FORMAT:
            # parsed after the loop: BIFF5 format strings need the
            # CODEPAGE value, which may be declared later in globals
            fmt_raw.append(payload)
        elif rid == _BOUNDSHEET:
            if len(bs_raw) >= _MAX_SHEETS:
                raise _Err(f"absurd sheet count (> {_MAX_SHEETS})")
            bs_raw.append(payload)
        k += 1

    enc = _codec_for(codepage)
    custom_fmt: dict[int, str] = {}
    for payload in fmt_raw:
        fid = _u16(payload, 0)
        if biff5:
            # ifmt(2) + cch BYTE + codepage chars
            custom_fmt[fid] = payload[3 : 3 + payload[2]].decode(enc, "replace")
        else:
            custom_fmt[fid] = _parse_string8(payload, 2)
    sheets: list[tuple[str, int]] = []  # (name, BOF stream position)
    seen_bof: set[int] = set()
    for payload in bs_raw:
        bof_pos = _u32(payload, 0)
        if bof_pos in seen_bof:
            # two sheets cannot share a substream; duplicate offsets
            # only appear in crafted files (walk-amplification vector)
            continue
        seen_bof.add(bof_pos)
        cch = payload[6]
        if biff5:
            # name: BYTE length + codepage chars (no options byte)
            name = payload[7 : 7 + cch].decode(enc, "replace")
        else:
            # name: BYTE length + option flags + chars (short form)
            opts = payload[7]
            raw = payload[8 : 8 + (2 * cch if opts & 1 else cch)]
            name = raw.decode("utf-16-le" if opts & 1 else "latin-1", "replace")
        sheets.append((name, bof_pos))

    date_fmt_ids = set(_BUILTIN_DATE_FMTS) | {
        fid for fid, code in custom_fmt.items() if _is_date_format(code)
    }

    def is_date_xf(ixfe: int) -> bool:
        return ixfe < len(xf_fmt) and xf_fmt[ixfe] in date_fmt_ids

    cells: list[tuple] = []
    n_formula = n_error = 0

    def emit_number(sheet: str, row: int, col: int, ixfe: int, v: float) -> None:
        if len(cells) >= _MAX_CELLS:
            raise _Err(f"cell budget exceeded (> {_MAX_CELLS} cells)")
        if is_date_xf(ixfe):
            try:
                cells.append((sheet, row + 1, col + 1, "d", _serial_to_iso(v), v))
                return
            except (OverflowError, ValueError, OSError):
                pass  # junk styled as a date stays an honest number
        cells.append((sheet, row + 1, col + 1, "n", _num_str(v), v))

    for name, bof_pos in sheets:
        # walk this sheet's substream (BOF .. EOF) by stream offset
        if bof_pos not in positions:
            raise _Err("BOUNDSHEET offset points outside the stream")
        for rid, payload in _records(stream, bof_pos):
            if rid == _EOF:
                break
            if len(cells) > _MAX_CELLS:
                raise _Err(f"cell budget exceeded (> {_MAX_CELLS} cells)")
            if rid == _LABELSST:
                row, col, ixfe = _u16(payload, 0), _u16(payload, 2), _u16(payload, 4)
                isst = _u32(payload, 6)
                if isst >= len(sst):
                    raise _Err("LABELSST index out of range")
                cells.append((name, row + 1, col + 1, "s", sst[isst], None))
            elif rid == _LABEL:
                row, col = _u16(payload, 0), _u16(payload, 2)
                val = (
                    _parse_bytestring16(payload, 6, enc)
                    if biff5
                    else _parse_string8(payload, 6)
                )
                cells.append((name, row + 1, col + 1, "s", val, None))
            elif rid == _NUMBER:
                row, col, ixfe = _u16(payload, 0), _u16(payload, 2), _u16(payload, 4)
                v = struct.unpack_from("<d", payload, 6)[0]
                emit_number(name, row, col, ixfe, v)
            elif rid == _RK:
                row, col, ixfe = _u16(payload, 0), _u16(payload, 2), _u16(payload, 4)
                emit_number(name, row, col, ixfe, _rk_value(_u32(payload, 6)))
            elif rid == _MULRK:
                row, col0 = _u16(payload, 0), _u16(payload, 2)
                n_rk = (len(payload) - 6) // 6
                for j in range(n_rk):
                    ixfe = _u16(payload, 4 + 6 * j)
                    rk = _u32(payload, 6 + 6 * j)
                    emit_number(name, row, col0 + j, ixfe, _rk_value(rk))
            elif rid == _BOOLERR:
                row, col = _u16(payload, 0), _u16(payload, 2)
                val, is_err = payload[6], payload[7]
                if is_err:
                    n_error += 1
                else:
                    cells.append(
                        (name, row + 1, col + 1, "b",
                         "true" if val else "false", float(bool(val)))
                    )
            elif rid == _FORMULA:
                n_formula += 1
            # BLANK/MULBLANK/STRING(cached formula result)/dims: skip
    return cells, n_formula, n_error


# ---------------------------------------------------------------------------
# fixture encoder (the std_* discipline: a real file this module decodes)
# ---------------------------------------------------------------------------

def _enc_string8(s: str, short: bool = False) -> bytes:
    wide = any(ord(c) > 0xFF for c in s)
    head = (
        struct.pack("<B", len(s)) if short else struct.pack("<H", len(s))
    ) + struct.pack("<B", 1 if wide else 0)
    body = s.encode("utf-16-le") if wide else s.encode("latin-1")
    return head + body


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def build_xls(cells: list[tuple], sheet: str = "S", biff5: bool = False) -> bytes:
    """Minimal real CFB + BIFF8 workbook from ``(row, col, type, value)``
    tuples (types 's'/'n'/'b'/'d'/'f'/'e' — 'd' takes an Excel serial
    number and styles it with built-in date format 14; 'f' emits a
    FORMULA record for skip-accounting tests).  The Workbook stream
    pads past the 4096-byte mini-stream cutoff so the container takes
    the regular FAT path.

    ``biff5=True`` emits the pre-97 dialect this module's BIFF5 lane
    decodes (round-13 verdict ask #8): BOF vers 0x0500, a CODEPAGE 1252
    record, byte-string ``LABEL`` cells instead of SST/LABELSST, the
    short no-options-byte ``BOUNDSHEET`` name, and the legacy ``Book``
    CFB stream name."""
    strings: list[str] = []
    string_idx: dict[str, int] = {}
    for _r, _c, t, v in cells:
        if t == "s" and v not in string_idx:
            string_idx[v] = len(strings)
            strings.append(v)

    vers = 0x0500 if biff5 else 0x0600
    # globals: BOF, XF x2 (0 general fmt 0, 1 date fmt 14), SST (BIFF8),
    # BOUNDSHEET (offset patched), EOF
    bof_g = _rec(_BOF, struct.pack("<HHHHII", vers, 0x0005, 0, 0, 0, 0))
    xfs = _rec(_XF, struct.pack("<HHHHHHHHHH", 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    xfs += _rec(_XF, struct.pack("<HHHHHHHHHH", 0, 14, 0, 0, 0, 0, 0, 0, 0, 0))
    if biff5:
        sst_rec = _rec(_CODEPAGE, struct.pack("<H", 1252))
        bs_name = struct.pack("<B", len(sheet)) + sheet.encode("cp1252")
    else:
        sst_payload = struct.pack("<II", len(strings), len(strings)) + b"".join(
            _enc_string8(s) for s in strings
        )
        sst_rec = _rec(_SST, sst_payload)
        bs_name = _enc_string8(sheet, short=True)
    boundsheet = _rec(_BOUNDSHEET, struct.pack("<IH", 0, 0) + bs_name)
    eof = _rec(_EOF, b"")
    globals_len = len(bof_g) + len(xfs) + len(sst_rec) + len(boundsheet) + len(eof)
    boundsheet = _rec(
        _BOUNDSHEET, struct.pack("<IH", globals_len, 0) + bs_name
    )

    body = bytearray(_rec(_BOF, struct.pack("<HHHHII", vers, 0x0010, 0, 0, 0, 0)))
    for r, c, t, v in cells:
        r0, c0 = r - 1, c - 1
        if t == "s":
            if biff5:
                raw = v.encode("cp1252", "replace")
                body += _rec(
                    _LABEL,
                    struct.pack("<HHHH", r0, c0, 0, len(raw)) + raw,
                )
            else:
                body += _rec(
                    _LABELSST,
                    struct.pack("<HHHI", r0, c0, 0, string_idx[v]),
                )
        elif t == "n":
            body += _rec(_NUMBER, struct.pack("<HHHd", r0, c0, 0, float(v)))
        elif t == "d":
            body += _rec(_NUMBER, struct.pack("<HHHd", r0, c0, 1, float(v)))
        elif t == "b":
            body += _rec(
                _BOOLERR, struct.pack("<HHHBB", r0, c0, 0, 1 if v else 0, 0)
            )
        elif t == "f":
            body += _rec(_FORMULA, struct.pack("<HHH", r0, c0, 0) + bytes(16))
        elif t == "e":
            # error cell (#DIV/0! = 0x07): BOOLERR with fError set
            body += _rec(
                _BOOLERR, struct.pack("<HHHBB", r0, c0, 0, 0x07, 1)
            )
        else:
            raise ValueError(f"build_xls: unknown cell type {t!r}")
    body += _rec(_EOF, b"")

    stream = bof_g + xfs + sst_rec + boundsheet + eof + bytes(body)
    # pad past the mini-stream cutoff: trailing zero bytes after the
    # final EOF are outside every record and ignored by the walker
    if len(stream) < 4096:
        stream += bytes(4096 - len(stream))
    return _cfb_wrap(stream, name="Book" if biff5 else "Workbook")


def _cfb_wrap(stream: bytes, name: str = "Workbook") -> bytes:
    """One-stream CFB container (512-byte sectors, no mini stream)."""
    ssz = 512
    n_stream_sectors = (len(stream) + ssz - 1) // ssz
    # sector layout: [0..n-1] stream, [n] directory, [n+1] FAT
    dir_sector = n_stream_sectors
    fat_sector = n_stream_sectors + 1
    total = n_stream_sectors + 2

    def dir_entry(ename: str, typ: int, start: int, size: int,
                  color: int = 1, child: int = 0xFFFFFFFF) -> bytes:
        raw = ename.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = typ
        e[67] = color  # black
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    root = dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
    wb = dir_entry(name, 2, 0, len(stream))
    free = bytes(128)
    directory = (root + wb + free + free).ljust(ssz, b"\x00")

    fat = [_FREESECT] * (ssz // 4)
    for i in range(n_stream_sectors - 1):
        fat[i] = i + 1
    fat[n_stream_sectors - 1] = _ENDOFCHAIN
    fat[dir_sector] = _ENDOFCHAIN
    fat[fat_sector] = 0xFFFFFFFD  # FATSECT marker
    fat_bytes = b"".join(struct.pack("<I", x) for x in fat)

    header = bytearray(512)
    header[:8] = CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, dir_sector)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, fat_sector)
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    padded = stream.ljust(n_stream_sectors * ssz, b"\x00")
    return bytes(header) + padded + directory + fat_bytes
