"""Baseline TIFF 6.0 codec, pure stdlib + NumPy — the scientific/'scan'
raster format of the multimodal family.

Surface (the baseline subset real crawl/archive corpora actually carry):

- **Decode**: both byte orders (``II``/``MM``), first IFD, 8-bit
  grayscale (PhotometricInterpretation 0/1 — MinIsWhite inverts) and
  RGB (2), SamplesPerPixel 1/3, chunky planar config, strip layout
  (any RowsPerStrip), Compression 1 (none), 32773 (PackBits) and 5
  (TIFF-LZW, MSB-first codes with the spec's early-change width bump),
  Predictor 1/2 (horizontal differencing undone by a per-row cumsum).
- **Encode**: little-endian, grayscale/RGB uint8, compression none /
  PackBits / LZW, optional horizontal predictor, configurable
  RowsPerStrip — encode->decode is EXACT (lossless roundtrip tests).

Unsupported variants (tiles, 16-bit, palette, CMYK, JPEG-in-TIFF,
planar=2) raise :class:`TiffFormatError` — same quarantine contract as
the other codecs.  Per-pixel work is vectorized NumPy; only the LZW
code loop is Python, riding the Arrow-batched ``mapInPandas`` lane like
every codec here.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffFormatError(ValueError):
    """Unsupported or corrupt TIFF stream."""


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd_values(data: bytes, end: str, etype: int, count: int, raw: bytes) -> list[int]:
    size = _TYPE_SIZES.get(etype)
    if size is None:
        raise TiffFormatError(f"unsupported IFD entry type {etype}")
    total = size * count
    buf = raw[:4] if total <= 4 else None
    if buf is None:
        (off,) = struct.unpack(end + "I", raw)
        buf = data[off : off + total]
        if len(buf) < total:
            raise TiffFormatError("IFD value overruns file")
    if etype in (1, 2):
        return list(buf[:count])
    fmt = {3: "H", 4: "I", 5: "Q"}[etype]
    if etype == 5:  # rational: return numerator/denominator pairs flat
        vals = struct.unpack(end + "I" * (2 * count), buf[: 8 * count])
        return list(vals)
    return list(struct.unpack(end + fmt * count, buf[:total]))


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                raise TiffFormatError("PackBits repeat overruns strip")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise TiffFormatError("PackBits strip shorter than expected")
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the TIFF spec recommends row-aligned packing)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i = j + 1
            continue
        # literal run: until next >=2 repeat or 128 cap
        j = i
        while (
            j + 1 < n
            and not (j + 2 < n and row[j + 1] == row[j + 2])
            and j - i < 127
        ):
            j += 1
        out += bytes([j - i]) + row[i : j + 1]
        i = j + 1
    return bytes(out)


_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW (MSB-first bit order, early-change width bump)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitbuf = 0
    bits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bits += 8
        while bits >= width:
            code = (bitbuf >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == _CLEAR:
                reset()
                prev = None
                continue
            if code == _EOI:
                if len(out) < expected:
                    raise TiffFormatError("LZW EOI before expected bytes")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise TiffFormatError("LZW code before first literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffFormatError("LZW code beyond table")
            out += entry
            prev = entry
            # early change, decoder side: the decoder's table lags the
            # encoder's by ONE assignment (the encoder adds w+c the
            # moment it emits w; the decoder adds it while processing
            # the NEXT code), so the encoder's bump at next_code ==
            # 2^w - 1 lands here at len(table) == 2^w - 2
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise TiffFormatError("LZW strip shorter than expected")
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    bits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bits
        bitbuf = (bitbuf << width) | code
        bits += width
        while bits >= 8:
            out.append((bitbuf >> (bits - 8)) & 0xFF)
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change mirror of the decoder
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if bits:
        out.append((bitbuf << (8 - bits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes -> uint8 array (H, W) or (H, W, 3).

    Raises :class:`TiffFormatError` on tiles/16-bit/palette/planar-2/
    unknown-compression/corrupt input (the quarantine list; baseline
    strip-organized 8-bit gray+RGB with None/PackBits/LZW decodes)."""
    try:
        return _decode(payload)
    except (IndexError, struct.error, KeyError) as e:
        raise TiffFormatError(f"corrupt TIFF stream: {e!r}") from e


def _decode(payload: bytes) -> np.ndarray:
    if payload[:4] == b"II*\x00":
        end = "<"
    elif payload[:4] == b"MM\x00*":
        end = ">"
    else:
        raise TiffFormatError("missing TIFF magic")
    (ifd_off,) = struct.unpack(end + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise TiffFormatError("IFD offset overruns file")
    (n_entries,) = struct.unpack(end + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, etype, count = struct.unpack(end + "HHI", payload[base : base + 8])
        try:
            tags[tag] = _read_ifd_values(payload, end, etype, count, payload[base + 8 : base + 12])
        except TiffFormatError:
            if tag in (256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 317):
                raise
            continue  # tolerate exotic types on tags we do not consume
    if 322 in tags or 323 in tags or 324 in tags:
        raise TiffFormatError("tiled TIFF not supported")
    width = tags.get(256, [0])[0]
    height = tags.get(257, [0])[0]
    if not width or not height:
        raise TiffFormatError("missing dimensions")
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8] * spp)
    if spp not in (1, 3) or any(b != 8 for b in bps):
        raise TiffFormatError(f"unsupported samples: spp={spp} bits={bps}")
    if tags.get(284, [1])[0] != 1:
        raise TiffFormatError("planar configuration 2 not supported")
    photometric = tags.get(262, [1])[0]
    if photometric not in (0, 1, 2):
        raise TiffFormatError(f"unsupported photometric {photometric}")
    if photometric == 2 and spp != 3:
        raise TiffFormatError("RGB photometric with spp != 3")
    compression = tags.get(259, [1])[0]
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise TiffFormatError(f"unsupported predictor {predictor}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffFormatError("missing/mismatched strip tables")
    rows_per_strip = tags.get(278, [height])[0] or height
    row_bytes = width * spp
    chunks = []
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, height - rows_done)
        expected = strip_rows * row_bytes
        raw = payload[off : off + cnt]
        if len(raw) < cnt:
            raise TiffFormatError("strip overruns file")
        if compression == 1:
            if len(raw) < expected:
                raise TiffFormatError("uncompressed strip short")
            data = raw[:expected]
        elif compression == 32773:
            data = _packbits_decode(raw, expected)
        elif compression == 5:
            data = _lzw_decode(raw, expected)
        else:
            raise TiffFormatError(f"unsupported compression {compression}")
        chunks.append(np.frombuffer(data, np.uint8))
        rows_done += strip_rows
    if rows_done < height:
        raise TiffFormatError("strips cover fewer rows than ImageLength")
    arr = np.concatenate(chunks).reshape(height, width, spp)
    if predictor == 2:
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    if photometric == 0:  # MinIsWhite
        arr = 255 - arr
    return arr[:, :, 0].copy() if spp == 1 else arr.copy()


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """uint8 (H, W) or (H, W, 3) -> little-endian baseline TIFF bytes.
    ``compression`` in {"none", "packbits", "lzw"}; ``predictor=True``
    applies horizontal differencing (useful with LZW on smooth images).
    Exact roundtrip with :func:`decode_tiff`."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise TiffFormatError("need uint8 (H,W) or (H,W,3)")
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise TiffFormatError("need 1 or 3 channels")
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else 3
    pix = arr.reshape(h, w, spp)
    if predictor:
        diff = pix.astype(np.int16)
        diff[:, 1:, :] = diff[:, 1:, :] - diff[:, :-1, :]
        pix = (diff % 256).astype(np.uint8)
    rps = rows_per_strip or h
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_code is None:
        raise TiffFormatError(f"unknown compression {compression!r}")
    strips = []
    for top in range(0, h, rps):
        block = pix[top : top + rps].tobytes()
        if compression == "none":
            strips.append(block)
        elif compression == "packbits":
            row_bytes = w * spp
            strips.append(
                b"".join(
                    _packbits_encode(block[i : i + row_bytes])
                    for i in range(0, len(block), row_bytes)
                )
            )
        else:
            strips.append(_lzw_encode(block))

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value
    extra = bytearray()
    header_size = 8
    n_tags = 11  # 256 257 258 259 262 273 277 278 279 284 317, both layouts
    ifd_size = 2 + 12 * n_tags + 4
    data_start = header_size + ifd_size

    def defer(fmt_vals: bytes) -> int:
        off = data_start + len(extra)
        extra.extend(fmt_vals)
        return off

    # strip data goes after deferred arrays; collect deferred first
    n_strips = len(strips)
    if spp == 3:
        bps_off = defer(struct.pack("<3H", 8, 8, 8))
    strip_counts = [len(s) for s in strips]
    if n_strips > 1:
        counts_off = defer(struct.pack("<%dI" % n_strips, *strip_counts))
        offsets_pos = defer(b"\x00" * 4 * n_strips)  # patched below
    strip_data_start = data_start + len(extra)
    offs = []
    pos = strip_data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n_strips > 1:
        extra[offsets_pos - data_start : offsets_pos - data_start + 4 * n_strips] = (
            struct.pack("<%dI" % n_strips, *offs)
        )

    entries.append((256, 4, 1, w))
    entries.append((257, 4, 1, h))
    if spp == 3:
        entries.append((258, 3, 3, bps_off))
    else:
        entries.append((258, 3, 1, 8))
    entries.append((259, 3, 1, comp_code))
    entries.append((262, 3, 1, 2 if spp == 3 else 1))
    entries.append(
        (273, 4, n_strips, offs[0] if n_strips == 1 else offsets_pos)
    )
    entries.append((277, 3, 1, spp))
    entries.append((278, 4, 1, rps))
    entries.append(
        (279, 4, n_strips, strip_counts[0] if n_strips == 1 else counts_off)
    )
    entries.append((284, 3, 1, 1))
    entries.append((317, 3, 1, 2 if predictor else 1))
    assert len(entries) == n_tags
    entries.sort()

    out = bytearray(b"II*\x00" + struct.pack("<I", header_size))
    out += struct.pack("<H", len(entries))
    for tag, etype, count, value in entries:
        size = _TYPE_SIZES[etype] * count
        if size <= 4:
            if etype == 3:
                raw = struct.pack("<H", value) + b"\x00\x00"
            else:
                raw = struct.pack("<I", value)
        else:
            raw = struct.pack("<I", value)  # value IS the offset
        out += struct.pack("<HHI", tag, etype, count) + raw
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
