"""PNG codec in pure stdlib (zlib) + NumPy — lossless, no Pillow.

With :mod:`.jpeg` this makes every raster format the media pipeline
claims REAL: PNG here is exact (lossless roundtrip asserted in tests),
JPEG is baseline JFIF, PNM is trivially raw.

Decode scope: color types 0 (grayscale, depths 1/2/4/8/16), 2 (RGB,
8/16), 3 (palette, 1/2/4/8, PLTE + optional tRNS alpha) and 6 (RGBA,
8/16); all five scanline filters (None/Sub/Up/Average/Paeth) at any
byte-per-pixel width; multiple IDAT chunks; Adam7 interlace for every
supported type (each of the seven passes is its own independently
filtered sub-image, de-interlaced by grid scatter).  8-bit images
return uint8; 16-bit return uint16 (lossless is the contract — no
silent high-byte truncation); sub-byte grayscale scales samples to
0..255 per the spec, palette indices never scale.  Color type 4
(gray+alpha) and nonstandard compression/filter methods are rejected
with :class:`PngFormatError` — callers quarantine, same contract as
the other codecs.  The encoder emits 8-bit filter-0 scanlines in one
zlib stream (valid, universally readable; compression ratio is zlib's
business).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per supported color type (3 = palette: one index channel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 6: (8, 16)}

#: Adam7 pass grid: (x0, y0, dx, dy) per pass, spec order
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


class PngFormatError(ValueError):
    """Unsupported or corrupt PNG stream."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W), (H, W, 3) or (H, W, 4) -> PNG bytes (lossless)."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        ctype = 0
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        ctype = 2 if arr.shape[2] == 3 else 6
    else:
        raise ValueError("expects (H,W), (H,W,3) or (H,W,4)")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[r].tobytes() for r in range(h))  # filter 0 rows
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8/uint16 (H, W[, C]). Lossless; unsupported
    color-type/depth combos and truncated streams raise
    :class:`PngFormatError`."""
    try:
        return _decode(payload)
    except PngFormatError:
        raise
    except (IndexError, struct.error, zlib.error, ValueError) as e:
        raise PngFormatError(f"corrupt PNG stream: {e!r}") from e


def _unfilter(raw: bytes, offset: int, nrows: int, row_bytes: int, bpp: int):
    """Reverse the scanline filters for one (sub-)image of ``nrows``
    rows of ``row_bytes`` filtered bytes each; filters reference the
    byte ``bpp`` positions to the left (one full pixel, min 1 byte).
    Returns (rows array (nrows, row_bytes) uint8, bytes consumed)."""
    out = np.zeros((nrows, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    need = nrows * (row_bytes + 1)
    if len(raw) - offset < need:
        raise PngFormatError("decompressed stream short of scanline data")
    for r in range(nrows):
        base = offset + r * (row_bytes + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=row_bytes, offset=base + 1).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left state
            cur = np.zeros(row_bytes, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            ul = np.zeros(bpp, dtype=np.uint8)
            for x in range(0, row_bytes, bpp):
                seg = slice(x, min(x + bpp, row_bytes))
                n = seg.stop - seg.start
                up = prev[seg]
                if ftype == 1:
                    rec = line[seg] + left[:n]
                elif ftype == 3:
                    rec = line[seg] + (
                        (left[:n].astype(np.int32) + up.astype(np.int32)) // 2
                    ).astype(np.uint8)
                else:
                    rec = line[seg] + _paeth(left[:n], up, ul[:n])
                cur[seg] = rec
                left, ul = rec, up
        else:
            raise PngFormatError(f"unknown scanline filter {ftype}")
        out[r] = cur
        prev = cur
    return out, need


def _rows_to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """Filtered-byte rows -> sample array (nrows, w*ch) of uint8/uint16
    (palette indices and sub-byte gray come back UNSCALED here)."""
    n = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch]
    if depth == 16:
        return rows.reshape(n, -1).view(">u2")[:, : w * ch].astype(np.uint16)
    # sub-byte: unpack bits MSB-first, regroup into depth-wide samples
    bits = np.unpackbits(rows, axis=1)
    nsamp = w * ch
    bits = bits[:, : nsamp * depth].reshape(n, nsamp, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (bits * weights).sum(axis=2).astype(np.uint8)


def _decode(payload: bytes) -> np.ndarray:
    if payload[: len(_SIG)] != _SIG:
        raise PngFormatError("missing PNG signature")
    pos = len(_SIG)
    idat = bytearray()
    header = None
    plte: np.ndarray | None = None
    trns: bytes | None = None
    while pos < len(payload):
        ln = struct.unpack(">I", payload[pos : pos + 4])[0]
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise PngFormatError("chunk truncated")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if ctype not in _CHANNELS:
                raise PngFormatError(f"color type {ctype} unsupported")
            if depth not in _DEPTHS[ctype]:
                raise PngFormatError(f"depth {depth} unsupported for color type {ctype}")
            if interlace not in (0, 1):
                raise PngFormatError(f"unknown interlace method {interlace}")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter method")
            header = (w, h, depth, ctype, interlace)
        elif tag == b"PLTE":
            if ln % 3:
                raise PngFormatError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if header is None or not idat:
        raise PngFormatError("missing IHDR/IDAT")
    w, h, depth, ctype, interlace = header
    if ctype == 3 and plte is None:
        raise PngFormatError("palette image without PLTE")
    ch = _CHANNELS[ctype]
    # filter distance: whole bytes per pixel, min 1 (sub-byte depths)
    bpp = max(1, (depth * ch) // 8)
    raw = zlib.decompress(bytes(idat))

    def row_bytes(width: int) -> int:
        return (width * ch * depth + 7) // 8

    samples = np.zeros((h, w * ch), dtype=np.uint16 if depth == 16 else np.uint8)
    if interlace == 0:
        rows, used = _unfilter(raw, 0, h, row_bytes(w), bpp)
        if used != len(raw):
            raise PngFormatError("decompressed size mismatch")
        samples = _rows_to_samples(rows, w, ch, depth)
    else:  # Adam7: seven independently filtered sub-images
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, used = _unfilter(raw, offset, ph, row_bytes(pw), bpp)
            offset += used
            sub = _rows_to_samples(rows, pw, ch, depth).reshape(ph, pw, ch)
            ys = np.arange(y0, h, dy)
            xs = np.arange(x0, w, dx)
            grid = samples.reshape(h, w, ch)
            grid[np.ix_(ys, xs)] = sub
        if offset != len(raw):
            raise PngFormatError("decompressed size mismatch")
        samples = samples.reshape(h, w * ch)

    if ctype == 3:
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise PngFormatError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ctype == 0 and depth < 8:
        # scale sub-byte gray to full range (255 / (2^depth - 1))
        return (samples.reshape(h, w).astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    img = samples.reshape(h, w, ch) if ch > 1 else samples.reshape(h, w)
    return img
