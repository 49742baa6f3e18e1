"""PNG codec in pure stdlib (zlib) + NumPy — lossless, no Pillow.

With :mod:`.jpeg` this makes every raster format the media pipeline
claims REAL: PNG here is exact (lossless roundtrip asserted in tests),
JPEG is baseline JFIF, PNM is trivially raw.

Scope: 8-bit depth, color types 0 (grayscale), 2 (RGB) and 6 (RGBA),
all five scanline filters on decode (None/Sub/Up/Average/Paeth),
multiple IDAT chunks. Interlaced (Adam7), 16-bit and palette images
are rejected with :class:`PngFormatError` — callers quarantine, same
contract as the other codecs. The encoder emits filter-0 scanlines in
one zlib stream (valid, universally readable; compression ratio is
zlib's business).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per supported color type
_CHANNELS = {0: 1, 2: 3, 6: 4}


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
    """PNG bytes -> uint8 (H, W[, C]). Lossless; rejects interlace /
    16-bit / palette; truncated streams raise :class:`PngFormatError`."""
    try:
        return _decode(payload)
    except (IndexError, struct.error, zlib.error) as e:
        raise PngFormatError(f"corrupt PNG stream: {e!r}") from e


def _decode(payload: bytes) -> np.ndarray:
    if payload[: len(_SIG)] != _SIG:
        raise PngFormatError("missing PNG signature")
    pos = len(_SIG)
    idat = bytearray()
    header = None
    while pos < len(payload):
        ln = struct.unpack(">I", payload[pos : pos + 4])[0]
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise PngFormatError("chunk truncated")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise PngFormatError("only 8-bit depth supported")
            if ctype not in _CHANNELS:
                raise PngFormatError(f"color type {ctype} unsupported (palette?)")
            if interlace != 0:
                raise PngFormatError("interlaced (Adam7) unsupported")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter method")
            header = (w, h, ctype)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if header is None or not idat:
        raise PngFormatError("missing IHDR/IDAT")
    w, h, ctype = header
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise PngFormatError("decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left state
            cur = np.zeros(stride, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint8)
            ul = np.zeros(ch, dtype=np.uint8)
            for x in range(0, stride, ch):
                up = prev[x : x + ch]
                if ftype == 1:
                    rec = line[x : x + ch] + left
                elif ftype == 3:
                    rec = line[x : x + ch] + (
                        (left.astype(np.int32) + up.astype(np.int32)) // 2
                    ).astype(np.uint8)
                else:
                    rec = line[x : x + ch] + _paeth(left, up, ul)
                cur[x : x + ch] = rec
                left = rec
                ul = up
        else:
            raise PngFormatError(f"unknown scanline filter {ftype}")
        out[r] = cur
        prev = cur
    img = out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)
    return img
