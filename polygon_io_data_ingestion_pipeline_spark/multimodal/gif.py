"""GIF codec (87a/89a), pure stdlib + NumPy — real LZW, real bytes.

The remaining majority-class web image format after JPEG/PNG: memes,
stickers, and short animations in a scraped corpus are GIFs. The codec
speaks the actual format:

- **Decoder**: logical screen + global/local color tables, interlaced
  and non-interlaced image blocks, variable-width LSB-first LZW with
  clear/end codes and the 4096-entry dictionary cap, Graphic Control
  Extensions (frame delays, transparency), multi-frame animations
  composited with disposal methods 0/1 (draw over) and 2 (restore to
  background). Disposal 3 (restore-to-previous) and malformed streams
  raise :class:`GifFormatError` — the standard quarantine contract.
- **Encoder**: grayscale or exact-palette RGB (<= 256 distinct colors;
  true-color input needs quantization, which is a modeling choice, so
  it raises rather than guessing), single- or multi-frame with per-frame
  delays, spec-compliant LZW with code-width growth and clear-code
  resets.

Per-pixel work is NumPy; LZW is a Python loop over a byte stream —
the honest stdlib cost, and it runs inside Arrow-batched workers like
every other codec here.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Unsupported or corrupt GIF stream (quarantine type)."""


# --- LZW -------------------------------------------------------------------


def _lzw_decompress(data: bytes, min_code_size: int, expected: int) -> list[int]:
    """GIF-variant LZW: variable code width, LSB-first packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []

    table: list[list[int]] = []

    def reset_table():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = end + 1

    width = min_code_size + 1
    next_code = end + 1
    reset_table()

    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset_table()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table) or not table[code]:
                    raise GifFormatError("LZW: first code not a root")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise GifFormatError("LZW: code beyond dictionary")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= expected:
                return out
    return out


def _lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (px,)
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- encoder ---------------------------------------------------------------


def _palette_of(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """(palette (N,3) uint8, per-frame index arrays). Grayscale frames
    use the identity gray ramp; RGB frames must share <= 256 exact
    colors."""
    if frames[0].ndim == 2:
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        return pal, [f.astype(np.uint8) for f in frames]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors: GIF needs a <=256 palette — "
            "quantize first (a modeling choice this codec will not guess)"
        )
    lut = {tuple(c): i for i, c in enumerate(colors)}
    idx_frames = []
    for f in frames:
        flat = f.reshape(-1, 3)
        idx = np.array([lut[tuple(px)] for px in flat], dtype=np.uint8)
        idx_frames.append(idx.reshape(f.shape[:2]))
    return colors.astype(np.uint8), idx_frames


def encode_gif(
    frames: np.ndarray | list[np.ndarray], frame_ms: int = 100
) -> bytes:
    """uint8 frame(s) (H, W) gray or (H, W, 3) exact-palette RGB ->
    GIF89a bytes (animated when multiple frames; NETSCAPE loop ext)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.dtype != np.uint8 or f.shape[:2] != (h, w):
            raise ValueError("all frames uint8 with one geometry")
    pal, idx_frames = _palette_of(frames)
    # pad palette to a power of two
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += full.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    min_code = max(2, bits)
    for idx in idx_frames:
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", frame_ms // 10)
        out += b"\x00\x00"  # no transparency; block terminator
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        lz = _lzw_compress([int(v) for v in idx.reshape(-1)], min_code)
        for i in range(0, len(lz), 255):
            chunk = lz[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# --- decoder ---------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def decode_gif(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """GIF bytes -> (frame_ms, [RGB uint8 (H, W, 3) frames]) with frames
    composited onto the canvas per disposal methods 0/1/2."""
    try:
        return _decode(payload)
    except GifFormatError:
        raise
    except (IndexError, struct.error, ValueError) as e:
        # ValueError included: malformed geometry that slips past the
        # explicit checks (e.g. a numpy broadcast on a bad rect) must
        # still land in the quarantine contract, not fail the Spark task
        raise GifFormatError(f"corrupt GIF stream: {e!r}") from e


def _decode(payload: bytes) -> tuple[int, list[np.ndarray]]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("missing GIF signature")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    background = canvas.copy()
    delay_cs = 10
    transparent: int | None = None
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos]
                gce = payload[pos + 1 : pos + 1 + size]
                flags = gce[0]
                delay_cs = struct.unpack("<H", gce[1:3])[0] or delay_cs
                transparent = gce[3] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise GifFormatError(
                        "disposal=3 (restore-to-previous) unsupported"
                    )
                pos += 1 + size
            # skip remaining sub-blocks (and whole bodies of other exts)
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
            if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
                raise GifFormatError(
                    f"image rect {iw}x{ih}@({left},{top}) exceeds "
                    f"logical screen {w}x{h}"
                )
            ipacked = payload[pos + 8]
            pos += 9
            lct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if lct is None:
                raise GifFormatError("no color table for image block")
            min_code = payload[pos]
            pos += 1
            lz = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lz += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decompress(bytes(lz), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise GifFormatError("LZW data short of the image size")
            grid = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if ipacked & 0x40:
                grid = _deinterlace(grid)
            if grid.max() >= len(lct):
                raise GifFormatError("palette index out of range")
            rgb = lct[grid]
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = grid != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            delays.append(delay_cs)
            if disposal == 2:  # restore to background
                canvas[top : top + ih, left : left + iw] = background[
                    top : top + ih, left : left + iw
                ]
            transparent = None
            disposal = 0
        else:
            raise GifFormatError(f"unknown block 0x{block:02X}")
    if not frames:
        raise GifFormatError("no image data")
    return delays[0] * 10, frames
