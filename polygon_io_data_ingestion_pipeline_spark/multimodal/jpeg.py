"""Baseline JFIF (JPEG) codec in pure NumPy + stdlib — no Pillow, no
libjpeg. Closes the "compressed codecs stubbed" gap honestly: the
multimodal operators decode REAL compressed bytes.

Scope (and honest limits):

- **Encoder**: baseline sequential DCT (SOF0) and progressive (SOF2:
  spectral selection + one successive-approximation level, the
  real-world web layout), 4:4:4 / 4:2:2 / 4:2:0 chroma sampling
  (box-filter downsample, interleaved MCUs), standard Annex-K
  quantization tables scaled by the libjpeg quality formula, standard
  Huffman tables, JFIF APP0.
- **Decoder**: baseline sequential (SOF0) AND progressive (SOF2 —
  spectral selection, successive approximation, EOB runs, interleaved
  or single-component scans, G.1.2 correction-bit protocol) with any
  per-file DQT/DHT (tables are READ FROM THE STREAM, not assumed),
  grayscale or 3-component with ANY integer sampling factors dividing
  the maxima (4:4:4, 4:2:2, 4:2:0, 4:1:1, ...) — subsampled chroma is
  nearest-neighbour upsampled; restart markers honored. Arithmetic
  coding and 12-bit precision are rejected with a clear error —
  callers quarantine, exactly like every other corrupt payload in
  multimodal/binaryops.py. Progressive + 4:2:0 matter: together they
  are the majority of real-world web JPEGs, so without them the codec
  quarantined most actual files.

The format is self-describing (quant + Huffman tables travel in
DQT/DHT segments), so encode->decode fidelity is provable in-repo;
interop additionally works for any baseline 4:4:4/grayscale JPEG.

Per-pixel work is vectorized NumPy (blockwise DCT as two 8x8 matrix
multiplies over all blocks at once); only the entropy coder is a
Python loop, which is the honest cost of a stdlib-only container —
and it runs inside Arrow-batched ``mapInPandas`` workers, so the
cluster scales it out like any other decode.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------------

#: Annex K.1/K.2 quantization tables (row-major 8x8).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    """Row-major indices in zigzag scan order, generated (not recalled)."""
    out = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in rs if s % 2 == 1 else reversed(list(rs)):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Standard Huffman table specs (bits-per-length, then symbols). The
# DECODER never uses these — it builds tables from the file's DHT — so
# roundtrip correctness is independent of them; they only have to be a
# valid canonical code, which the builder asserts.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

for _bits, _vals in (
    (DC_LUMA_BITS, DC_LUMA_VALS),
    (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals), "huffman spec bits/vals mismatch"

#: 8x8 DCT-II basis; DCT = C @ block @ C.T, IDCT = C.T @ coef @ C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


class JpegFormatError(ValueError):
    """Unsupported or corrupt JPEG stream."""


#: JPEG features this codec quarantines (raises JpegFormatError) rather
#: than decodes.  The decode_jpeg docstring's raise-clause is tested
#: against this list — twice now a feature landed (subsampling in r6,
#: progressive in r7) while the docstring kept claiming it raises.
UNSUPPORTED_FEATURES = ("arithmetic", "12-bit")


# --- huffman ---------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical JPEG Huffman table."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill, per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegFormatError("entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegFormatError("entropy stream truncated at 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise JpegFormatError(f"unexpected marker 0xFF{marker:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_restart(self) -> None:
        """Skip to just past the next RSTn marker (pos already points at
        the 0xFF because bit() raised... instead callers use this after
        catching a marker in _fill is not possible — so we scan raw)."""
        self.n = 0
        while self.pos < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and self.pos + 1 < len(self.data)
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise JpegFormatError("restart marker not found")


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map s-bit magnitude to signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- color -----------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# --- blocking --------------------------------------------------------------


def _from_blocks(blocks: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)[:h, :w]
    )


def _grid_blocks(plane: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """channel -> (gh*gw, 8, 8) blocks on a FIXED grid (edge-replicate
    padded): interleaved MCUs need block grids that are multiples of the
    component's sampling factor, not just of 8."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, gh * 8 - h), (0, gw * 8 - w)), mode="edge")
    return padded.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(gh * gw, 8, 8)


def _box_downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Mean-pool by (fy, fx) with edge-replicate padding to multiples."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# --- encoder ---------------------------------------------------------------


SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _forward_coefficients(img: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: color transform, subsample, DCT,
    quantize.  Returns (coef_grids in zigzag order, factors, qtabs,
    gray, h, w, mcux, mcuy)."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expects (H,W) or (H,W,3)")
    if subsampling not in SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(SUBSAMPLING)}")
    h, w = arr.shape[:2]
    if gray:
        factors = [(1, 1)]
        planes = [arr.astype(np.float64)]
    else:
        h1, v1 = SUBSAMPLING[subsampling]
        factors = [(h1, v1), (1, 1), (1, 1)]
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        planes = [ycc[..., 0]] + [
            _box_downsample(ycc[..., c], h1, v1) for c in (1, 2)
        ]

    qluma = _quality_scale(QUANT_LUMA, quality)
    qchroma = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [qluma] + ([qchroma] if not gray else [])

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # DCT + quantization, all blocks at once per plane, kept on the
    # component's MCU-aligned block grid for interleaving.
    coef_grids = []
    for ci, plane in enumerate(planes):
        hf, vf = factors[ci]
        gh, gw = mcuy * vf, mcux * hf
        blocks = _grid_blocks(plane - 128.0, gh, gw)
        coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = qluma if ci == 0 else qchroma
        zz = np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        coef_grids.append(zz.reshape(gh, gw, 64))
    return coef_grids, factors, qtabs, gray, h, w, mcux, mcuy


def encode_jpeg(img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4") -> bytes:
    """uint8 image (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF
    bytes (standard tables at the given quality).

    ``subsampling``: ``"4:4:4"`` (default, lossless chroma grid),
    ``"4:2:2"`` or ``"4:2:0"`` (box-filter chroma downsample +
    interleaved MCUs — what real-world encoders emit)."""
    coef_grids, factors, qtabs, gray, h, w, mcux, mcuy = _forward_coefficients(
        img, quality, subsampling
    )

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tabs.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    bwtr = _BitWriter()
    pred = [0] * len(coef_grids)

    def emit_block(zz: np.ndarray, ci: int) -> None:
        ti = 0 if ci == 0 else 1
        dc_codes, ac_codes = dc_tabs[ti], ac_tabs[ti]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _category(diff)
        code, ln = dc_codes[s]
        bwtr.write(code, ln)
        if s:
            bwtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bwtr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            bwtr.write(code, ln)
            bwtr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            bwtr.write(code, ln)

    # Interleaved MCU order (B.2.3): per MCU, each component contributes
    # its h x v blocks in raster order.
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hf, vf) in enumerate(factors):
                for by in range(vf):
                    for bx in range(hf):
                        emit_block(coef_grids[ci][my * vf + by, mx * hf + bx], ci)
    entropy = bwtr.flush()

    # --- markers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
        out += bytes(int(x) for x in q.reshape(-1)[ZIGZAG])
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hf, vf = factors[ci]
        out += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    huff_specs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        huff_specs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4"
) -> bytes:
    """uint8 image -> PROGRESSIVE JFIF bytes (SOF2): spectral selection
    plus one level of successive approximation, the layout real-world
    web encoders emit.  Identical quantized coefficients to
    :func:`encode_jpeg`, so decoding both must yield identical pixels —
    the cross-check the tests pin.

    Scan script: DC first (Al=1) interleaved; DC refine; per component
    AC bands 1-5 and 6-63 at Al=1; per component AC refine (Ah=1,
    Al=0).  EOB runs are flushed per block (EOB0 only — valid, and
    independent of which EOBn symbols the table carries)."""
    coef_grids, factors, qtabs, gray, h, w, mcux, mcuy = _forward_coefficients(
        img, quality, subsampling
    )
    nc = 1 if gray else 3
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_codes.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_codes.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    def comp_blocks(ci):
        hf, vf = factors[ci]
        ch, cw = -(-h * vf // vmax), -(-w * hf // hmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield coef_grids[ci][by, bx]

    scans: list[tuple[list[int], int, int, int, int, bytes]] = []

    # ---- DC first (interleaved, Al=1)
    bwr = _BitWriter()
    pred = [0] * nc
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        for ci, (hf, vf) in enumerate(factors):
            ti = 0 if ci == 0 else 1
            for by in range(vf):
                for bx in range(hf):
                    v = int(coef_grids[ci][my * vf + by, mx * hf + bx][0]) >> 1
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = _category(diff)
                    code, ln = dc_codes[ti][s]
                    bwr.write(code, ln)
                    if s:
                        bwr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    scans.append((list(range(nc)), 0, 0, 0, 1, bwr.flush()))

    # ---- DC refine (interleaved, Ah=1, Al=0): one raw bit per block
    bwr = _BitWriter()
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        for ci, (hf, vf) in enumerate(factors):
            for by in range(vf):
                for bx in range(hf):
                    bwr.write(int(coef_grids[ci][my * vf + by, mx * hf + bx][0]) & 1, 1)
    scans.append((list(range(nc)), 0, 0, 1, 0, bwr.flush()))

    # ---- AC first bands per component (Al=1)
    def ac_first_scan(ci, ss, se, al):
        out = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        for zz in comp_blocks(ci):
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = codes[0xF0]
                    out.write(code, ln)
                    r -= 16
                s = _category(t)
                code, ln = codes[(r << 4) | s]
                out.write(code, ln)
                val = t if v > 0 else -t
                out.write(val if val > 0 else val + (1 << s) - 1, s)
                r = 0
            if r > 0:
                code, ln = codes[0x00]  # EOB0
                out.write(code, ln)
        return out.flush()

    # ---- AC refine per component (Ah=1, Al=0) with buffered
    # correction bits (G.1.2.3: corrections for history coefficients
    # passed over ride AFTER the next emitted symbol)
    def ac_refine_scan(ci, ss, se, al):
        out = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        p_bit = 1 << al

        def flush_br(br):
            for b in br:
                out.write(b, 1)
            br.clear()

        for zz in comp_blocks(ci):
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                # Flush pending ZRLs BEFORE buffering this coefficient's
                # bit (libjpeg's order): the decoder passes exactly 16
                # zero-history positions per ZRL and consumes correction
                # bits only for significant coefficients it passes WITHIN
                # them — a bit buffered first would ride with a ZRL whose
                # span ends before its coefficient, desyncing the stream
                # (run > 15 + already-significant + newly-significant was
                # the failing shape).
                while r > 15:
                    code, ln = codes[0xF0]
                    out.write(code, ln)
                    flush_br(br)
                    r -= 16
                if t > 1:  # already significant: one correction bit
                    br.append(1 if abs(v) & p_bit else 0)
                    continue
                code, ln = codes[(r << 4) | 1]
                out.write(code, ln)
                out.write(1 if v > 0 else 0, 1)
                flush_br(br)
                r = 0
            if r > 0 or br:
                code, ln = codes[0x00]  # EOB0 closes the block
                out.write(code, ln)
                flush_br(br)
        return out.flush()

    for ci in range(nc):
        scans.append(([ci], 1, 5, 0, 1, ac_first_scan(ci, 1, 5, 1)))
    for ci in range(nc):
        scans.append(([ci], 6, 63, 0, 1, ac_first_scan(ci, 6, 63, 1)))
    for ci in range(nc):
        scans.append(([ci], 1, 63, 1, 0, ac_refine_scan(ci, 1, 63, 0)))

    # ---- markers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
        out += bytes(int(x) for x in q.reshape(-1)[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hf, vf = factors[ci]
        out += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    huff_specs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        huff_specs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    for comp_ids, ss, se, ah, al, entropy in scans:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci in comp_ids:
            out += bytes([ci + 1, (0x00 if ci == 0 else 0x11)])
        out += bytes([ss, se, (ah << 4) | al])
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0) AND progressive (SOF2) JFIF bytes (4:4:4, 4:2:0
    and 4:2:2 chroma subsampling) -> uint8 array (H, W) or (H, W, 3).

    Tables come from the stream's own DQT/DHT segments. Raises
    :class:`JpegFormatError` on arithmetic/12-bit/corrupt input —
    including truncated buffers, whose raw IndexError/struct.error are
    converted so callers have ONE quarantine exception type.  (The
    quarantine list lives in :data:`UNSUPPORTED_FEATURES`;
    tests/test_multimodal_jpeg.py greps this docstring against it so
    the claim cannot drift from the code again.)
    """
    try:
        return _decode_markers(payload)
    except (IndexError, struct.error, KeyError, ValueError) as e:
        if isinstance(e, JpegFormatError):
            raise
        raise JpegFormatError(f"corrupt JPEG stream: {e!r}") from e


def _decode_markers(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise JpegFormatError("missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    prog: dict | None = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise JpegFormatError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and prog is not None:
                return _reconstruct(
                    prog["coefs"], frame, qtabs, prog["factors"], prog["grids"]
                )
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8).astype(np.int32)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = zz
                qtabs[tq] = q.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htabs[(tc, th)] = _decode_table(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(
                ">H", seg[3:5]
            )[0], seg[5]
            if prec != 8:
                raise JpegFormatError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                hf, vf = hv >> 4, hv & 0xF
                if not (1 <= hf <= 4 and 1 <= vf <= 4):
                    raise JpegFormatError(f"invalid sampling factors {hf}x{vf}")
                comps.append((cid, hf, vf, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(f"unsupported frame type 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            if not progressive:
                scan_tabs = []
                for ci in range(ns):
                    td, ta = seg[2 + 2 * ci] >> 4, seg[2 + 2 * ci] & 0xF
                    scan_tabs.append((htabs[(0, td)], htabs[(1, ta)]))
                data = payload[pos + seglen :]
                return _decode_scan(data, frame, qtabs, scan_tabs, restart_interval)
            # progressive: one of many scans, each refining the shared
            # coefficient grids (spectral selection + successive approx)
            if prog is None:
                prog = _init_progressive(frame)
            scomps = []
            for ci in range(ns):
                cs = seg[1 + 2 * ci]
                td, ta = seg[2 + 2 * ci] >> 4, seg[2 + 2 * ci] & 0xF
                matches = [i for i, c in enumerate(frame[2]) if c[0] == cs]
                if not matches:
                    raise JpegFormatError(f"scan component {cs} not in frame")
                scomps.append((matches[0], td, ta))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            end = _entropy_end(payload, pos + seglen)
            _progressive_scan(
                payload[pos + seglen : end],
                prog,
                frame,
                htabs,
                scomps,
                ss,
                se,
                ahal >> 4,
                ahal & 0xF,
                restart_interval,
            )
            pos = end
            continue
        pos += seglen
    if progressive and prog is not None:
        # stream without explicit EOI: reconstruct from what arrived
        return _reconstruct(prog["coefs"], frame, qtabs, prog["factors"], prog["grids"])
    raise JpegFormatError("no scan data")


def _entropy_end(payload: bytes, start: int) -> int:
    """Index just past a scan's entropy data: the first 0xFF followed by
    a real marker (not a stuffed 0x00, not an RSTn)."""
    i = start
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _init_progressive(frame) -> dict:
    """Shared coefficient grids for a progressive frame — the same
    MCU-aligned layout `_decode_scan` uses, filled across scans."""
    fh, fw, comps = frame
    nc = len(comps)
    if nc == 1:
        factors = [(1, 1)]
    else:
        factors = [(hf, vf) for _cid, hf, vf, _tq in comps]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    for hf, vf in factors:
        if hmax % hf or vmax % vf:
            raise JpegFormatError(
                f"non-integer upsampling ratio for factors {hf}x{vf} (max {hmax}x{vmax})"
            )
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    grids = [(mcuy * vf, mcux * hf) for hf, vf in factors]
    return {
        "factors": factors,
        "grids": grids,
        "coefs": [np.zeros((gh, gw, 64), dtype=np.int32) for gh, gw in grids],
        "mcux": mcux,
        "mcuy": mcuy,
        "hmax": hmax,
        "vmax": vmax,
    }


def _progressive_scan(
    data, prog, frame, htabs, scomps, ss, se, ah, al, restart_interval
) -> None:
    """One progressive scan (G.1.2): DC first/refine (interleaved or
    not), AC first/refine (single component by spec), accumulating into
    the shared coefficient grids.  EOB runs, ZRL and the correction-bit
    protocol follow the spec algorithms."""
    fh, fw, comps = frame
    reader = _BitReader(data)
    eobrun = 0

    def need(tc, th):
        tab = htabs.get((tc, th))
        if tab is None:
            raise JpegFormatError(f"missing huffman table ({tc},{th}) for scan")
        return tab

    if ss == 0:  # ---- DC scan (se must be 0 per spec)
        if se != 0:
            raise JpegFormatError("DC scan with Se != 0")
        pred = [0] * len(scomps)
        dc_tabs = [need(0, td) if ah == 0 else None for _ci, td, _ta in scomps]

        def dc_block(zz, si):
            if ah == 0:
                s = _huff_decode(reader, dc_tabs[si])
                diff = _extend(reader.bits(s), s) if s else 0
                pred[si] += diff
                zz[0] = pred[si] << al
            else:  # refinement: one raw bit per block
                if reader.bit():
                    zz[0] |= 1 << al

        if len(scomps) > 1:  # interleaved MCU order
            mcux, mcuy = prog["mcux"], prog["mcuy"]
            n_mcu = mcux * mcuy
            for m in range(n_mcu):
                if restart_interval and m and m % restart_interval == 0:
                    reader.align_to_restart()
                    pred = [0] * len(scomps)
                my, mx = divmod(m, mcux)
                for si, (ci, _td, _ta) in enumerate(scomps):
                    hf, vf = prog["factors"][ci]
                    for by in range(vf):
                        for bx in range(hf):
                            dc_block(prog["coefs"][ci][my * vf + by, mx * hf + bx], si)
        else:  # non-interleaved: raster over the component's own blocks
            ci = scomps[0][0]
            for bi, (by, bx) in enumerate(_component_blocks(prog, frame, ci)):
                if restart_interval and bi and bi % restart_interval == 0:
                    reader.align_to_restart()
                    pred = [0]
                dc_block(prog["coefs"][ci][by, bx], 0)
        return

    # ---- AC scan: spec requires exactly one component
    if len(scomps) != 1:
        raise JpegFormatError("progressive AC scan must be single-component")
    ci, _td, ta = scomps[0]
    ac_tab = need(1, ta)
    p1 = 1 << al

    def ac_first(zz):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                return
            k += r
            if k > se:
                raise JpegFormatError("AC run past band end")
            zz[k] = _extend(reader.bits(s), s) << al
            k += 1

    def refine_nonzero(zz, k):
        """One correction bit for an already-nonzero coefficient."""
        if reader.bit() and (abs(int(zz[k])) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else -p1

    def ac_refine(zz):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_decode(reader, ac_tab)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    # ZRL: pass 16 zero-history positions
                else:
                    if s != 1:
                        raise JpegFormatError("AC refine size != 1")
                    newval = p1 if reader.bit() else -p1
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(zz, k)
                    else:
                        if r == 0:
                            if newval:
                                zz[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    refine_nonzero(zz, k)
                k += 1
            eobrun -= 1

    block_fn = ac_first if ah == 0 else ac_refine
    for bi, (by, bx) in enumerate(_component_blocks(prog, frame, ci)):
        if restart_interval and bi and bi % restart_interval == 0:
            reader.align_to_restart()
            eobrun = 0
        block_fn(prog["coefs"][ci][by, bx])


def _component_blocks(prog, frame, ci):
    """Raster (by, bx) positions of a component's REAL blocks for a
    non-interleaved scan: ceil(component dims / 8), not the MCU-padded
    grid (B.2.3)."""
    fh, fw, _comps = frame
    hf, vf = prog["factors"][ci]
    hmax, vmax = prog["hmax"], prog["vmax"]
    ch, cw = -(-fh * vf // vmax), -(-fw * hf // hmax)
    bh, bw = -(-ch // 8), -(-cw // 8)
    for by in range(bh):
        for bx in range(bw):
            yield by, bx


def _decode_scan(data, frame, qtabs, scan_tabs, restart_interval) -> np.ndarray:
    fh, fw, comps = frame
    nc = len(comps)
    # A single-component scan is non-interleaved: the MCU is ONE data
    # unit and sampling factors are ignored (B.2.3) — so a grayscale
    # file declaring 2x2 factors still decodes on the plain 8x8 grid.
    if nc == 1:
        factors = [(1, 1)]
    else:
        factors = [(hf, vf) for _cid, hf, vf, _tq in comps]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    for hf, vf in factors:
        if hmax % hf or vmax % vf:
            raise JpegFormatError(
                f"non-integer upsampling ratio for factors {hf}x{vf} (max {hmax}x{vmax})"
            )
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    grids = [(mcuy * vf, mcux * hf) for hf, vf in factors]
    coefs = [np.zeros((gh, gw, 64), dtype=np.int32) for gh, gw in grids]
    reader = _BitReader(data)
    pred = [0] * nc

    def decode_block(zz: np.ndarray, ci: int) -> None:
        dc_tab, ac_tab = scan_tabs[ci]
        s = _huff_decode(reader, dc_tab)
        diff = _extend(reader.bits(s), s) if s else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _huff_decode(reader, ac_tab)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise JpegFormatError("AC run past block end")
            zz[k] = _extend(reader.bits(size), size)
            k += 1

    n_mcu = mcuy * mcux
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_to_restart()
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        for ci, (hf, vf) in enumerate(factors):
            for by in range(vf):
                for bx in range(hf):
                    decode_block(coefs[ci][my * vf + by, mx * hf + bx], ci)

    return _reconstruct(coefs, frame, qtabs, factors, grids)


def _reconstruct(coefs, frame, qtabs, factors, grids) -> np.ndarray:
    """Accumulated zigzag coefficient grids -> pixels (dequantize, IDCT,
    crop, upsample, color-convert) — shared by the baseline single-scan
    path and the progressive multi-scan path."""
    fh, fw, comps = frame
    nc = len(comps)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    planes = []
    for ci, comp in enumerate(comps):
        tq = comp[-1]
        hf, vf = factors[ci]
        gh, gw = grids[ci]
        q = qtabs[tq].reshape(-1)
        # coefs arrive in ZIGZAG scan order; [:, UNZIGZAG] restores the
        # natural order, where the quantizer for position i is q[i] —
        # applying q[UNZIGZAG] here would dequantize every AC
        # coefficient with the wrong table entry (the encoder divides
        # by q in natural order).
        dez = coefs[ci].reshape(-1, 64)[:, UNZIGZAG] * q
        blocks = dez.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        # crop to the COMPONENT's true dims (A.1.1: ceil(f * hf/hmax)),
        # then nearest-neighbour upsample back to frame resolution
        ch, cw = -(-fh * vf // vmax), -(-fw * hf // hmax)
        plane = _from_blocks(spatial, gh, gw, ch, cw)
        ry, rx = vmax // vf, hmax // hf
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)[:fh, :fw]
        planes.append(plane)
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    return np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
