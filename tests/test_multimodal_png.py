"""PNG codec on REAL bytes: exact lossless roundtrips, all five
scanline filters on decode (hand-built streams), rejection contract,
and the Spark integration path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.png import (
    PngFormatError,
    _chunk,
    _SIG,
    decode_png,
    encode_png,
)


def test_lossless_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(11)
    for shape in ((13, 9), (8, 8, 3), (5, 17, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.array_equal(out, img)  # PNG is lossless — exact


def _hand_png(rows: list[tuple[int, bytes]], w: int, h: int, ctype: int) -> bytes:
    raw = b"".join(bytes([f]) + line for f, line in rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_all_five_filters_decode():
    # 4x3 RGB, one row per filter type (Paeth on the last row), with the
    # expected reconstruction computed by hand per the PNG spec.
    r0 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])  # None
    # Sub: recon[x] = line[x] + recon[x-bpp]
    r1 = bytes([5, 5, 5, 1, 1, 1, 2, 2, 2])
    # Up: recon[x] = line[x] + above[x]
    r2 = bytes([1] * 9)
    # Average: recon[x] = line[x] + (left + up)//2
    r3 = bytes([2] * 9)
    png = _hand_png([(0, r0), (1, r1), (2, r2), (3, r3)], 3, 4, 2)
    img = decode_png(png)
    row0 = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]])
    assert np.array_equal(img[0], row0)
    row1 = np.array([[5, 5, 5], [6, 6, 6], [8, 8, 8]])
    assert np.array_equal(img[1], row1)
    row2 = row1 + 1
    assert np.array_equal(img[2], row2)
    # row3: avg filter against row2, left-to-right
    expect = np.zeros((3, 3), dtype=int)
    left = np.zeros(3, dtype=int)
    for x in range(3):
        expect[x] = (2 + (left + row2[x]) // 2) % 256
        left = expect[x]
    assert np.array_equal(img[3], expect)


def test_paeth_filter_roundtrip_via_reencode():
    # Build a Paeth-filtered stream from a known image and check the
    # decoder inverts it exactly.
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5
    rows = []
    prev = np.zeros(12, dtype=np.int16)
    flat = img.reshape(4, 12).astype(np.int16)
    for r in range(4):
        line = np.zeros(12, dtype=np.uint8)
        for x in range(12):
            a = flat[r, x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (flat[r, x] - pred) % 256
        rows.append((4, line.tobytes()))
        prev = flat[r]
    assert np.array_equal(decode_png(_hand_png(rows, 4, 4, 2)), img)


def test_rejects_unsupported_and_corrupt():
    img = np.zeros((4, 4), dtype=np.uint8)
    good = bytearray(encode_png(img))
    # interlace flag on
    bad = bytearray(good)
    ihdr_off = len(_SIG) + 8
    bad[ihdr_off + 12] = 1
    with pytest.raises(PngFormatError):
        decode_png(bytes(bad))
    with pytest.raises(PngFormatError):
        decode_png(b"not a png")
    with pytest.raises(PngFormatError):
        decode_png(bytes(good[: len(good) // 2]))


def test_spark_features_and_resize_real_png(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_image_features,
        resize_images,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    rows = [(1, "image", bytearray(encode_png(img)), {"mime": "image/png", "width": 30, "height": 20, "duration_ms": None})]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = decode_image_features(df).collect()[0]["features"]
    assert feats[0] == 30.0 and feats[1] == 20.0 and feats[2] == 3.0
    assert abs(feats[3] - float(img.mean())) < 1e-6  # lossless: exact mean
    out = resize_images(df, width=10, height=5).collect()[0]
    resized = decode_png(bytes(out["payload"]))
    assert resized.shape == (5, 10, 3)


def _ihdr_png(w, h, depth, ctype, interlace, chunks, raw):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + b"".join(chunks)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_palette_8bit_decodes_via_plte():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    png = _ihdr_png(3, 2, 8, 3, 0, [_chunk(b"PLTE", pal.tobytes())], raw)
    out = decode_png(png)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, pal[idx])


def test_palette_4bit_with_trns_alpha():
    pal = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    # depth 4: two samples per byte, MSB first; 3 samples -> 2 bytes/row
    rows = []
    for r in range(2):
        b0 = (idx[r, 0] << 4) | idx[r, 1]
        b1 = idx[r, 2] << 4
        rows.append(b"\x00" + bytes([b0, b1]))
    png = _ihdr_png(
        3, 2, 4, 3, 0,
        [_chunk(b"PLTE", pal.tobytes()), _chunk(b"tRNS", bytes([255, 128, 0]))],
        b"".join(rows),
    )
    out = decode_png(png)
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out[..., :3], pal[idx])
    assert np.array_equal(out[..., 3], np.array([[255, 128, 0], [0, 128, 255]]))


def test_16bit_gray_is_lossless_uint16():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    raw = b"".join(b"\x00" + img[r].astype(">u2").tobytes() for r in range(6))
    out = decode_png(_ihdr_png(5, 6, 16, 0, 0, [], raw))
    assert out.dtype == np.uint16 and out.shape == (6, 5)
    assert np.array_equal(out, img)


def test_16bit_rgb_is_lossless_uint16():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 65536, (3, 4, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + img[r].astype(">u2").tobytes() for r in range(3))
    out = decode_png(_ihdr_png(4, 3, 16, 2, 0, [], raw))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_subbyte_gray_scales_to_full_range():
    # depth 2: samples 0..3 scale by 255/3 = 85
    vals = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    packed = bytes([(0 << 6) | (1 << 4) | (2 << 2) | 3])
    out = decode_png(_ihdr_png(4, 1, 2, 0, 0, [], b"\x00" + packed))
    assert np.array_equal(out, vals * 85)


def _adam7_raw(img: np.ndarray, depth: int = 8) -> bytes:
    """Independent Adam7 serializer (explicit spec grids, filter-0 rows)."""
    h, w = img.shape[:2]
    flat = img.reshape(h, w, -1)
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        ys = list(range(y0, h, dy))
        xs = list(range(x0, w, dx))
        if not ys or not xs:
            continue
        for y in ys:
            row = flat[y, xs]
            if depth == 16:
                line = row.astype(">u2").tobytes()
            else:
                line = row.astype(np.uint8).tobytes()
            raw += b"\x00" + line
    return bytes(raw)


def test_adam7_interlaced_rgb_decodes():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    png = _ihdr_png(7, 11, 8, 2, 1, [], _adam7_raw(img))
    assert np.array_equal(decode_png(png), img)


def test_adam7_interlaced_16bit_gray_decodes():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 65536, (9, 10), dtype=np.uint16)
    png = _ihdr_png(10, 9, 16, 0, 1, [], _adam7_raw(img[..., None], depth=16))
    assert np.array_equal(decode_png(png), img)


def test_adam7_interlaced_palette_decodes():
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 8, (6, 5), dtype=np.uint8)
    png = _ihdr_png(
        5, 6, 8, 3, 1, [_chunk(b"PLTE", pal.tobytes())], _adam7_raw(idx[..., None])
    )
    assert np.array_equal(decode_png(png), pal[idx])


def test_gray_alpha_still_quarantines():
    raw = b"\x00" + bytes(8)
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 4, 0, 0, 0)
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    with pytest.raises(PngFormatError, match="color type 4"):
        decode_png(png)


def test_filters_at_new_byte_widths():
    """Sub/Up/Average/Paeth must reconstruct at bpp=2 (16-bit gray) and
    bpp=1 (palette indices) — the filter-forward pass here is computed
    independently on raw bytes per the spec."""

    def forward(img_bytes: np.ndarray, ftypes: list[int], bpp: int) -> bytes:
        h, rb = img_bytes.shape
        prev = np.zeros(rb, dtype=np.int16)
        out = bytearray()
        for r in range(h):
            line = img_bytes[r].astype(np.int16)
            f = ftypes[r % len(ftypes)]
            filt = np.zeros(rb, dtype=np.int16)
            for x in range(rb):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[x] = (line[x] - pred) % 256
            out += bytes([f]) + filt.astype(np.uint8).tobytes()
            prev = line
        return bytes(out)

    rng = np.random.default_rng(13)
    # 16-bit gray, all five filters cycling
    img16 = rng.integers(0, 65536, (10, 6), dtype=np.uint16)
    rows16 = np.frombuffer(
        b"".join(img16[r].astype(">u2").tobytes() for r in range(10)), dtype=np.uint8
    ).reshape(10, 12)
    raw = forward(rows16, [0, 1, 2, 3, 4], bpp=2)
    assert np.array_equal(decode_png(_ihdr_png(6, 10, 16, 0, 0, [], raw)), img16)

    # palette (bpp=1), Paeth-heavy
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = rng.integers(0, 16, (7, 9), dtype=np.uint8)
    raw = forward(idx.astype(np.uint8), [4, 3, 1, 2], bpp=1)
    png = _ihdr_png(9, 7, 8, 3, 0, [_chunk(b"PLTE", pal.tobytes())], raw)
    assert np.array_equal(decode_png(png), pal[idx])
