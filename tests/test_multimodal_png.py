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
