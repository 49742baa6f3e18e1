"""Real end-to-end image modality: stdlib-encoded PNM (P5/P6) bytes
decoded, feature-extracted, and resized through the Arrow-batched
``mapInPandas`` pipeline, verified against NumPy on the source pixels."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal import (
    MEDIA_SCHEMA,
    PRODUCTION_DECODERS,
    decode_image_features,
    decode_pnm,
    encode_pnm,
    resize_images,
    resize_pnm,
)


def _gradient_rgb(h: int = 8, w: int = 16) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8) * (255 // max(w - 1, 1))
    img[:, :, 1] = 128
    img[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None] * 10
    return img


def test_production_decoder_flag():
    assert PRODUCTION_DECODERS["image"] is True


def test_pnm_roundtrip_exact():
    rgb = _gradient_rgb()
    assert np.array_equal(decode_pnm(encode_pnm(rgb)), rgb)
    gray = rgb[:, :, 0]
    assert np.array_equal(decode_pnm(encode_pnm(gray)), gray)

    # header comments and 16-bit maxval per the spec
    with_comment = b"P5\n# a comment\n2 2\n255\n" + bytes([0, 64, 128, 255])
    assert decode_pnm(with_comment).tolist() == [[0, 64], [128, 255]]
    deep = b"P5\n1 1\n65535\n" + (1000).to_bytes(2, "big")
    assert decode_pnm(deep).tolist() == [[1000]]

    for bad in (b"JFIF....", b"P6\n4 4\n255\nshort", b"P5\n-1 2\n255\n\x00"):
        with pytest.raises(ValueError):
            decode_pnm(bad)


def test_image_features_end_to_end(spark):
    rgb = _gradient_rgb()
    rows = [
        (1, "image", encode_pnm(rgb), ("image/x-portable-pixmap", 16, 8, None)),
        (2, "image", b"P6\n4 4\n255\ntrunc", ("image/x-portable-pixmap", 4, 4, None)),
        (3, "image", b"BM......", ("image/bmp", 4, 4, None)),  # stub path (no BMP codec)
        (4, "image", None, ("image/png", None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in decode_image_features(df).collect()}

    w, h, c, mean, std, lo, hi, grad = feats[1]
    x = rgb.astype(np.float64)
    assert (w, h, c) == (16.0, 8.0, 3.0)
    assert mean == pytest.approx(x.mean()) and std == pytest.approx(x.std())
    assert (lo, hi) == (x.min(), x.max())
    assert grad == pytest.approx(np.mean(np.abs(np.diff(x, axis=1))))

    assert feats[2] is None  # corrupt PNM quarantined
    assert feats[3] is not None and len(feats[3]) == 8  # non-PNM falls to stub
    assert feats[4] is None


def test_resize_real_pixels(spark):
    rgb = _gradient_rgb(8, 16)
    # pure-python expectation: nearest-neighbor index sampling
    rows_idx = np.minimum((np.arange(4) * 8) // 4, 7)
    cols_idx = np.minimum((np.arange(6) * 16) // 6, 15)
    want = rgb[rows_idx][:, cols_idx]
    assert np.array_equal(decode_pnm(resize_pnm(encode_pnm(rgb), 6, 4)), want)

    df = spark.createDataFrame(
        [
            (1, "image", encode_pnm(rgb), ("image/x-portable-pixmap", 16, 8, None)),
            (2, "image", b"GIF89a..", ("image/gif", 9, 9, None)),
        ],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in resize_images(df, 6, 4).collect()}
    got = decode_pnm(bytes(out[1]["payload"]))
    assert np.array_equal(got, want)
    assert out[1]["meta"]["width"] == 6 and out[1]["meta"]["height"] == 4
    assert bytes(out[2]["payload"]) == b"GIF89a.."  # stub path: bytes kept
    assert out[2]["meta"]["width"] == 6
