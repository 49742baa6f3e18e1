"""Baseline TIFF 6.0 codec: exact encode->decode roundtrips across
compression (none/PackBits/LZW), predictor, strip layouts and both
channel counts; big-endian and MinIsWhite decode; quarantine on
unsupported variants; Spark-lane integration (features + resize)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.tiff import (
    TiffFormatError,
    decode_tiff,
    encode_tiff,
)

RNG = np.random.default_rng(7)
GRAY = RNG.integers(0, 256, (37, 53), dtype=np.uint8)
RGB = RNG.integers(0, 256, (21, 34, 3), dtype=np.uint8)
SMOOTH = (np.add.outer(np.arange(40), np.arange(60)) % 256).astype(np.uint8)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("pred", [False, True])
@pytest.mark.parametrize("rps", [None, 7])
def test_exact_roundtrip_matrix(comp, pred, rps):
    for arr in (GRAY, RGB, SMOOTH):
        enc = encode_tiff(arr, compression=comp, predictor=pred, rows_per_strip=rps)
        dec = decode_tiff(enc)
        assert dec.shape == arr.shape and (dec == arr).all()


def test_lzw_actually_compresses_and_resets():
    assert len(encode_tiff(SMOOTH, compression="lzw", predictor=True)) < len(
        encode_tiff(SMOOTH)
    ) / 4
    # low-entropy 120k-pixel image: LZW table fills -> Clear/reset path
    big = RNG.integers(0, 4, (300, 400), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(big, compression="lzw")) == big).all()


def _tiny_tiff(end, magic, photometric):
    """Hand-built 2x2 grayscale uncompressed TIFF in either byte order."""
    pix = bytes([10, 20, 30, 40])
    n = 8
    ifd_off = 8
    ifd = struct.pack(end + "H", n)
    data_off = 8 + 2 + 12 * n + 4

    def entry(tag, etype, count, value):
        if etype == 3:
            raw = struct.pack(end + "H", value) + b"\x00\x00"
        else:
            raw = struct.pack(end + "I", value)
        return struct.pack(end + "HHI", tag, etype, count) + raw

    ifd += entry(256, 4, 1, 2) + entry(257, 4, 1, 2)
    ifd += entry(258, 3, 1, 8) + entry(259, 3, 1, 1)
    ifd += entry(262, 3, 1, photometric)
    ifd += entry(273, 4, 1, data_off) + entry(278, 4, 1, 2)
    ifd += entry(279, 4, 1, 4)
    ifd += struct.pack(end + "I", 0)
    return magic + struct.pack(end + "I", ifd_off) + ifd + pix


def test_big_endian_and_min_is_white():
    mm = _tiny_tiff(">", b"MM\x00*", 1)
    assert (decode_tiff(mm) == np.array([[10, 20], [30, 40]])).all()
    inverted = _tiny_tiff("<", b"II*\x00", 0)  # MinIsWhite
    assert (decode_tiff(inverted) == 255 - np.array([[10, 20], [30, 40]])).all()


def test_unsupported_variants_quarantine():
    good = encode_tiff(GRAY)
    with pytest.raises(TiffFormatError):
        decode_tiff(b"not a tiff")
    with pytest.raises(TiffFormatError):
        decode_tiff(good[:40])  # truncated
    with pytest.raises(TiffFormatError):
        encode_tiff(GRAY.astype(np.uint16))  # 16-bit unsupported
    # tiled flag rejected: craft by renaming the RowsPerStrip tag to
    # TileWidth (322) in the encoded IFD
    (n,) = struct.unpack("<H", good[8:10])
    blob = bytearray(good)
    for i in range(n):
        base = 10 + 12 * i
        (tag,) = struct.unpack("<H", blob[base : base + 2])
        if tag == 278:
            blob[base : base + 2] = struct.pack("<H", 322)
    with pytest.raises(TiffFormatError):
        decode_tiff(bytes(blob))


def test_spark_feature_and_resize_lanes(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        decode_image_features,
        resize_images,
    )

    rows = [
        (1, bytearray(encode_tiff(GRAY, compression="lzw", predictor=True)), {"kind": "image"}),
        (2, bytearray(encode_tiff(RGB, compression="packbits")), {"kind": "image"}),
        (3, bytearray(b"II*\x00corrupt"), {"kind": "image"}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta map<string,string>"
    )
    feats = {r["media_id"]: r["features"] for r in decode_image_features(df).collect()}
    assert feats[1] is not None and feats[2] is not None
    assert feats[3] is None  # quarantined, not failed
    out = {r["media_id"]: r for r in resize_images(df, 8, 6).collect()}
    resized = decode_tiff(bytes(out[2]["payload"]))
    assert resized.shape == (6, 8, 3)
