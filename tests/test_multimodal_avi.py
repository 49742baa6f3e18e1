"""MJPEG-in-AVI on REAL bytes: container roundtrip, per-frame JPEG
decode fidelity, quarantine of inter-frame codecs, and the Spark
frame-sampling integration."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.avi import (
    AviFormatError,
    decode_mjpeg_avi,
    encode_mjpeg_avi,
)
from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import decode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _frames(n=3, h=24, w=40):
    out = []
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    for i in range(n):
        img = np.stack(
            [
                np.clip(np.add.outer(y, x) / 2 + 20 * i, 0, 255),
                np.tile(x, (h, 1)),
                np.tile(y[:, None], (1, w)),
            ],
            axis=-1,
        ).astype(np.uint8)
        out.append(img)
    return out


def test_roundtrip_decodes_every_frame_with_psnr_floor():
    frames = _frames()
    avi = encode_mjpeg_avi(frames, frame_ms=40, quality=90)
    frame_ms, w, h, got = decode_mjpeg_avi(avi)
    assert (frame_ms, w, h) == (40, 40, 24)
    assert [ts for ts, _ in got] == [0, 40, 80]
    for (ts, jpg), orig in zip(got, frames):
        img = decode_jpeg(jpg)  # each frame is an INDEPENDENT baseline JPEG
        assert img.shape == orig.shape
        assert _psnr(orig, img) >= 30.0


def test_container_structure_is_standard_riff():
    avi = encode_mjpeg_avi(_frames(2), frame_ms=100)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert b"hdrl" in avi and b"movi" in avi and b"idx1" in avi
    assert b"vidsMJPG" in avi  # stream header declares the handler
    assert avi.count(b"\xff\xd8\xff") == 2  # two embedded JPEG SOIs


def test_non_mjpeg_and_corrupt_avis_quarantine():
    avi = bytearray(encode_mjpeg_avi(_frames(1)))
    pos = avi.find(b"vidsMJPG")
    avi[pos + 4 : pos + 8] = b"H264"
    with pytest.raises(AviFormatError, match="unsupported"):
        decode_mjpeg_avi(bytes(avi))
    with pytest.raises(AviFormatError):
        decode_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(AviFormatError):
        decode_mjpeg_avi(encode_mjpeg_avi(_frames(2))[:60])  # truncated chunk


def test_frame_sample_video_takes_the_real_mjpeg_path(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        frame_sample_video,
    )

    frames = _frames(4)
    avi = encode_mjpeg_avi(frames, frame_ms=500, quality=90)
    rows = [
        (1, "video", bytearray(avi), {"mime": "video/x-msvideo", "width": 40, "height": 24, "duration_ms": 2000}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sorted(frame_sample_video(df, every_ms=500).collect(), key=lambda r: r["frame_ts_ms"])
    assert [r["frame_ts_ms"] for r in got] == [0, 500, 1000, 1500]
    # every sampled frame is the ACTUAL jpeg of its timestamp, not a digest
    for r, orig in zip(got, frames):
        img = decode_jpeg(bytes(r["frame"]))
        assert _psnr(orig, img) >= 30.0


def test_frames_inside_rec_lists_are_found():
    """Some AVI writers wrap movi frames in 'rec ' grouping LISTs — the
    reader must recurse into them."""
    import struct

    from polygon_io_data_ingestion_pipeline_spark.multimodal.avi import (
        _chunk,
        _list,
    )

    plain = encode_mjpeg_avi(_frames(2), frame_ms=100)
    # rebuild the movi LIST with each 00dc chunk wrapped in a rec LIST
    _fms, _w, _h, frames = decode_mjpeg_avi(plain)
    movi_body = b"movi" + b"".join(
        _list(b"rec ", _chunk(b"00dc", jpg)) for _ts, jpg in frames
    )
    movi_start = plain.find(b"LIST", plain.find(b"movi") - 8)
    # splice: everything before the movi LIST + new movi + idx1 dropped
    head = plain[12 : movi_start]
    riff_body = b"AVI " + head + _chunk(b"LIST", movi_body)
    rebuilt = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    _fms2, _w2, _h2, got = decode_mjpeg_avi(rebuilt)
    assert [jpg for _ts, jpg in got] == [jpg for _ts, jpg in frames]
