"""Real video frame sampling: PNMV container roundtrip through the
Arrow-batched mapInPandas path, frames decoded back to exact pixels."""

from __future__ import annotations

import numpy as np

from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
    MEDIA_SCHEMA,
    decode_pnm,
    decode_pnmv,
    encode_pnmv,
    frame_sample_video,
)


def _frames():
    rng = [np.full((4, 3, 3), v, dtype=np.uint8) for v in (10, 20, 30)]
    rng[1][0, 0] = (1, 2, 3)  # make frame 1 distinguishable beyond fill value
    return rng


def test_pnmv_roundtrip_exact():
    frames = _frames()
    payload = encode_pnmv(frames, frame_ms=500)
    frame_ms, decoded = decode_pnmv(payload)
    assert frame_ms == 500 and len(decoded) == 3
    for (ts, raw), orig, want_ts in zip(decoded, frames, (0, 500, 1000)):
        assert ts == want_ts
        assert np.array_equal(decode_pnm(raw), orig)


def test_frame_sample_video_real_path(spark):
    frames = _frames()
    payload = encode_pnmv(frames, frame_ms=500)  # 1500 ms of "video"
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload), ("video/pnmv", 3, 4, 1500))], MEDIA_SCHEMA
    )
    got = {r["frame_ts_ms"]: r for r in frame_sample_video(df, every_ms=500).collect()}
    assert sorted(got) == [0, 500, 1000]
    # Each emitted frame is the REAL PNM bytes of the covering frame.
    for ts, orig in zip((0, 500, 1000), frames):
        assert np.array_equal(decode_pnm(bytes(got[ts]["frame"])), orig)


def test_frame_sample_video_zero_frames(spark):
    # A valid zero-frame container must yield no sample rows (it used to
    # index frames[-1] of an empty list and kill the task); other rows in
    # the same batch still sample normally.
    empty = encode_pnmv([], frame_ms=500)
    full = encode_pnmv(_frames(), frame_ms=500)
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(empty), ("video/pnmv", 0, 0, 0)),
            (2, "video", bytearray(full), ("video/pnmv", 3, 4, 1500)),
        ],
        MEDIA_SCHEMA,
    )
    rows = frame_sample_video(df, every_ms=500).collect()
    assert sorted({r["media_id"] for r in rows}) == [2]
    assert sorted(r["frame_ts_ms"] for r in rows) == [0, 500, 1000]


def test_frame_sample_video_stub_fallback(spark):
    df = spark.createDataFrame(
        [(2, "video", bytearray(b"\x00\x01notapnmv"), ("video/mp4", 0, 0, 2000))],
        MEDIA_SCHEMA,
    )
    rows = frame_sample_video(df, every_ms=1000).collect()
    # Row explosion and timestamps still follow metadata; bytes are the
    # deterministic digest stub.
    assert [r["frame_ts_ms"] for r in rows] == [0, 1000]
    assert all(len(bytes(r["frame"])) == 16 for r in rows)
