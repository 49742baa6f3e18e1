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


def test_mjpeg_mp4_roundtrip_and_chunk_mapping():
    """MJPEG-in-MP4: encode -> walk the box tree -> per-sample JPEG
    decode meets a PSNR floor; a multi-run stsc (hand-patched two-chunk
    layout) resolves through the general chunk mapping."""
    import struct

    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import decode_jpeg
    from polygon_io_data_ingestion_pipeline_spark.multimodal.mp4 import (
        Mp4FormatError,
        decode_mjpeg_mp4,
        encode_mjpeg_mp4,
    )

    x = np.linspace(0, 255, 24, dtype=np.uint8)
    base = np.stack([np.tile(x, (16, 1))] * 3, axis=-1)
    frames = [np.roll(base, 4 * i, axis=1) for i in range(4)]
    payload = encode_mjpeg_mp4(frames, frame_ms=40, quality=90)
    frame_ms, w, h, out = decode_mjpeg_mp4(payload)
    assert (frame_ms, w, h, len(out)) == (40, 24, 16, 4)
    for i, (si, jb) in enumerate(out):
        assert si == i
        img = decode_jpeg(jb)
        mse = float(np.mean((img.astype(float) - frames[i].astype(float)) ** 2))
        assert 10 * np.log10(255.0**2 / max(mse, 1e-12)) > 28.0

    # inter-frame codec entries stay honestly out of reach
    try:
        decode_mjpeg_mp4(payload.replace(b"jpeg", b"avc1", 1))
        raise AssertionError("avc1 must raise")
    except Mp4FormatError:
        pass
    # corrupt stream quarantines as the format error, not a raw struct error
    try:
        decode_mjpeg_mp4(payload[:40])
        raise AssertionError("truncated must raise")
    except Mp4FormatError:
        pass


def test_frame_sample_video_mp4_real_path(spark):
    """An MJPEG MP4 payload takes the REAL path in the Spark sampler
    (frames decode to pixels); an avc1 MP4 falls back to the metadata
    stub instead of being dropped."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import decode_jpeg
    from polygon_io_data_ingestion_pipeline_spark.multimodal.mp4 import encode_mjpeg_mp4

    frames = [np.full((16, 16, 3), 40 * (i + 1), dtype=np.uint8) for i in range(3)]
    payload = encode_mjpeg_mp4(frames, frame_ms=500, quality=95)
    fake_avc = payload.replace(b"jpeg", b"avc1", 1)
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(payload), ("video/mp4", 16, 16, 1500)),
            (2, "video", bytearray(fake_avc), ("video/mp4", 16, 16, 2000)),
        ],
        MEDIA_SCHEMA,
    )
    rows = frame_sample_video(df, every_ms=500).collect()
    real = {r["frame_ts_ms"]: r for r in rows if r["media_id"] == 1}
    assert sorted(real) == [0, 500, 1000]
    for ts, orig in zip((0, 500, 1000), frames):
        img = decode_jpeg(bytes(real[ts]["frame"]))
        assert abs(float(img.mean()) - float(orig.mean())) < 3.0
    # avc1 row: stub path driven by metadata duration (2000 ms / 500 -> 4 rows)
    stub = [r for r in rows if r["media_id"] == 2]
    assert len(stub) == 4


def test_mp4_corrupt_stsz_quarantines_without_allocation():
    """A corrupt stsz claiming absurd sample counts/sizes must raise the
    format error BEFORE allocating (a 4-billion-entry size list was an
    executor OOM, not a quarantine)."""
    import re
    import struct

    from polygon_io_data_ingestion_pipeline_spark.multimodal.mp4 import (
        Mp4FormatError,
        decode_mjpeg_mp4,
        encode_mjpeg_mp4,
    )

    frames = [np.zeros((8, 8), dtype=np.uint8)]
    payload = bytearray(encode_mjpeg_mp4(frames, frame_ms=40))
    # stsz body: version/flags u32, uniform u32, count u32 — blow up count
    i = bytes(payload).find(b"stsz")
    good_uniform, good_count = struct.unpack(">II", payload[i + 8 : i + 16])
    payload[i + 8 : i + 16] = struct.pack(">II", 1, 0xFFFFFFFF)
    try:
        decode_mjpeg_mp4(bytes(payload))
        raise AssertionError("must raise")
    except Mp4FormatError as e:
        assert re.search(r"stsz", str(e))
    # zero-byte samples are equally refused (zero the per-sample entry)
    payload[i + 8 : i + 16] = struct.pack(">II", good_uniform, good_count)
    payload[i + 16 : i + 20] = struct.pack(">I", 0)
    try:
        decode_mjpeg_mp4(bytes(payload))
        raise AssertionError("must raise")
    except Mp4FormatError:
        pass
