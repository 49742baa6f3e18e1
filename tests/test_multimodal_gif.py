"""GIF codec on REAL bytes: lossless palette roundtrips, LZW dictionary
growth, interlace, disposal compositing, the famous 1px interop fixture,
quarantines, and the Spark feature/frame-sampling integration."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.gif import (
    GifFormatError,
    decode_gif,
    encode_gif,
)

PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], dtype=np.uint8
)

# the canonical minimal GIF89a: 1x1 white pixel, produced by external
# tooling — an interop fixture our encoder did not write
ONE_PX = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
)


def test_gray_roundtrip_is_lossless():
    g = (np.add.outer(np.linspace(0, 255, 33), np.linspace(0, 255, 47)) / 2).astype(
        np.uint8
    )
    fms, frames = decode_gif(encode_gif(g))
    assert len(frames) == 1
    assert np.array_equal(frames[0], np.stack([g] * 3, axis=-1))


def test_animated_palette_roundtrip_is_lossless():
    rng = np.random.default_rng(5)
    fr = [PAL[rng.integers(0, 5, (21, 30))] for _ in range(3)]
    fms, frames = decode_gif(encode_gif(fr, frame_ms=40))
    assert fms == 40 and len(frames) == 3
    assert all(np.array_equal(a, b) for a, b in zip(fr, frames))


def test_lzw_survives_dictionary_growth():
    # high-entropy content forces code-width growth and clear-code resets
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    fms, frames = decode_gif(encode_gif(img))
    assert np.array_equal(frames[0], np.stack([img] * 3, axis=-1))


def test_external_one_pixel_fixture_decodes():
    fms, frames = decode_gif(ONE_PX)
    assert frames[0].shape == (1, 1, 3)
    assert tuple(frames[0][0, 0]) == (255, 255, 255)


def test_interlaced_image_decodes():
    img = PAL[np.arange(20)[:, None] % 5 * np.ones((1, 12), dtype=int)]
    enc = bytearray(encode_gif(img))
    # flip the interlace flag and reorder rows per the 4-pass scheme
    desc = enc.find(b"\x2c")
    enc[desc + 9] |= 0x40
    # rebuild the pixel data interlaced: encode the reordered rows
    order = [y for s0, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s0, 20, st)]
    inter = encode_gif(img[np.array(order)])
    i_desc = inter.find(b"\x2c")
    rebuilt = bytes(enc[: desc + 10]) + inter[i_desc + 10 :]
    fms, frames = decode_gif(rebuilt)
    assert np.array_equal(frames[0], PAL[np.arange(20)[:, None] % 5 * np.ones((1, 12), dtype=int)])


def test_true_color_input_refuses_to_guess():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="quantize first"):
        encode_gif(img)


def test_corrupt_and_unsupported_quarantine():
    with pytest.raises(GifFormatError):
        decode_gif(b"GIF89a\x01\x00")  # truncated
    with pytest.raises(GifFormatError):
        decode_gif(b"NOTAGIF")
    # disposal=3 (restore-to-previous) is explicitly unsupported
    anim = bytearray(encode_gif([PAL[np.zeros((4, 4), dtype=int)]] * 2))
    gce = anim.find(b"\x21\xf9\x04")
    anim[gce + 3] = (anim[gce + 3] & ~0x1C) | (3 << 2)
    with pytest.raises(GifFormatError, match="disposal=3"):
        decode_gif(bytes(anim))
    # an image descriptor whose rect exceeds the logical screen must be
    # GifFormatError (quarantine), not a numpy broadcast ValueError that
    # would fail the whole Spark task (ADVICE r6)
    big = bytearray(encode_gif(PAL[np.zeros((4, 4), dtype=int)]))
    desc = big.find(b"\x2c")
    # widen the image width field to 9 while the screen stays 4x4
    big[desc + 5 : desc + 7] = (9).to_bytes(2, "little")
    with pytest.raises(GifFormatError, match="exceeds"):
        decode_gif(bytes(big))


def test_spark_image_features_and_frame_sampling(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_image_features,
        decode_pnm,
        frame_sample_video,
    )

    g = (np.add.outer(np.linspace(0, 255, 24), np.linspace(0, 255, 32)) / 2).astype(
        np.uint8
    )
    still = encode_gif(g)
    rng = np.random.default_rng(3)
    anim_frames = [PAL[rng.integers(0, 5, (10, 14))] for _ in range(4)]
    anim = encode_gif(anim_frames, frame_ms=500)
    rows = [
        (1, "image", bytearray(still), {"mime": "image/gif", "width": 32, "height": 24, "duration_ms": None}),
        (2, "video", bytearray(anim), {"mime": "image/gif", "width": 14, "height": 10, "duration_ms": 2000}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in decode_image_features(df).collect()}
    assert feats[1][0] == 32.0 and feats[1][1] == 24.0 and feats[1][2] == 3.0
    assert abs(feats[1][3] - float(np.stack([g] * 3, axis=-1).mean())) < 1e-6

    sampled = sorted(
        frame_sample_video(df.filter("media_id = 2"), every_ms=500).collect(),
        key=lambda r: r["frame_ts_ms"],
    )
    assert [r["frame_ts_ms"] for r in sampled] == [0, 500, 1000, 1500]
    for r, orig in zip(sampled, anim_frames):
        assert np.array_equal(decode_pnm(bytes(r["frame"])), orig)
