"""Video near-dup by frame-majority signature (multimodal/vhash.py):
the majority vote's invariances (frame order, minority drops), Spark
aggregation == local oracle, banded == all-pairs recall, MJPEG-AVI
end-to-end, and the quarantine contract for undecodable frames."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
    encode_pnm,
    encode_pnmv,
)
from polygon_io_data_ingestion_pipeline_spark.multimodal.phash import dhash64
from polygon_io_data_ingestion_pipeline_spark.multimodal.vhash import (
    majority_signature,
    video_dup_pairs,
    video_signatures,
    video_vhash_pairs_allpairs,
)


def _frame(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(8, 9)).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_majority_signature_properties():
    hs = [dhash64(_frame(s)) for s in range(7)]
    sig = majority_signature(hs)
    # frame ORDER is irrelevant (a re-muxed copy votes the same)
    assert majority_signature(list(reversed(hs))) == sig
    # dropping a minority of frames barely moves the vote
    assert _ham(majority_signature(hs[:-1]), sig) <= 10
    # duplicating every frame changes no count ratio at all
    assert majority_signature(hs + hs) == sig
    with pytest.raises(ValueError, match="zero"):
        majority_signature([])
    # signed packing: a bit-63-heavy input yields a negative long
    assert majority_signature([-(1 << 63)] * 3) == -(1 << 63)


def test_spark_signatures_equal_local_majority(spark):
    clips = {1: range(5), 2: range(10, 14)}
    rows = [
        (cid, i, bytearray(encode_pnm(_frame(s))))
        for cid, seeds in clips.items()
        for i, s in enumerate(seeds)
    ]
    df = spark.createDataFrame(rows, "media_id long, idx int, frame binary")
    got = {
        r["media_id"]: (r["vhash"], r["n_frames"])
        for r in video_signatures(df).collect()
    }
    for cid, seeds in clips.items():
        want = majority_signature([dhash64(_frame(s)) for s in seeds])
        assert got[cid] == (want, len(list(seeds)))


def test_dup_pairs_end_to_end_and_allpairs_recall(spark):
    """PNMV clips through the REAL path: near-dup siblings (one frame
    perturbed by one pixel) pair up; banded join equals the all-pairs
    oracle; a clip of garbage frames quarantines out entirely."""
    rows = []
    for base in range(4):
        frames = [_frame(100 * base + f) for f in range(4)]
        rows.append((2 * base, bytearray(encode_pnmv(frames, frame_ms=1000)), None))
        pert = [f.copy() for f in frames]
        pert[2][0, 4] = (int(pert[2][0, 4]) + 32) % 256
        rows.append((2 * base + 1, bytearray(encode_pnmv(pert, frame_ms=1000)), None))
    # a non-video payload: the metadata stub emits digest bytes which
    # quarantine at the image decode — no signature, no pairs
    rows.append((99, bytearray(b"not video"), {"duration_ms": 3000}))
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, meta struct<duration_ms: bigint>",
    )
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in video_dup_pairs(df, every_ms=1000, max_hamming=6).collect()
    }
    assert {(i1, i2) for i1, i2, _h in got} >= {(0, 1), (2, 3), (4, 5), (6, 7)}
    assert all(h <= 6 for _a, _b, h in got)
    assert not any(99 in (a, b) for a, b, _h in got)
    # banded == all-pairs on the same signatures
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        frame_sample_video,
    )

    sig = video_signatures(frame_sample_video(df, every_ms=1000))
    want = {
        (r["id1"], r["id2"], r["hamming"])
        for r in video_vhash_pairs_allpairs(sig, max_hamming=6).collect()
    }
    assert got == want


def test_mjpeg_avi_rides_the_same_lane(spark):
    """An MJPEG-AVI re-container of the same frames lands within a
    small hamming radius of the PNMV original — the cross-container
    dedup the signature exists for (JPEG is lossy, so near, and the
    majority vote absorbs the per-frame noise)."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.avi import (
        encode_mjpeg_avi,
    )

    frames = [_frame(7 * f + 1) for f in range(4)]
    pnmv = encode_pnmv(frames, frame_ms=1000)
    avi = encode_mjpeg_avi([f[:, :, None].repeat(3, 2) for f in frames], frame_ms=1000)
    df = spark.createDataFrame(
        [(1, bytearray(pnmv), None), (2, bytearray(avi), None)],
        "media_id long, payload binary, meta struct<duration_ms: bigint>",
    )
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        frame_sample_video,
    )

    sig = {r["media_id"]: r["vhash"] for r in
           video_signatures(frame_sample_video(df, every_ms=1000)).collect()}
    assert set(sig) == {1, 2}
    assert _ham(sig[1], sig[2]) <= 10


def test_videodedup_cli_journey(spark, tmp_path, capsys):
    """End-to-end CLI: media parquet in -> pairs/ + clusters/ out with
    honest accounting (a meta-less table works; undecodable clips count
    quarantined)."""
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    rows = []
    for base in range(3):
        frames = [_frame(50 * base + f) for f in range(4)]
        rows.append((2 * base, bytearray(encode_pnmv(frames, frame_ms=1000))))
        pert = [f.copy() for f in frames]
        pert[1][0, 4] = (int(pert[1][0, 4]) + 32) % 256
        rows.append((2 * base + 1, bytearray(encode_pnmv(pert, frame_ms=1000))))
    rows.append((100, bytearray(b"not a video at all")))
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "videodedup", "--src", src, "--out", out, "--master", "local[4]",
    ]) == 0
    msg = capsys.readouterr().out
    assert "clips=7 fingerprinted=6 quarantined=1" in msg
    assert "duplicates_to_drop=3" in msg
    cl = {r["media_id"]: r["cluster_id"] for r in
          spark.read.parquet(out + "/clusters").collect()}
    assert cl[1] == cl[0] and cl[3] == cl[2] and cl[5] == cl[4]
    assert main([
        "videodedup", "--src", src, "--out", out, "--max-hamming", "-1",
    ]) == 2
