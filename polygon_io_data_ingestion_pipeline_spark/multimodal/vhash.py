"""Video near-duplicate detection: frame-majority perceptual signatures.

Completes the modality set — text, images (:mod:`.phash`) and audio
(:mod:`.afp`) already near-dedup; this gives the decoded video lane
(:func:`..multimodal.binaryops.frame_sample_video` — PNMV and
MJPEG-in-AVI/MP4 emit REAL frame bytes) the same treatment.

The clip signature is the MAJORITY VOTE of its sampled frames' 64-bit
perceptual dHashes: bit ``b`` of the signature is set iff at least half
the frames set bit ``b`` (ties set — deterministic).  This is SimHash's
aggregation applied to frame hashes, and it inherits the right
robustness properties for video:

- frame ORDER does not matter (a re-muxed or trimmed-and-rejoined copy
  votes the same),
- dropping or duplicating a minority of frames barely moves any bit's
  count past the majority line,
- per-frame re-encoding noise (MJPEG quality changes) flips only the
  frame-hash bits near their own thresholds, which then flip a clip
  bit only where the vote was already knife-edge.

Scale shape: the per-frame decode+dHash rides the EXISTING Arrow-batched
image lane (:func:`..multimodal.phash.image_hashes` — one Python pass
per frame); the majority aggregation is pure JVM (one ``groupBy`` with
64 conditional sums — no Python, no second shuffle), and candidates
come from the shared :func:`..operators.dedup.hamming_pairs` pigeonhole
band join.  Never all-pairs.

The registry query ``video_vhash_dup_pairs`` pushes deterministic PNMV
clips through the REAL container-walk -> frame-decode -> dHash ->
majority -> banded-join path, and its DuckDB oracle re-derives every
frame's pixels, restates the per-frame comparison bits, the per-clip
majority vote AND the all-pairs verification in SQL.

No reference counterpart — beyond-reference multimodal surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import hamming_pairs
from .phash import image_hashes


def majority_signature(hashes: list[int]) -> int:
    """Local (test-oracle) form of the majority vote: bit b set iff at
    least half the hashes set it.  Signed 64-bit, same packing contract
    as the Spark aggregation."""
    if not hashes:
        raise ValueError("majority of zero hashes")
    n = len(hashes)
    v = 0
    for b in range(64):
        cnt = sum((h >> b) & 1 for h in hashes)
        if 2 * cnt >= n:
            v |= 1 << b
    return v - (1 << 64) if v >= 1 << 63 else v


def video_signatures(
    frames: DataFrame,
    id_col: str = "media_id",
    frame_col: str = "frame",
) -> DataFrame:
    """(id, vhash, n_frames) per clip from its frame rows: per-frame
    dHash through the image lane (undecodable frames quarantine out),
    then the JVM majority aggregation — 64 conditional sums in ONE
    groupBy, recombined into a signed BIGINT.  Clips whose every frame
    quarantined produce no row (nothing to fingerprint — the honest
    outcome; callers needing accounting join back against the clip
    ids)."""
    fh = image_hashes(
        frames.select(id_col, F.col(frame_col).alias("payload")),
        id_col=id_col,
        payload_col="payload",
    ).filter(F.col("decode_ok"))
    # per-bit set counts: shiftrightunsigned keeps bit 63 honest
    aggs = [F.count("*").alias("__n")] + [
        F.sum(
            F.shiftrightunsigned(F.col("dhash"), b).bitwiseAND(F.lit(1))
        ).alias(f"__c{b}")
        for b in range(64)
    ]
    counted = fh.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.lit(-(1 << 63)) if b == 63 else F.lit(1 << b).cast("long")
        sig = sig + F.when(
            F.col(f"__c{b}") * 2 >= F.col("__n"), bit
        ).otherwise(F.lit(0).cast("long"))
    return counted.select(
        id_col, sig.alias("vhash"), F.col("__n").cast("int").alias("n_frames")
    )


def video_dup_pairs(
    videos: DataFrame,
    every_ms: int = 1000,
    max_hamming: int = 6,
    id_col: str = "media_id",
) -> DataFrame:
    """Video near-duplicate pairs end-to-end: container frame sampling
    (:func:`..multimodal.binaryops.frame_sample_video` — the real walk
    for PNMV/MJPEG, honest stub rows for inter-frame codecs, which then
    quarantine at the decode step), per-frame dHash, majority clip
    signature, banded hamming join.  One Python decode pass over the
    frames + linear shuffles.

    LAZY localCheckpoint on the signature frame: it feeds both sides of
    the band self-join and Spark has no cross-branch CSE (the same
    multi-consumer discipline as the image and audio twins)."""
    from .binaryops import frame_sample_video

    frames = frame_sample_video(videos, every_ms=every_ms)
    sig = video_signatures(frames, id_col=id_col).localCheckpoint(eager=False)
    return hamming_pairs(
        sig, "vhash", id_col=id_col, bits=64, max_hamming=max_hamming
    )


def video_vhash_pairs_allpairs(
    sig: DataFrame, id_col: str = "media_id", max_hamming: int = 6
) -> DataFrame:
    """|clips|^2 TEST ORACLE for banded recall — crossJoin, never a
    production path (same contract as the image/audio twins)."""
    a = sig.select(F.col(id_col).alias("id1"), F.col("vhash").alias("h1"))
    b = sig.select(F.col(id_col).alias("id2"), F.col("vhash").alias("h2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
