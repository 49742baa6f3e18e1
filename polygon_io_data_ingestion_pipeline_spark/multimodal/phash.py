"""Perceptual image hashing + hamming-banded image near-duplicate pairs.

The reference pipeline has no image dedup at all (its media handling is
metadata-only); this module closes the multimodal-dedup gap in the
LLM-training-data surface: a crawled corpus carrying image payloads can
be near-deduped the same way its text is — re-encoded, resized, or
slightly-edited copies of one image collapse to one representative.

Two standard perceptual hashes over the already-real decode lane
(:func:`..multimodal.binaryops._decode_any_image` — PNM/JPEG/PNG/GIF/
TIFF):

- **dHash** (difference hash): luma -> 9x8 box downsample -> 64 bits of
  "is the left pixel brighter than its right neighbor".  Gradient
  structure survives re-encoding and brightness shifts; integer
  comparisons make it bit-exact across engines, so the registry query
  ``img_dhash_dup_pairs`` certifies this path against a DuckDB oracle.
- **pHash** (DCT hash): luma -> 32x32 box downsample -> 2-D DCT-II ->
  low-frequency 8x8 block vs its median (DC excluded).  More robust to
  blur/compression than dHash; float DCT math, so it is pinned by
  pytest (roundtrip-through-JPEG robustness) rather than a SQL oracle.

Candidate pairs come from :func:`..operators.dedup.hamming_pairs` — the
pigeonhole banded equi-join shared with SimHash text dedup — so the
production path is NEVER all-pairs: shuffle volume stays linear in the
number of images at 100 TB.  ``image_hash_pairs_allpairs`` exists only
as the explicitly-quadratic recall oracle for tests, exactly like
``dedup.simhash_pairs_allpairs``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import hamming_pairs
from .binaryops import _decode_any_image

#: 32-point orthonormal DCT-II basis (same construction as jpeg._C, at
#: the pHash working size): DCT = _DCT32 @ block @ _DCT32.T.
_DCT32 = np.zeros((32, 32))
for _k in range(32):
    for _n in range(32):
        _DCT32[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 64) * (
            np.sqrt(1.0 / 32.0) if _k == 0 else np.sqrt(2.0 / 32.0)
        )


def _luma(img: np.ndarray) -> np.ndarray:
    """2-D luminance plane: grayscale passes through, RGB(A) folds by
    ITU-R BT.601 weights (alpha ignored)."""
    x = np.asarray(img, dtype=np.float64)
    if x.ndim == 2:
        return x
    if x.shape[2] == 1:
        return x[:, :, 0]
    return 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]


def _box_downsample(gray: np.ndarray, width: int, height: int) -> np.ndarray:
    """Exact area-mean pooling onto a ``height x width`` grid with
    integer block edges ``(i * dim) // n`` — deterministic (no float
    resampling kernel), so an identity-size input returns its own pixel
    values bit-exactly (what the SQL oracle relies on).  Upscales in
    either dimension fall back to nearest-neighbor index sampling (the
    shared :func:`..multimodal.binaryops._resize_nn` math)."""
    h, w = gray.shape
    gray = gray.astype(np.float64)
    if h == height and w == width:
        return gray
    re = (np.arange(height + 1) * h) // height
    ce = (np.arange(width + 1) * w) // width
    if np.any(np.diff(re) == 0) or np.any(np.diff(ce) == 0):
        from .binaryops import _resize_nn

        return _resize_nn(gray, width, height).astype(np.float64)
    s = np.zeros((h + 1, w + 1))
    s[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    r0, r1 = re[:-1], re[1:]
    c0, c1 = ce[:-1], ce[1:]
    sums = (
        s[np.ix_(r1, c1)] - s[np.ix_(r0, c1)] - s[np.ix_(r1, c0)] + s[np.ix_(r0, c0)]
    )
    counts = np.outer(r1 - r0, c1 - c0)
    return sums / counts


def _pack64(bit_at: np.ndarray) -> int:
    """Pack a row-major boolean array of <= 64 entries into a SIGNED
    64-bit integer (bit i = entry i), the storage form a Spark/parquet
    BIGINT column carries."""
    v = 0
    for i, b in enumerate(bit_at.ravel()):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: 9x8 luma grid, bit ``r*8 + c`` set iff
    ``grid[r][c] > grid[r][c+1]``."""
    g = _box_downsample(_luma(img), 9, 8)
    return _pack64(g[:, :-1] > g[:, 1:])


def phash64(img: np.ndarray) -> int:
    """64-bit DCT hash: 32x32 luma grid -> 2-D DCT-II -> low-frequency
    8x8 block; bit ``r*8 + c`` set iff that coefficient exceeds the
    median of the block's 63 non-DC coefficients (DC bit stays 0, so
    global brightness never votes)."""
    g = _box_downsample(_luma(img), 32, 32)
    coef = (_DCT32 @ g @ _DCT32.T)[:8, :8].ravel()
    med = float(np.median(coef[1:]))
    bits = coef > med
    bits[0] = False
    return _pack64(bits)


def image_hashes(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, dhash, phash, decode_ok) per image payload via the
    Arrow-batched decode lane (the one legitimate Python stage — no JVM
    image codec exists); corrupt/unsupported payloads quarantine to
    NULL hashes with ``decode_ok = false`` instead of failing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            dh: list[int | None] = []
            ph: list[int | None] = []
            ok: list[bool] = []
            for p in batch[payload_col]:
                img = None
                if p is not None:
                    try:
                        img = _decode_any_image(bytes(p))
                    except ValueError:
                        img = None
                if img is None:
                    dh.append(None)
                    ph.append(None)
                    ok.append(False)
                else:
                    dh.append(dhash64(img))
                    ph.append(phash64(img))
                    ok.append(True)
            yield pd.DataFrame(
                {
                    id_col: batch[id_col],
                    "dhash": pd.array(dh, dtype="Int64"),
                    "phash": pd.array(ph, dtype="Int64"),
                    "decode_ok": ok,
                }
            )

    # the id column keeps ITS OWN type (string URIs are ids too) — a
    # hard-coded bigint would Arrow-crash the first non-integer batch
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, dhash bigint, phash bigint, decode_ok boolean",
    )


def image_dup_pairs(
    df: DataFrame,
    hash_col: str = "dhash",
    max_hamming: int = 6,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image near-duplicate pairs: decode+hash once (quarantined
    payloads drop out), then the banded hamming join.  One Python
    decode pass + linear shuffles — the image twin of
    :func:`..operators.dedup.simhash_pairs`.

    The signature frame feeds BOTH sides of the band self-join; Spark
    has no cross-branch CSE, so without the localCheckpoint the
    expensive Python decode would execute twice (the multi-consumer
    discipline from duplicate_clusters).  LAZY checkpoint: it
    materializes at the first action and is reused after, without
    running a full decode job as a plan-construction side effect
    (the registry plan linter explains 138 query plans without
    executing them)."""
    sig = (
        image_hashes(df, id_col=id_col, payload_col=payload_col)
        .filter(F.col("decode_ok"))
        .localCheckpoint(eager=False)
    )
    return hamming_pairs(sig, hash_col, id_col=id_col, bits=64, max_hamming=max_hamming)


def image_hash_pairs_allpairs(
    sig: DataFrame,
    hash_col: str,
    id_col: str = "media_id",
    max_hamming: int = 6,
) -> DataFrame:
    """|images|^2 TEST ORACLE for banded recall — crossJoin, never a
    production path (same contract as ``dedup.simhash_pairs_allpairs``)."""
    a = sig.select(F.col(id_col).alias("id1"), F.col(hash_col).alias("h1"))
    b = sig.select(F.col(id_col).alias("id2"), F.col(hash_col).alias("h2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
