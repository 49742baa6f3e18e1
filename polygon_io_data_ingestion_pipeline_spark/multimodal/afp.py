"""Perceptual audio fingerprinting + hamming-banded audio near-dup pairs.

The audio twin of :mod:`.phash` (round-10's image work): a crawled
corpus carrying audio payloads near-dedups the way its text and images
do — re-encoded (FLAC/ADPCM), re-scaled or lightly-edited copies of one
clip collapse to one representative.  The reference pipeline has no
media handling at all; this closes the last decoded modality that could
not dedup.

The fingerprint is a whole-clip Haitsma–Kalker-style spectral
band-energy hash over the REAL decode lane
(:func:`..multimodal.binaryops._audio_samples` — WAV PCM, IMA-ADPCM and
lossless FLAC all land in the same mono float stream):

1. split the clip into ``n_seg = 9`` equal time segments,
2. per segment, FFT -> power spectrum, DC dropped,
3. pool the spectrum into ``n_bands = 9`` contiguous bands with integer
   edges ``(b * n_bins) // n_bands`` (deterministic, SQL-replicable),
4. bit ``(t, b)`` of the 8x8 = 64-bit fingerprint is the classic HK
   sign: ``(E[t+1][b] - E[t+1][b+1]) - (E[t][b] - E[t][b+1]) > 0`` —
   the time-derivative of the frequency-derivative of band energy.

Sign bits of energy DIFFERENCES are what makes the hash perceptual:
uniform amplitude scaling multiplies every energy (so every difference)
by the same positive factor and flips NOTHING — volume-normalized
re-encodes collapse exactly; small local edits flip only the bits whose
segments they touch, so near-dups stay within a small hamming radius
while distinct clips differ on ~half the bits.

Candidate pairs come from :func:`..operators.dedup.hamming_pairs` — the
same pigeonhole banded equi-join SimHash text dedup and image pHash
dedup ride — so the production path is NEVER all-pairs: shuffle volume
stays linear in the number of clips at 100 TB.
``audio_fp_pairs_allpairs`` exists only as the explicitly-quadratic
recall oracle for tests, exactly like ``phash.image_hash_pairs_allpairs``.

The registry query ``audio_fp_dup_pairs`` pushes deterministic
md5-derived int16 WAV payloads through the REAL decode->FFT->bands->HK
path and its DuckDB oracle re-derives the samples, restates the DFT
band energies (naive Goertzel-style sums — an independent numerical
path from numpy's FFT butterflies) and verifies pairs ALL-PAIRS; sign
decisions sit ~9 orders of magnitude above the engines' float rounding
difference, so the hash match certifies the fingerprint math itself.
"""

from __future__ import annotations

import wave as _wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import hamming_pairs

#: fingerprint geometry: 9 time segments x 9 bands -> 8x8 HK sign bits
N_SEG = 9
N_BANDS = 9


def band_energies(
    x: np.ndarray, n_seg: int = N_SEG, n_bands: int = N_BANDS
) -> np.ndarray:
    """``(n_seg, n_bands)`` spectral band-energy matrix of a mono
    signal: per-segment FFT power (DC dropped) pooled into contiguous
    bands with integer edges — the deterministic grid both the Spark
    side and the SQL oracle agree on.  Raises ``ValueError`` when the
    clip is too short to carve ``n_seg`` segments with at least 2
    samples each (no spectrum to band)."""
    n = len(x) // n_seg
    if n < 2:
        raise ValueError(
            f"clip too short for fingerprinting: {len(x)} samples < {2 * n_seg}"
        )
    spec = np.fft.rfft(np.asarray(x[: n_seg * n], dtype=np.float64).reshape(n_seg, n), axis=1)
    mag2 = (spec.real**2 + spec.imag**2)[:, 1:]  # drop DC: loudness offset
    nb = mag2.shape[1]
    edges = [(b * nb) // n_bands for b in range(n_bands + 1)]
    if any(edges[b] == edges[b + 1] for b in range(n_bands)):
        raise ValueError(f"clip too short for {n_bands} bands: {nb} bins")
    return np.array(
        [
            [mag2[t, edges[b] : edges[b + 1]].sum() for b in range(n_bands)]
            for t in range(n_seg)
        ]
    )


def afp64(x: np.ndarray) -> int:
    """64-bit whole-clip audio fingerprint (see module docstring): bit
    ``t*8 + b`` is the Haitsma–Kalker sign of the (time, frequency)
    second difference of band energy.  Signed 64-bit integer — the
    storage form a Spark/parquet BIGINT carries (same packing contract
    as ``phash._pack64``)."""
    E = band_energies(x)
    v = 0
    for t in range(N_SEG - 1):
        for b in range(N_BANDS - 1):
            d = (E[t + 1, b] - E[t + 1, b + 1]) - (E[t, b] - E[t, b + 1])
            if d > 0:
                v |= 1 << (t * (N_BANDS - 1) + b)
    return v - (1 << 64) if v >= 1 << 63 else v


def encode_wav_int16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV bytes from integer samples — the fixture/
    test encoder (stdlib ``wave``), exact inverse of ``decode_wav`` up
    to the 1/32768 scale."""
    import io

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            np.asarray(samples, dtype=np.int16).astype("<i2").tobytes()
        )
    return buf.getvalue()


def audio_fingerprints(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, afp, decode_ok) per audio payload via the Arrow-batched
    decode lane (the one legitimate Python stage — no JVM audio codec
    exists); corrupt/unsupported/too-short payloads quarantine to NULL
    fingerprints with ``decode_ok = false`` instead of failing the job
    (at 100 TB some bytes are always corrupt)."""
    from .binaryops import _audio_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            fps: list[int | None] = []
            ok: list[bool] = []
            for p in batch[payload_col]:
                fp = None
                if p is not None:
                    try:
                        x, _rate = _audio_samples(bytes(p))
                        fp = afp64(x)
                    except (ValueError, EOFError, _wave.Error, RuntimeError):
                        # RuntimeError: stdlib wave's Chunk.skip() raises
                        # it BARE on a corrupted chunk-size field — one
                        # such clip must quarantine, not kill the job
                        fp = None
                fps.append(fp)
                ok.append(fp is not None)
            yield pd.DataFrame(
                {
                    id_col: batch[id_col],
                    "afp": pd.array(fps, dtype="Int64"),
                    "decode_ok": ok,
                }
            )

    # the id column keeps ITS OWN type (string URIs are ids too) — a
    # hard-coded bigint would Arrow-crash the first non-integer batch
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, afp bigint, decode_ok boolean"
    )


def audio_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio near-duplicate pairs: decode+fingerprint once (quarantined
    payloads drop out), then the banded hamming join.  One Python
    decode pass + linear shuffles — the audio twin of
    :func:`..multimodal.phash.image_dup_pairs`.

    LAZY localCheckpoint on the fingerprint frame: it feeds BOTH sides
    of the band self-join and Spark has no cross-branch CSE — without
    it the expensive Python decode would execute twice; lazy so plan
    construction (the registry plan linter explains every plan without
    executing) does not run a decode job as a side effect."""
    sig = (
        audio_fingerprints(df, id_col=id_col, payload_col=payload_col)
        .filter(F.col("decode_ok"))
        .localCheckpoint(eager=False)
    )
    return hamming_pairs(sig, "afp", id_col=id_col, bits=64, max_hamming=max_hamming)


def audio_fp_pairs_allpairs(
    sig: DataFrame, id_col: str = "media_id", max_hamming: int = 6
) -> DataFrame:
    """|clips|^2 TEST ORACLE for banded recall — crossJoin, never a
    production path (same contract as ``phash.image_hash_pairs_allpairs``)."""
    a = sig.select(F.col(id_col).alias("id1"), F.col("afp").alias("h1"))
    b = sig.select(F.col(id_col).alias("id2"), F.col("afp").alias("h2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
