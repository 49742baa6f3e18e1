"""Perceptual audio fingerprinting (multimodal/afp.py): hand-checkable
invariances (volume re-level flips zero bits, codec roundtrips), banded
recall vs the all-pairs oracle, quarantine contracts, and the
audiodedup CLI journey."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.afp import (
    afp64,
    audio_dup_pairs,
    audio_fingerprints,
    audio_fp_pairs_allpairs,
    band_energies,
    encode_wav_int16,
)


def _clip(seed: int, n: int = 2048) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-20000, 20000, size=n).astype(np.float64)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_amplitude_scaling_flips_zero_bits():
    """The HK sign bits compare energy DIFFERENCES: uniform volume
    changes scale every difference by the same positive factor, so a
    re-leveled copy fingerprints identically."""
    x = _clip(1)
    assert afp64(x) == afp64(0.25 * x)
    assert afp64(x) == afp64(3.0 * x)


def test_distinct_clips_differ_and_local_edit_is_near():
    x, y = _clip(2), _clip(3)
    assert _ham(afp64(x), afp64(y)) > 12
    # a localized edit (one of 9 segments gets 1/8-amplitude noise)
    # flips only the bits whose segments it touches
    z = x.copy()
    seg = len(x) // 9
    z[4 * seg : 5 * seg] += 0.125 * _clip(99)[4 * seg : 5 * seg]
    assert _ham(afp64(x), afp64(z)) <= 8


def test_flac_roundtrip_is_exact_and_adpcm_is_near():
    """Lossless FLAC re-encode fingerprints identically; lossy IMA-ADPCM
    re-encode stays within a small hamming radius — the dedup property
    the fingerprint exists for."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.adpcm import (
        encode_ima_adpcm_wav,
    )
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        _audio_samples,
    )
    from polygon_io_data_ingestion_pipeline_spark.multimodal.flac import (
        encode_flac,
    )

    # a tonal-ish clip (sum of sines + mild noise), more like real
    # audio than white noise and kinder to the 4-bit ADPCM quantizer
    n = 4096
    t = np.arange(n)
    x16 = np.clip(
        8000 * np.sin(2 * np.pi * t / 50)
        + 4000 * np.sin(2 * np.pi * t / 13)
        + _clip(7, n) * 0.05,
        -32768,
        32767,
    ).astype(np.int16)
    wav = encode_wav_int16(x16)
    xw, _ = _audio_samples(wav)
    fp_wav = afp64(xw)

    flac = encode_flac(x16, sample_rate=8000)
    xf, _ = _audio_samples(flac)
    assert afp64(xf) == fp_wav  # lossless: bit-identical fingerprint

    adpcm = encode_ima_adpcm_wav(x16, rate=8000)
    xa, _ = _audio_samples(adpcm)
    assert _ham(afp64(xa), fp_wav) <= 10  # lossy: near, not equal


def test_band_energy_grid_and_short_clip_contract():
    x = _clip(4, n=9 * 64)
    E = band_energies(x)
    assert E.shape == (9, 9)
    # parseval-ish sanity: band energies are non-negative and nonzero
    assert (E >= 0).all() and E.sum() > 0
    with pytest.raises(ValueError, match="too short"):
        afp64(np.zeros(10))


def test_banded_pairs_equal_allpairs_oracle(spark):
    """The production banded join returns exactly the all-pairs oracle
    pairs over clips built as base + localized perturbations (the
    correlated construction that actually exercises recall)."""
    rows = []
    for base in range(6):
        x = _clip(100 + base)
        rows.append((2 * base, x))
        z = 0.5 * x
        seg = len(x) // 9
        z[3 * seg : 4 * seg] += 0.1 * _clip(200 + base)[3 * seg : 4 * seg]
        rows.append((2 * base + 1, z))
    payloads = [
        (i, bytearray(encode_wav_int16(np.clip(x, -32768, 32767).astype(np.int16))))
        for i, x in rows
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in audio_dup_pairs(df, max_hamming=6).collect()
    }
    sig = audio_fingerprints(df).filter("decode_ok")
    want = {
        (r["id1"], r["id2"], r["hamming"])
        for r in audio_fp_pairs_allpairs(sig, max_hamming=6).collect()
    }
    assert got == want
    # the construction produced at least some sibling pairs
    assert any(i2 == i1 + 1 for i1, i2, _h in got)


def test_quarantine_and_parity_with_local_afp64(spark):
    """Corrupt and too-short payloads quarantine (NULL fp, decode_ok
    false); decodable clips fingerprint exactly as the local function."""
    x16 = np.clip(_clip(5), -32768, 32767).astype(np.int16)
    rows = [
        (1, bytearray(encode_wav_int16(x16))),
        (2, bytearray(b"not audio at all")),
        (3, bytearray(encode_wav_int16(np.zeros(4, dtype=np.int16)))),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: (r["afp"], r["decode_ok"]) for r in audio_fingerprints(df).collect()}
    assert got[1] == (afp64(x16.astype(np.float64) / 32768.0), True)
    assert got[2] == (None, False)
    assert got[3] == (None, False)
    assert got[4] == (None, False)


def test_audiodedup_cli_journey(spark, tmp_path, capsys):
    """End-to-end CLI: media parquet in -> pairs/ + clusters/ out with
    honest accounting (the audio twin of the imagededup journey)."""
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    rows = []
    for base in range(3):
        x = _clip(300 + base)
        rows.append((2 * base, bytearray(encode_wav_int16(
            np.clip(x, -32768, 32767).astype(np.int16)))))
        rows.append((2 * base + 1, bytearray(encode_wav_int16(
            np.clip(0.5 * x, -32768, 32767).astype(np.int16)))))
    rows.append((100, bytearray(b"garbage bytes")))
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "audiodedup", "--src", src, "--out", out, "--master", "local[4]",
    ]) == 0
    msg = capsys.readouterr().out
    assert "clips=7 decoded=6 quarantined=1" in msg
    assert "duplicates_to_drop=3" in msg
    pairs = spark.read.parquet(out + "/pairs").collect()
    assert {(r["id1"], r["id2"]) for r in pairs} >= {(0, 1), (2, 3), (4, 5)}
    cl = {r["media_id"]: r["cluster_id"] for r in
          spark.read.parquet(out + "/clusters").collect()}
    assert cl[1] == cl[0] and cl[3] == cl[2] and cl[5] == cl[4]

    # flag validation is an exit-2, not a Spark job
    assert main([
        "audiodedup", "--src", src, "--out", out, "--max-hamming", "-1",
    ]) == 2


def test_corrupt_chunk_size_wav_quarantines_not_crashes(spark):
    """stdlib wave raises a BARE RuntimeError on a corrupted chunk-size
    field (Chunk.skip) — one such clip must quarantine, not kill the
    job (round-11 review finding)."""
    x16 = np.clip(_clip(9), -32768, 32767).astype(np.int16)
    good = encode_wav_int16(x16)
    # corrupt the fmt chunk's size field to a huge value so the chunk
    # walk runs past EOF
    bad = bytearray(good)
    fmt_at = bad.index(b"fmt ")
    bad[fmt_at + 4 : fmt_at + 8] = (2**31 - 1).to_bytes(4, "little")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytes(bad))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["decode_ok"] for r in audio_fingerprints(df).collect()}
    assert got == {1: True, 2: False}
