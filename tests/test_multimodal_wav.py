"""Real end-to-end audio modality: stdlib-encoded WAV bytes decoded
through the Arrow-batched ``mapInPandas`` pipeline, features verified
against NumPy computed on the source signal."""

from __future__ import annotations

import io
import math
import wave

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal import (
    MEDIA_SCHEMA,
    PRODUCTION_DECODERS,
    decode_audio_features,
    decode_wav,
)


def _wav_bytes(samples: np.ndarray, rate: int = 8000, width: int = 2, n_ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            data = (np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        else:
            scale = 2 ** (8 * width - 1) - 1
            dt = {2: "<i2", 4: "<i4"}[width]
            data = (np.clip(samples, -1, 1) * scale).astype(dt).tobytes()
        w.writeframes(data)
    return buf.getvalue()


def test_production_decoder_flag():
    assert PRODUCTION_DECODERS["audio"] is True


def test_decode_wav_roundtrip_exact():
    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * math.pi * 440 * t)
    x, rate = decode_wav(_wav_bytes(sig, rate=8000, width=2))
    assert rate == 8000 and len(x) == 800
    # 16-bit quantization error bound
    assert np.max(np.abs(x - sig)) < 1.5 / 32767

    # stereo averages to mono
    buf = _wav_bytes(sig, width=2)  # mono baseline
    x2, _ = decode_wav(_wav_bytes(np.column_stack([sig, sig]).ravel(), n_ch=2))
    assert np.allclose(x2, decode_wav(buf)[0], atol=1e-9)

    with pytest.raises((wave.Error, EOFError, ValueError)):
        decode_wav(b"not a wav file at all")


def test_audio_features_end_to_end(spark):
    t = np.arange(1600) / 8000.0
    sine = 0.25 * np.sin(2 * math.pi * 220 * t)
    silence = np.zeros(400)
    rows = [
        (1, "audio", _wav_bytes(sine, rate=8000), ("audio/wav", None, None, 200)),
        (2, "audio", _wav_bytes(silence, rate=8000), ("audio/wav", None, None, 50)),
        (3, "audio", b"corrupt-bytes", ("audio/wav", None, None, None)),
        (4, "audio", None, ("audio/wav", None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in decode_audio_features(df).collect()}

    dur, rate, n, rms, peak, zcr, mean, amean = feats[1]
    assert dur == pytest.approx(0.2) and rate == 8000.0 and n == 1600.0
    assert rms == pytest.approx(0.25 / math.sqrt(2), rel=1e-3)
    assert peak == pytest.approx(0.25, rel=1e-3)
    assert zcr == pytest.approx(2 * 220 * 0.2 / 1600, rel=0.1)
    assert abs(mean) < 1e-3 and amean == pytest.approx(0.25 * 2 / math.pi, rel=1e-2)

    assert feats[2][3] == 0.0 and feats[2][4] == 0.0  # silence: rms = peak = 0
    assert feats[3] is None and feats[4] is None  # quarantined, not a job abort
