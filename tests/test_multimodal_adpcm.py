"""IMA-ADPCM (4-bit compressed WAV) codec: faithful lossy roundtrip
(SNR floor + exact decoder-mirror identity), stereo interleave, block
boundaries, fact-chunk truncation, quarantine cases, and the audio
feature lane taking the real decode where stdlib wave refuses."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.adpcm import (
    AdpcmFormatError,
    decode_ima_adpcm_wav,
    encode_ima_adpcm_wav,
)

RATE = 16000
T = np.arange(RATE) / RATE
SINE = (np.sin(2 * np.pi * 440 * T) * 12000).astype(np.int16)


def test_roundtrip_snr_and_exact_length():
    enc = encode_ima_adpcm_wav(SINE, RATE, block_align=256)
    dec, rate = decode_ima_adpcm_wav(enc)
    assert rate == RATE
    assert len(dec) == len(SINE)  # fact chunk truncates block padding
    err = dec.astype(np.float64) - SINE.astype(np.float64)
    snr = 10 * np.log10((SINE.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 25, f"ADPCM roundtrip SNR {snr:.1f} dB"
    # and it actually compresses ~4x vs 16-bit PCM
    assert len(enc) < SINE.nbytes / 3
    # stdlib wave cannot read what we just decoded
    with pytest.raises(wave.Error):
        wave.open(io.BytesIO(enc))


def test_decode_mirror_identity_across_blocks():
    """The encoder reconstructs with the same update as the decoder, so
    re-encoding the DECODED signal is a fixed point (exact identity) —
    the strongest self-consistency a lossy codec can state in-repo."""
    enc = encode_ima_adpcm_wav(SINE, RATE, block_align=64)  # many blocks
    dec, _ = decode_ima_adpcm_wav(enc)
    enc2 = encode_ima_adpcm_wav(dec, RATE, block_align=64)
    dec2, _ = decode_ima_adpcm_wav(enc2)
    assert (dec2 == dec).all()


def test_stereo_interleave_decodes_per_channel():
    """Hand-built 2-channel stream: constant-zero nibbles keep each
    channel at its header predictor, proving the 4-byte word interleave
    is routed to the right channel."""
    align = 16  # per channel: 4 hdr + one 4-byte nibble group
    fmt = struct.pack("<HHIIHHHH", 0x0011, 2, 8000, 8000, align, 4, 2, 9)
    block = (
        struct.pack("<hBB", 1000, 0, 0)   # L header
        + struct.pack("<hBB", -2000, 0, 0)  # R header
        + b"\x00" * 8                      # 8 L nibbles then 8 R nibbles
    )
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    dec, rate = decode_ima_adpcm_wav(payload)
    assert dec.shape == (9, 2) and rate == 8000
    assert dec[0, 0] == 1000 and dec[0, 1] == -2000
    # zero nibbles decay toward the predictor with tiny +step/8 drift
    assert abs(int(dec[-1, 0]) - 1000) < 32
    assert abs(int(dec[-1, 1]) + 2000) < 32


def test_quarantine_cases():
    with pytest.raises(AdpcmFormatError):
        decode_ima_adpcm_wav(b"not riff at all")
    # PCM payloads are NOT ours (the PCM path owns them)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(SINE[:100].tobytes())
    with pytest.raises(AdpcmFormatError, match="not IMA ADPCM"):
        decode_ima_adpcm_wav(buf.getvalue())
    # corrupt step index
    enc = bytearray(encode_ima_adpcm_wav(SINE[:500], RATE, block_align=64))
    i = enc.index(b"data") + 8
    enc[i + 2] = 200  # step index byte
    with pytest.raises(AdpcmFormatError, match="step index"):
        decode_ima_adpcm_wav(bytes(enc))


def test_audio_feature_lane_takes_real_adpcm_decode(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        decode_audio_features,
    )

    enc = encode_ima_adpcm_wav(SINE, RATE)
    df = spark.createDataFrame(
        [(1, bytearray(enc), {"kind": "audio"})],
        "media_id long, payload binary, meta map<string,string>",
    )
    row = decode_audio_features(df).collect()[0]
    feats = row["features"]
    assert feats is not None
    assert feats[1] == RATE           # sample_rate feature
    assert abs(feats[0] - 1.0) < 0.01  # duration ~1s
