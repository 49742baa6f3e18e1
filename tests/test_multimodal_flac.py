"""FLAC lossless codec: exact roundtrips through the in-repo encoder,
hand-built single-frame fixtures for the decoder-only surface (LPC,
mid/side, Rice escapes, wasted bits), and the Spark audio-feature
path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.flac import (
    FlacFormatError,
    _BitWriter,
    _crc8,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def test_roundtrip_exact_mono_and_stereo():
    rng = np.random.default_rng(11)
    t = np.arange(9000)
    mono = (3000 * np.sin(t / 30) + rng.normal(0, 200, len(t))).astype(np.int16)
    dec, rate, bps = decode_flac(encode_flac(mono, 16000))
    assert rate == 16000 and bps == 16
    assert np.array_equal(dec[:, 0], mono.astype(np.int32))  # LOSSLESS

    st = np.stack(
        [np.full(5000, 123, np.int16), (1000 * np.sin(t[:5000] / 15)).astype(np.int16)],
        axis=1,
    )
    d2, r2, _ = decode_flac(encode_flac(st, 44100))
    assert r2 == 44100 and np.array_equal(d2, st.astype(np.int32))


def test_compression_is_real():
    t = np.arange(20000)
    x = (5000 * np.sin(t / 40)).astype(np.int16)  # smooth: predicts well
    payload = encode_flac(x)
    assert len(payload) < 0.6 * x.nbytes  # genuinely smaller than PCM


def test_empty_and_errors():
    dec, _rate, _ = decode_flac(encode_flac(np.zeros(0, np.int16)))
    assert dec.shape == (0, 1)
    with pytest.raises(FlacFormatError):
        decode_flac(b"fLaX" + b"\x00" * 40)
    with pytest.raises(FlacFormatError):
        decode_flac(encode_flac(np.ones(100, np.int16))[:30])
    with pytest.raises(ValueError):
        encode_flac(np.zeros(4, np.float64))  # wrong dtype


# --- hand-built frames for the decoder-only surface ------------------------


def _stream(nch, bps, bs, chan_code, write_subframes, rate=8000):
    """One-frame FLAC stream with caller-written subframe bits."""
    streaminfo = (
        struct.pack(">HH", bs, bs)
        + b"\x00\x00\x00" * 2
        + ((rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | bs).to_bytes(8, "big")
        + b"\x00" * 16
    )
    head = bytearray(b"\xff\xf8")
    head.append((0b0111 << 4) | 0b0000)
    bps_code = {8: 0b001, 16: 0b100, 12: 0b010}[bps]
    head.append((chan_code << 4) | (bps_code << 1))
    head += _utf8_number(0)
    head += struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    w = _BitWriter()
    write_subframes(w)
    frame = bytes(head) + w.flush() + b"\x00\x00"  # crc16 unverified
    return (
        b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo + frame
    )


def _verbatim(w, vals, bps):
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)
    for v in vals:
        w.write(int(v) & ((1 << bps) - 1), bps)


def test_decoder_lpc_subframe():
    """LPC: s[i] = (c*s[i-1]) >> shift + res[i], order 1."""
    bps, bs, c, shift = 16, 6, 3, 1
    warm, res = [100], [5, -3, 7, 0, -20]
    want = [100]
    for r in res:
        want.append(((c * want[-1]) >> shift) + r)

    def sub(w):
        w.write(0, 1)
        w.write(32, 6)  # LPC order 1 (100000 | order-1)
        w.write(0, 1)
        w.write(warm[0] & 0xFFFF, bps)
        w.write(4 - 1, 4)  # precision 4
        w.write(shift, 5)
        w.write(c, 4)
        # residual: rice method 0, po 0, param 6
        w.write(0, 2)
        w.write(0, 4)
        w.write(6, 4)
        for r in res:
            u = (r << 1) if r >= 0 else (-(r << 1) - 1)
            w.unary(u >> 6)
            w.write(u & 63, 6)

    dec, _rate, _ = decode_flac(_stream(1, bps, bs, 0, sub))
    assert dec[:, 0].tolist() == want


def test_decoder_mid_side_and_left_side():
    l = np.array([100, -50, 7, 301], dtype=np.int64)
    r = np.array([90, -60, 8, 299], dtype=np.int64)
    bps, bs = 16, 4

    mid, side = (l + r) >> 1, l - r

    def sub_ms(w):
        _verbatim(w, mid, bps)
        _verbatim(w, side, bps + 1)

    dec, _, _ = decode_flac(_stream(2, bps, bs, 10, sub_ms))
    assert np.array_equal(dec[:, 0], l) and np.array_equal(dec[:, 1], r)

    def sub_ls(w):
        _verbatim(w, l, bps)
        _verbatim(w, l - r, bps + 1)

    dec, _, _ = decode_flac(_stream(2, bps, bs, 8, sub_ls))
    assert np.array_equal(dec[:, 0], l) and np.array_equal(dec[:, 1], r)

    def sub_rs(w):
        _verbatim(w, l - r, bps + 1)
        _verbatim(w, r, bps)

    dec, _, _ = decode_flac(_stream(2, bps, bs, 9, sub_rs))
    assert np.array_equal(dec[:, 0], l) and np.array_equal(dec[:, 1], r)


def test_decoder_rice2_escape_and_partitions():
    """Rice2 (5-bit params) with a raw-bits escape partition, partition
    order 1 (two partitions), FIXED order 0."""
    bps, bs = 16, 8
    vals = [3, -4, 15, -16, 7, -8, 1, 0]

    def sub(w):
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(1, 2)  # method 1: rice2
        w.write(1, 4)  # partition order 1 -> 2 partitions of 4
        w.write(31, 5)  # partition 1: escape
        w.write(6, 5)  # raw 6 bits
        for v in vals[:4]:
            w.write(v & 63, 6)
        w.write(2, 5)  # partition 2: rice param 2
        for v in vals[4:]:
            u = (v << 1) if v >= 0 else (-(v << 1) - 1)
            w.unary(u >> 2)
            w.write(u & 3, 2)

    dec, _, _ = decode_flac(_stream(1, bps, bs, 0, sub))
    assert dec[:, 0].tolist() == vals


def test_decoder_wasted_bits():
    """wasted_bits=1: samples stored >>1 and shifted back on decode."""
    bps, bs = 16, 4
    stored = [10, -20, 30, -40]

    def sub(w):
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(1, 1)  # wasted flag
        w.unary(0)  # k-1 = 0 -> k = 1
        for v in stored:
            w.write(v & 0x7FFF, bps - 1)

    dec, _, _ = decode_flac(_stream(1, bps, bs, 0, sub))
    assert dec[:, 0].tolist() == [v << 1 for v in stored]


def test_spark_audio_features_flac(spark):
    """FLAC payloads ride the same Arrow-batched feature path as WAV;
    corrupt FLAC quarantines to null features."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_audio_features,
    )

    t = np.arange(8000)
    x = (8000 * np.sin(t / 20)).astype(np.int16)
    good = encode_flac(x, 16000)
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(good), ("audio/flac", 0, 0, 500)),
            (2, "audio", bytearray(b"fLaC" + b"\x01" * 20), ("audio/flac", 0, 0, 0)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r["features"] for r in decode_audio_features(df).collect()}
    assert rows[2] is None  # quarantined, not a task failure
    feats = rows[1]
    assert feats is not None
    assert abs(feats[0] - 0.5) < 1e-6  # duration_s = 8000/16000
    assert feats[1] == 16000.0 and feats[2] == 8000.0
    want_rms = float(np.sqrt(np.mean((x / 32768.0) ** 2)))
    assert abs(feats[3] - want_rms) < 1e-6
