"""Baseline JFIF codec on REAL bytes: roundtrip fidelity, marker
structure, self-describing tables, unsupported-variant rejection, and
the Spark feature/resize integration."""

from __future__ import annotations

import numpy as np
import pytest

from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import (
    JpegFormatError,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h, w):
    x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 255, h)[:, None]
    return (x / 2).astype(np.uint8)


def test_color_roundtrip_high_fidelity():
    g = _gradient(64, 64)
    img = np.stack([g, 255 - g, np.roll(g, 8, axis=0)], axis=-1)
    enc = encode_jpeg(img, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(dec, img) > 38


def test_gray_roundtrip_odd_dimensions():
    img = _gradient(50, 47)  # not multiples of 8: pad-and-crop path
    dec = decode_jpeg(encode_jpeg(img, quality=75))
    assert dec.shape == (50, 47)
    assert _psnr(dec, img) > 35


def test_quality_100_near_lossless_on_noise():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    # all-ones quant tables: worst case error is DCT float rounding
    assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 1


def test_quality_trades_size_for_fidelity():
    # Smooth channels (no wrap-around edges: a 255->0 jump rings at any
    # quality and flattens the PSNR curve — real JPEG behavior).
    g = _gradient(64, 64)
    img = np.stack([g, 255 - g, g.T], axis=-1)
    lo, hi = encode_jpeg(img, quality=20), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(decode_jpeg(hi), img) > _psnr(decode_jpeg(lo), img)


def test_tables_are_read_from_stream_not_assumed():
    # Patch one DQT entry in the encoded bytes; the decoder must honor
    # the modified table (self-describing format), changing the output.
    img = _gradient(16, 16)
    enc = bytearray(encode_jpeg(img, quality=90))
    dqt = enc.find(b"\xff\xdb")
    assert dqt > 0
    base = decode_jpeg(bytes(enc))
    enc[dqt + 5] = 255  # first quant value (DC) -> 255
    patched = decode_jpeg(bytes(enc))
    assert not np.array_equal(base, patched)


def test_unsupported_and_corrupt_rejected():
    img = _gradient(16, 16)
    enc = bytearray(encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9  # arithmetic coding: still quarantined
    with pytest.raises(JpegFormatError):
        decode_jpeg(bytes(enc))
    enc[sof + 1] = 0xC2  # progressive frame with a BASELINE scan header
    with pytest.raises(JpegFormatError):  # malformed, not silently wrong
        decode_jpeg(bytes(enc))
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\xff\xd8\xff\xdb\x00\x05trunc")
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"not a jpeg at all")
    # entropy truncation
    full = encode_jpeg(img)
    with pytest.raises(JpegFormatError):
        decode_jpeg(full[: len(full) // 2])


def test_spark_image_features_use_real_jpeg_decode(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_image_features,
    )

    img = _gradient(24, 24)
    payload = encode_jpeg(img, quality=90)
    rows = [
        (1, "image", bytearray(payload), {"mime": "image/jpeg", "width": 24, "height": 24, "duration_ms": None}),
        (2, "image", bytearray(b"\xff\xd8corrupt"), {"mime": "image/jpeg", "width": 0, "height": 0, "duration_ms": None}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r["features"] for r in decode_image_features(df).collect()}
    # Real decode: geometry features are the actual image dimensions.
    assert out[1][0] == 24.0 and out[1][1] == 24.0 and out[1][2] == 1.0
    assert abs(out[1][3] - float(img.mean())) < 3.0  # mean within JPEG loss
    # Corrupt payload quarantines to null, not a task failure.
    assert out[2] is None


def test_spark_resize_reencodes_valid_jpeg(spark):
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        resize_images,
    )

    g = _gradient(32, 32)
    img = np.stack([g, g, g], axis=-1)
    rows = [(1, "image", bytearray(encode_jpeg(img)), {"mime": "image/jpeg", "width": 32, "height": 32, "duration_ms": None})]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(df, width=16, height=8).collect()[0]
    resized = decode_jpeg(bytes(out["payload"]))
    assert resized.shape == (8, 16, 3)
    assert out["meta"]["width"] == 16 and out["meta"]["height"] == 8


def test_high_frequency_content_dequantizes_correctly():
    """Regression: the decoder dequantized through the wrong
    permutation (q[UNZIGZAG] instead of q in natural order), which
    gradients and all-ones q100 tables cannot see — a mid-frequency
    sine pattern can. With the correct table the roundtrip error at
    quality 90 stays tight; the permuted form measured ~10x worse."""
    import numpy as np

    y, x = np.mgrid[0:64, 0:64]
    img = (127.5 + 100.0 * np.sin(x * 0.7) * np.cos(y * 0.5)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(dec.astype(np.int32) - img.astype(np.int32))
    assert err.max() <= 8 and err.mean() <= 1.5


def test_truncated_dqt_raises_the_quarantine_type():
    """A short DQT body hits numpy shape-mismatch (ValueError); the
    decoder must convert it to JpegFormatError, not leak a raw
    ValueError past the documented single-quarantine-type contract."""
    import numpy as np
    import pytest

    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import JpegFormatError

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
    enc = bytearray(encode_jpeg(img, quality=90))
    dqt = enc.find(b"\xff\xdb")
    assert dqt > 0
    # Shrink the declared DQT segment length so the table body is short.
    seg_len = int.from_bytes(enc[dqt + 2 : dqt + 4], "big")
    truncated = enc[: dqt + 4] + enc[dqt + 4 : dqt + 2 + seg_len - 10] + enc[dqt + 2 + seg_len :]
    truncated[dqt + 2 : dqt + 4] = (seg_len - 10).to_bytes(2, "big")
    with pytest.raises(JpegFormatError):
        decode_jpeg(bytes(truncated))


def _color_scene(h, w, seed=3):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    img = np.stack(
        [np.add.outer(y, x) / 2, np.tile(x, (h, 1)), np.tile(y[:, None], (1, w))],
        axis=-1,
    )
    return np.clip(img + rng.integers(-8, 8, img.shape), 0, 255).astype(np.uint8)


def test_chroma_subsampled_roundtrips_meet_psnr_floor():
    """4:2:0 (the real-world majority sampling) and 4:2:2 now DECODE
    instead of quarantining; roundtrip fidelity floors are pinned, and
    file size must fall as chroma resolution drops."""
    img = _color_scene(61, 97)  # odd dims stress every crop/upsample path
    sizes = {}
    for sub, floor in (("4:4:4", 33.0), ("4:2:2", 32.0), ("4:2:0", 31.0)):
        enc = encode_jpeg(img, quality=90, subsampling=sub)
        out = decode_jpeg(enc)
        assert out.shape == img.shape
        assert _psnr(img, out) >= floor, sub
        sizes[sub] = len(enc)
    assert sizes["4:2:0"] < sizes["4:2:2"] < sizes["4:4:4"]


def test_subsampled_sof_declares_factors_and_decoder_honors_them():
    img = _color_scene(32, 32)
    enc = encode_jpeg(img, quality=90, subsampling="4:2:0")
    sof = enc.find(b"\xff\xc0")
    assert enc[sof + 11] == 0x22  # luma 2x2
    assert enc[sof + 14] == 0x11 and enc[sof + 17] == 0x11  # chroma 1x1
    assert decode_jpeg(enc).shape == (32, 32, 3)


def test_grayscale_with_declared_factors_is_non_interleaved():
    """A single-component scan ignores sampling factors (spec B.2.3):
    patching the SOF to claim 2x2 must not change the decode."""
    img = _gradient(24, 16)
    enc = bytearray(encode_jpeg(img, quality=95))
    base = decode_jpeg(bytes(enc))
    sof = enc.find(b"\xff\xc0")
    assert enc[sof + 11] == 0x11
    enc[sof + 11] = 0x22
    assert np.array_equal(decode_jpeg(bytes(enc)), base)


def test_invalid_sampling_factors_still_quarantine():
    img = _color_scene(16, 16)
    enc = bytearray(encode_jpeg(img, quality=90, subsampling="4:2:0"))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 14] = 0x33  # chroma 3x3 does not divide luma's 2x2 maxima
    with pytest.raises(JpegFormatError, match="non-integer upsampling"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="subsampling must be"):
        encode_jpeg(img, subsampling="4:1:0")


def test_subsampled_decode_interops_with_spark_features(spark):
    """The mapInPandas image feature path must accept 4:2:0 payloads
    end-to-end (geometry features = true dims, quarantine unchanged)."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_image_features,
    )

    img = _color_scene(40, 56)
    payload = encode_jpeg(img, quality=90, subsampling="4:2:0")
    rows = [
        (1, "image", bytearray(payload), {"mime": "image/jpeg", "width": 56, "height": 40, "duration_ms": None}),
        (2, "image", bytearray(b"\xff\xd8junk"), {"mime": "image/jpeg", "width": 0, "height": 0, "duration_ms": None}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r["features"] for r in decode_image_features(df).collect()}
    assert out[1][0] == 56.0 and out[1][1] == 40.0 and out[1][2] == 3.0
    assert abs(out[1][3] - float(img.mean())) < 3.0
    assert out[2] is None  # junk still quarantines


def _lowfreq(rng, shape):
    """JPEG-friendly low-frequency content plus mild noise."""
    ch, cw = -(-shape[0] // 8), -(-shape[1] // 8)
    cell = (ch, cw) if len(shape) == 2 else (ch, cw, shape[2])
    rep = (8, 8) if len(shape) == 2 else (8, 8, 1)
    base = np.kron(rng.integers(0, 240, cell, dtype=np.uint8), np.ones(rep, np.uint8))
    img = base[: shape[0], : shape[1]]
    return (img + rng.integers(0, 16, shape, dtype=np.uint8)).astype(np.uint8)


def test_progressive_decode_matches_baseline_exactly():
    """SOF2 spectral-selection + successive-approximation scans carry
    the SAME quantized coefficients as the baseline stream, so decoding
    both must give IDENTICAL pixels — gray, RGB, odd dims, and both
    chroma subsamplings."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    cases = [
        ((16, 16), "4:4:4"),
        ((29, 13), "4:4:4"),
        ((32, 24, 3), "4:4:4"),
        ((21, 19, 3), "4:2:0"),
        ((24, 18, 3), "4:2:2"),
    ]
    for shape, sub in cases:
        img = _lowfreq(rng, shape)
        base = decode_jpeg(encode_jpeg(img, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_roundtrip_meets_psnr_floor():
    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(37)
    img = _lowfreq(rng, (40, 56, 3))
    out = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert _psnr(img, out) > 30.0


def test_progressive_multiblock_eob_runs_hand_fixture():
    """EOBn with r > 0 (a run covering several blocks) in both the
    first and the refinement AC scans — our encoder flushes per block
    (EOB0 only), so this path is pinned by a hand-assembled stream
    against pixels computed straight from the coefficient math."""
    import struct as _struct

    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import (
        _BitWriter,
        _C,
        UNZIGZAG,
    )

    h, w = 8, 32  # four 8x8 blocks in one row, grayscale
    # DC table: symbols 0..5 at length 3; AC table: the symbols we emit
    dc_vals = [0, 1, 2, 3, 4, 5]
    dc_bits = [0, 0, 6] + [0] * 13
    ac_vals = [0x00, 0x01, 0x02, 0x10, 0x20, 0x31, 0xF0]
    ac_bits = [0, 0, 7] + [0] * 13

    def codes(bits, vals):
        out, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    dc_c, ac_c = codes(dc_bits, dc_vals), codes(ac_bits, ac_vals)

    # scan 1: DC first, Al=0 — DCs 8, 8, 8, 8 (diffs 8,0,0,0)
    s1 = _BitWriter()
    c, ln = dc_c[4]
    s1.write(c, ln)
    s1.write(8, 4)
    for _ in range(3):
        c, ln = dc_c[0]
        s1.write(c, ln)

    # scan 2: AC first (Ss=1, Se=63, Al=1) — block0 zz[1]=4 (t=2),
    # then EOB2 + 2 extension bits of 0 -> eobrun=3 covers blocks 1-3
    s2 = _BitWriter()
    c, ln = ac_c[0x02]
    s2.write(c, ln)
    s2.write(2, 2)  # +2 (decoder shifts <<1 -> 4)
    c, ln = ac_c[0x20]
    s2.write(c, ln)
    s2.write(0, 2)

    # scan 3: AC refine (Ah=1, Al=0) — block0: zz[1] history coef gets
    # correction bit 0; zz[5] newly significant +1 after 3 zero-history
    # skips (symbol 0x31); then EOB covering all 4 remaining block-ends
    # via r=2 (eobrun = 4 + 2 extension bits of 0)
    s3 = _BitWriter()
    c, ln = ac_c[0x31]
    s3.write(c, ln)
    s3.write(1, 1)  # sign: positive
    s3.write(0, 1)  # buffered correction bit for zz[1]
    c, ln = ac_c[0x20]
    s3.write(c, ln)
    s3.write(0, 2)

    def chunk(marker, body):
        return marker + _struct.pack(">H", len(body) + 2) + body

    stream = bytearray(b"\xff\xd8")
    stream += chunk(b"\xff\xdb", bytes([0]) + bytes([1] * 64))  # all-ones quant
    stream += chunk(b"\xff\xc2", _struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    stream += chunk(b"\xff\xc4", bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    stream += chunk(b"\xff\xc4", bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    stream += chunk(b"\xff\xda", bytes([1, 1, 0x00, 0, 0, 0x00])) + s1.flush()
    stream += chunk(b"\xff\xda", bytes([1, 1, 0x00, 1, 63, 0x01])) + s2.flush()
    stream += chunk(b"\xff\xda", bytes([1, 1, 0x00, 1, 63, 0x10])) + s3.flush()
    stream += b"\xff\xd9"

    got = decode_jpeg(bytes(stream))
    assert got.shape == (h, w)

    # expected pixels straight from the coefficient definition
    def block_pixels(zz):
        dez = np.asarray(zz, dtype=np.float64)[UNZIGZAG].reshape(8, 8)
        return np.clip(np.round(_C.T @ dez @ _C + 128.0), 0, 255).astype(np.uint8)

    zz0 = np.zeros(64)
    zz0[0], zz0[1], zz0[5] = 8, 4, 1
    zzr = np.zeros(64)
    zzr[0] = 8
    expected = np.concatenate(
        [block_pixels(zz0)] + [block_pixels(zzr)] * 3, axis=1
    )
    assert np.array_equal(got, expected)


def test_progressive_refine_zrl_with_history_coefficient():
    """AC refine ordering regression: a block whose zigzag band holds a
    16+ zero run, then an ALREADY-significant coefficient (|c|>=2), then
    a NEWLY-significant one (|c|==1) forces the encoder to emit ZRLs at
    the newly-significant position.  The history coefficient's
    correction bit must ride with the symbol whose run passes it — the
    old encoder buffered it before flushing the pending ZRL, which the
    ZRL's 16-position span does not cover, desyncing the stream
    (decoder raised 'AC refine size != 1').  Built from exact quantized
    coefficients so the shape is deterministic."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import (
        _C,
        _quality_scale,
        QUANT_LUMA,
        UNZIGZAG,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    q = _quality_scale(QUANT_LUMA, 85)
    czz = np.zeros(64)
    czz[0] = 4  # DC
    czz[17] = 2  # zigzag 1..16 zero -> run 16, then already-significant
    czz[18] = 1  # newly significant right after: triggers the ZRL flush
    czz[40] = 3  # a later history coefficient exercising the EOB flush
    coef = czz[UNZIGZAG].reshape(8, 8) * q
    block = _C.T @ coef @ _C + 128.0
    assert block.min() >= 0 and block.max() <= 255  # representable
    img = np.round(block).astype(np.uint8)

    out = decode_jpeg(encode_jpeg_progressive(img, quality=85))  # must not raise
    # the module's cross-check contract: progressive and baseline carry
    # IDENTICAL quantized coefficients, so decodes must match exactly —
    # the misplaced correction bit broke this without raising
    base = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.array_equal(out, base)


def test_decode_docstring_matches_quarantine_list():
    """decode_jpeg's raise-clause must track UNSUPPORTED_FEATURES: twice
    (subsampling r6, progressive r7) a feature landed while the
    docstring kept claiming it raises."""
    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import (
        UNSUPPORTED_FEATURES,
        decode_jpeg,
    )

    doc = decode_jpeg.__doc__
    for feat in UNSUPPORTED_FEATURES:
        assert feat in doc, f"quarantined feature {feat!r} missing from docstring"
    for supported in ("progressive", "subsampl"):
        raise_clause = doc[doc.index("Raises") :]
        assert supported not in raise_clause.lower(), (
            f"docstring still claims decode raises on supported {supported!r}"
        )
