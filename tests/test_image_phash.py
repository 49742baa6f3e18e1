"""Perceptual image hashing (dHash / pHash) + hamming-banded near-dup
pairs: hand-computed hash bits, robustness through REAL codec
re-encodes/resizes, banded-join recall vs the quadratic oracle, and the
Spark quarantine/integration path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import encode_pnm
from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import encode_jpeg
from polygon_io_data_ingestion_pipeline_spark.multimodal.phash import (
    _box_downsample,
    dhash64,
    image_dup_pairs,
    image_hash_pairs_allpairs,
    image_hashes,
    phash64,
)


def _rng_img(seed: int, h: int = 64, w: int = 64, rgb: bool = True) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def _smooth_img(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Low-frequency image (block gradient) — the kind of content
    perceptual hashes are meant for; pure noise has no stable
    low-frequency structure to survive recompression."""
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(8, 8)).astype(np.float64)
    rows = (np.arange(h) * 8) // h
    cols = (np.arange(w) * 8) // w
    return coarse[rows][:, cols].astype(np.uint8)


def test_dhash_bits_hand_computed():
    # 9x8 grid: every row strictly increasing -> "left > right" never
    # true -> hash 0; strictly decreasing rows -> all 64 bits set ->
    # signed -1.
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash64(inc) == 0
    dec = inc[:, ::-1].copy()
    assert dhash64(dec) == -1
    # single comparison flipped: row 0, col 0 brighter than col 1 ->
    # bit 0 only
    one = inc.copy()
    one[0, 0] = 99
    assert dhash64(one) == 1


def test_box_downsample_identity_and_means():
    img = np.arange(72, dtype=np.uint8).reshape(8, 9)
    assert np.array_equal(_box_downsample(img, 9, 8), img.astype(np.float64))
    # 4x4 -> 2x2 exact quadrant means
    q = np.array([[0, 2, 10, 12], [4, 6, 14, 16], [100, 102, 110, 112], [104, 106, 114, 116]])
    got = _box_downsample(q.astype(np.float64), 2, 2)
    assert got.tolist() == [[3.0, 13.0], [103.0, 113.0]]
    # upscale path (2x2 -> 4x4) index-samples without error
    up = _box_downsample(np.array([[1.0, 2.0], [3.0, 4.0]]), 4, 4)
    assert up.shape == (4, 4) and up[0, 0] == 1.0 and up[3, 3] == 4.0


def test_hashes_survive_jpeg_recompression_and_resize():
    base = _smooth_img(7)
    rgb = np.stack([base, base, base], axis=2)
    from polygon_io_data_ingestion_pipeline_spark.multimodal.jpeg import decode_jpeg

    recompressed = decode_jpeg(encode_jpeg(rgb, quality=85))
    assert bin((phash64(base) ^ phash64(recompressed)) & ((1 << 64) - 1)).count("1") <= 6
    assert bin((dhash64(base) ^ dhash64(recompressed)) & ((1 << 64) - 1)).count("1") <= 6
    # 2x nearest-neighbor upscale of the same content hashes identically
    doubled = base[np.repeat(np.arange(64), 2)][:, np.repeat(np.arange(64), 2)]
    assert phash64(doubled) == phash64(base)
    # unrelated content is far under both hashes
    other = _smooth_img(8)
    assert bin((phash64(base) ^ phash64(other)) & ((1 << 64) - 1)).count("1") > 12
    assert bin((dhash64(base) ^ dhash64(other)) & ((1 << 64) - 1)).count("1") > 12


def test_phash_dc_bit_never_set_and_brightness_invariance():
    img = _smooth_img(3)
    assert phash64(img) & 1 == 0
    # uniform brightness shift moves every DCT coefficient's DC only:
    # the non-DC block and its median are unchanged
    brighter = np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    # clip can distort saturated pixels; use a headroom image
    safe = (img // 2).astype(np.uint8)
    safer = (safe.astype(np.int64) + 40).astype(np.uint8)
    assert phash64(safer) == phash64(safe)
    del brighter


def test_banded_pairs_equal_allpairs_oracle(spark):
    """Recall proof: the pigeonhole banded join returns EXACTLY the
    quadratic oracle's pairs on a corpus of 10 bases x 3 variants."""
    rows = []
    mid = 0
    for b in range(10):
        base = _smooth_img(100 + b)
        variant = base.copy()
        variant[0, 0] = variant[0, 0] // 2  # one-pixel edit
        jpeg_rt = encode_jpeg(np.stack([base] * 3, axis=2), quality=90)
        for payload in (encode_pnm(base), encode_pnm(variant), jpeg_rt):
            rows.append((mid, bytearray(payload)))
            mid += 1
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sig = image_hashes(df).filter(F.col("decode_ok")).cache()
    for hash_col in ("dhash", "phash"):
        banded = {
            (r["id1"], r["id2"], r["hamming"])
            for r in image_dup_pairs(df, hash_col=hash_col, max_hamming=6).collect()
        }
        allpairs = {
            (r["id1"], r["id2"], r["hamming"])
            for r in image_hash_pairs_allpairs(sig, hash_col, max_hamming=6).collect()
        }
        assert banded == allpairs, hash_col
        # every base's 3 variants must pair up under at least one hash
    phash_pairs = {
        (r["id1"], r["id2"])
        for r in image_dup_pairs(df, hash_col="phash", max_hamming=6).collect()
    }
    for b in range(10):
        ids = (3 * b, 3 * b + 1, 3 * b + 2)
        assert (ids[0], ids[1]) in phash_pairs, f"base {b}: edit variant missed"
    sig.unpersist()


def test_spark_quarantine_and_hash_parity(spark):
    img = _smooth_img(42)
    rows = [
        (1, bytearray(encode_pnm(img))),
        (2, bytearray(b"P5\n4 4\n255\nxx")),  # truncated -> quarantine
        (3, None),
        (4, bytearray(b"BM......")),  # no BMP codec -> quarantine
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in image_hashes(df).collect()}
    assert got[1]["decode_ok"] and got[1]["dhash"] == dhash64(img)
    assert got[1]["phash"] == phash64(img)
    for mid in (2, 3, 4):
        assert not got[mid]["decode_ok"]
        assert got[mid]["dhash"] is None and got[mid]["phash"] is None


def test_signed_packing_roundtrips_through_spark(spark):
    """A hash with bit 63 set must survive the BIGINT column signed."""
    dec = np.tile(np.arange(9, dtype=np.uint8)[::-1] * 10, (8, 1))
    assert dhash64(dec) == -1  # all 64 bits
    df = spark.createDataFrame([(1, bytearray(encode_pnm(dec)))], "media_id long, payload binary")
    [row] = image_hashes(df).collect()
    assert row["dhash"] == -1


def test_imagededup_cli_journey(spark, tmp_path, capsys):
    """imagededup CLI: media parquet -> pairs/ + clusters/ with
    keep/drop accounting; corrupt payloads quarantine, near-dup
    variants cluster to one representative."""
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    rows = []
    mid = 0
    for b in range(4):
        base = _smooth_img(200 + b)
        variant = base.copy()
        variant[0, 0] = variant[0, 0] // 2
        rows.append((mid, bytearray(encode_pnm(base)))); mid += 1
        rows.append((mid, bytearray(encode_pnm(variant)))); mid += 1
    rows.append((mid, bytearray(b"BM......")))  # quarantine
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(src)
    out = str(tmp_path / "imgdedup")
    assert main([
        "imagededup", "--src", src, "--out", out,
        "--hash", "phash", "--master", "local[4]",
    ]) == 0
    text = capsys.readouterr().out
    assert "images=9" in text and "decoded=8" in text and "quarantined=1" in text
    cl = {r["media_id"]: r["cluster_id"]
          for r in spark.read.parquet(out + "/clusters").collect()}
    for b in range(4):
        assert cl[2 * b] == 2 * b and cl[2 * b + 1] == 2 * b  # variant joins its base
    assert "duplicates_to_drop=4" in text
    # bad --max-hamming exits 2 before any Spark work
    assert main([
        "imagededup", "--src", src, "--out", out, "--max-hamming", "-1",
        "--master", "local[4]",
    ]) == 2


def test_string_id_column_supported(spark):
    """Review regression: the id column keeps its own type — string
    URIs must not Arrow-crash against a hard-coded bigint schema."""
    img = _smooth_img(5)
    df = spark.createDataFrame(
        [("s3://bucket/img-1.pnm", bytearray(encode_pnm(img)))],
        "uri string, payload binary",
    )
    [row] = image_hashes(df, id_col="uri").collect()
    assert row["uri"] == "s3://bucket/img-1.pnm"
    assert row["dhash"] == dhash64(img)


def test_hamming_pairs_property_vs_bruteforce(spark):
    """Hypothesis pin on the pigeonhole banding math itself: for ANY
    set of signed 64-bit hashes (sign bit exercised), the banded join
    returns exactly the brute-force pairs at the threshold."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        hamming_pairs,
    )

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    def _signed(v: int) -> int:
        return v - (1 << 64) if v >= 1 << 63 else v

    # CORRELATED hashes: a base plus up to 10 flipped bit positions per
    # variant.  Uniform random 64-bit ints are essentially never within
    # hamming distance 8 of each other (P ~ 1e-11 per pair), so a
    # uniform generator can never exercise the recall side of the
    # pigeonhole claim — the first version of this test stayed green
    # on a tree that provably LOST distance-8 pairs (the shift-64
    # phantom-chunk wrap).
    @given(
        base=i64,
        flips=st.lists(
            st.lists(st.integers(min_value=0, max_value=63), min_size=0,
                     max_size=10, unique=True),
            min_size=1, max_size=8,
        ),
        max_hamming=st.integers(min_value=0, max_value=8),
    )
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(base, flips, max_hamming):
        hashes = [base]
        for positions in flips:
            v = base & ((1 << 64) - 1)
            for p in positions:
                v ^= 1 << p
            hashes.append(_signed(v))
        hashes = list(dict.fromkeys(hashes))
        rows = [(i, h) for i, h in enumerate(hashes)]
        sig = spark.createDataFrame(rows, "media_id long, h long")
        got = {
            (r["id1"], r["id2"], r["hamming"])
            for r in hamming_pairs(
                sig, "h", id_col="media_id", bits=64, max_hamming=max_hamming
            ).collect()
        }
        want = set()
        for i, a in rows:
            for j, b in rows:
                if i < j:
                    d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                    if d <= max_hamming:
                        want.add((i, j, d))
        assert got == want

    run()


def test_imagededup_cli_warc_lane(spark, tmp_path, capsys):
    """Crawl -> image dedup directly: image/* responses from WARC files
    hash and pair; non-image records ignored; corrupt images
    quarantine; the media/ mapping resolves pairs back to URLs."""
    import gzip

    from polygon_io_data_ingestion_pipeline_spark.cli import main
    from polygon_io_data_ingestion_pipeline_spark.multimodal.binaryops import (
        encode_pnm,
    )

    def _rec(url, body, ctype):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
            + b"\r\nContent-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    base = _smooth_img(60)
    variant = base.copy()
    variant[0, 0] = variant[0, 0] // 2
    other = _smooth_img(61)
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    recs = [
        _rec("http://a.x/img1", encode_pnm(base), b"image/x-portable-graymap"),
        _rec("http://a.x/img1-edit", encode_pnm(variant), b"image/x-portable-graymap"),
        _rec("http://b.x/other", encode_pnm(other), b"image/x-portable-graymap"),
        _rec("http://a.x/broken", b"P5\n9 9\n255\nxx", b"image/x-portable-graymap"),
        _rec("http://a.x/page", b"<html><body>hi</body></html>", b"text/html"),
    ]
    (crawl / "c.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in recs))
    out = str(tmp_path / "imgdedup")
    assert main([
        "imagededup", "--src", str(crawl / "*.warc.gz"), "--out", out,
        "--input-format", "warc", "--hash", "phash", "--master", "local[4]",
    ]) == 0
    text = capsys.readouterr().out
    assert "images=4" in text and "decoded=3" in text and "quarantined=1" in text
    urls = {r["media_id"]: r["url"]
            for r in spark.read.parquet(out + "/media").collect()}
    pairs = [
        (urls[r["id1"]], urls[r["id2"]])
        for r in spark.read.parquet(out + "/pairs").collect()
    ]
    assert len(pairs) == 1  # the unrelated image pairs with nothing
    assert sorted(pairs[0]) == ["http://a.x/img1", "http://a.x/img1-edit"]
