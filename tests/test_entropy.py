"""Entropy/compressibility signals: hand-computed entropy, zlib parity,
null/empty handling, and the discriminating-power ordering."""

from __future__ import annotations

import zlib

from polygon_io_data_ingestion_pipeline_spark.operators.entropy import entropy_signals


def test_hand_computed_entropy_and_zlib_parity(spark):
    texts = {
        0: "aaaa",  # one symbol -> 0 bits
        1: "abab",  # two equiprobable symbols -> 1 bit
        2: "abcd",  # four equiprobable -> 2 bits
        3: "the quick brown fox jumps over the lazy dog",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in entropy_signals(df).collect()}
    assert got[0]["char_entropy"] == 0.0
    assert got[1]["char_entropy"] == 1.0
    assert got[2]["char_entropy"] == 2.0
    for i, t in texts.items():
        assert got[i]["n_chars"] == len(t)
        raw = t.encode("utf-8")
        assert got[i]["compression_ratio"] == len(zlib.compress(raw, 6)) / len(raw)


def test_null_and_empty(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in entropy_signals(df).collect()}
    assert got[0]["n_chars"] is None
    assert got[0]["char_entropy"] is None
    assert got[0]["compression_ratio"] is None
    assert got[1]["n_chars"] == 0
    assert got[1]["char_entropy"] == 0.0
    assert got[1]["compression_ratio"] is None


def test_signal_orders_junk_below_prose(spark):
    """Repetitive template junk: lower entropy AND lower compression
    ratio than natural prose of the same length."""
    prose = (
        "markets opened mixed on tuesday as investors weighed earnings "
        "reports against fresh inflation data from europe and asia"
    )
    junk = ("buy now best price " * 20)[: len(prose)]
    df = spark.createDataFrame(
        [(0, prose), (1, junk)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in entropy_signals(df).collect()}
    assert got[1]["char_entropy"] < got[0]["char_entropy"]
    assert got[1]["compression_ratio"] < got[0]["compression_ratio"]
