"""Gap inference, REST pullers (fake client), watchlists, multimodal plumbing."""

from __future__ import annotations

import datetime as dt
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.multimodal import (
    decode_image_features,
    frame_sample_video,
    media_stats,
    resize_images,
)
from polygon_io_data_ingestion_pipeline_spark.operators.gaps import (
    day_edges,
    infer_gap_ratios,
    merge_declared_with_inferred,
)
from polygon_io_data_ingestion_pipeline_spark.sources.rest import (
    FakePolygonClient,
    pull_dividends,
    pull_security_master,
    pull_splits,
    retrying_call,
    ticker_universe,
)
from polygon_io_data_ingestion_pipeline_spark.sources.watchlist import (
    load_watchlist,
    union_universes,
)


def _minute_bars(spark):
    rows = []
    # AAPL: 2:1 split gap between 01-03 close (200) and 01-04 open (100)
    prices = {
        "2024-01-02": (100.0, 102.0),
        "2024-01-03": (102.5, 200.0),
        "2024-01-04": (100.0, 101.0),  # halved overnight -> gap 0.5 -> ratio 2
        "2024-01-05": (101.5, 103.0),
    }
    for day, (first, last) in prices.items():
        rows.append(("AAPL", dt.datetime.fromisoformat(day + "T09:30:00"), first))
        rows.append(("AAPL", dt.datetime.fromisoformat(day + "T16:00:00"), last))
        # MSFT: quiet ticker, no gaps
        rows.append(("MSFT", dt.datetime.fromisoformat(day + "T09:30:00"), 50.0))
        rows.append(("MSFT", dt.datetime.fromisoformat(day + "T16:00:00"), 50.5))
    return spark.createDataFrame(rows, "ticker string, datetime timestamp_ntz, close double")


def test_day_edges_and_gap_inference(spark):
    edges = day_edges(_minute_bars(spark))
    e = {(r["ticker"], str(r["event_day"])): r for r in edges.collect()}
    assert e[("AAPL", "2024-01-03")]["first_close"] == 102.5
    assert e[("AAPL", "2024-01-03")]["last_close"] == 200.0
    assert abs(e[("AAPL", "2024-01-04")]["raw_gap"] - 0.5) < 1e-12

    guesses = infer_gap_ratios(edges).collect()
    assert len(guesses) == 1
    g = guesses[0]
    assert (g["ticker"], str(g["event_day"]), g["ratio_guess"]) == ("AAPL", "2024-01-04", 2.0)


def test_merge_declared_with_inferred(spark):
    declared = spark.createDataFrame(
        [
            ("AAPL", dt.date(2024, 1, 5), 2.05),  # declared one day late, similar -> moves
            ("MSFT", dt.date(2024, 2, 1), 3.0),  # untouched
            ("NVDA", dt.date(2024, 3, 4), 10.0),  # dissimilar same-day declared -> overridden
        ],
        "ticker string, event_day date, ratio double",
    )
    inferred = spark.createDataFrame(
        [
            ("AAPL", dt.date(2024, 1, 4), 2.0),
            ("NVDA", dt.date(2024, 3, 4), 2.0),
            ("TSLA", dt.date(2024, 4, 1), 5.0),  # brand new
        ],
        "ticker string, event_day date, ratio_guess double",
    )
    out = {
        (r["ticker"], str(r["event_day"])): r["ratio"]
        for r in merge_declared_with_inferred(declared, inferred).collect()
    }
    assert out == {
        ("AAPL", "2024-01-04"): 2.0,  # moved from 01-05 and re-rated
        ("MSFT", "2024-02-01"): 3.0,
        ("NVDA", "2024-03-04"): 2.0,  # overridden
        ("TSLA", "2024-04-01"): 5.0,  # added
    }


def test_rest_pullers_with_fake_client(spark):
    uni = ticker_universe(spark, ["aapl", "msft", "nvda", "tsla", "BAD"])
    factory = lambda: FakePolygonClient(fail_tickers=("BAD",))
    sm = pull_security_master(uni, client_factory=factory).toPandas()
    assert set(sm["ticker"]) == {"AAPL", "MSFT", "NVDA", "TSLA"}  # BAD absent
    assert sm["composite_figi"].str.startswith("FIGI").all()
    sp = pull_splits(uni, client_factory=factory).toPandas()
    dv = pull_dividends(uni, client_factory=factory).toPandas()
    # deterministic across runs
    sp2 = pull_splits(uni, client_factory=factory).toPandas()
    pd.testing.assert_frame_equal(
        sp.sort_values(["ticker", "execution_date"]).reset_index(drop=True),
        sp2.sort_values(["ticker", "execution_date"]).reset_index(drop=True),
    )
    if len(sp):
        assert (sp["ratio"] == sp["split_to"] / sp["split_from"]).all()
    if len(dv):
        assert (dv["pay_date"] > dv["ex_date"]).all()


def test_retry_backoff_behavior():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("429 rate limited")
        return "ok"

    slept = []
    assert retrying_call(flaky, sleep=slept.append) == "ok"
    assert slept == [0.5, 1.0]  # exponential from base 0.5

    def not_found():
        raise RuntimeError("NOT_FOUND: nope")

    with pytest.raises(RuntimeError, match="NOT_FOUND"):
        retrying_call(not_found, sleep=slept.append)
    assert len(slept) == 2  # no retries on NOT_FOUND


def test_watchlists(tmp_path):
    j = tmp_path / "u.json"
    j.write_text(json.dumps(["aapl", "BRK.B", "msft"]))
    t = tmp_path / "u.txt"
    t.write_text("nvda\n\ntsla\n")
    a, b = load_watchlist(j), load_watchlist(t)
    assert a == {"AAPL", "BRK.B", "MSFT"} and b == {"NVDA", "TSLA"}
    assert union_universes(a, b) == ["AAPL", "BRK.B", "MSFT", "NVDA", "TSLA"]


def test_scrape_index_universe(tmp_path):
    from polygon_io_data_ingestion_pipeline_spark.sources.watchlist import (
        scrape_index_universe,
    )

    page = tmp_path / "constituents.html"
    page.write_text(
        """
<html><body>
<table><tr><th>Rank</th><th>Name</th></tr><tr><td>1</td><td>Other</td></tr></table>
<table>
  <tr><th>Symbol</th><th>Security</th></tr>
  <tr><td>msft</td><td>Microsoft</td></tr>
  <tr><td>AAPL</td><td>Apple</td></tr>
  <tr><td>BRK.B extra</td><td>Berkshire</td></tr>
  <tr><td>AAPL</td><td>Apple duplicate</td></tr>
</table>
</body></html>
"""
    )
    assert scrape_index_universe(page) == ["AAPL", "BRK.B", "MSFT"]
    with pytest.raises(ValueError, match="no table"):
        scrape_index_universe(page, symbol_header="Ticker")


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", b"imagebytes-1", ("image/png", 640, 480, None)),
        (2, "image", b"imagebytes-2", ("image/png", 800, 600, None)),
        (3, "video", b"videobytes-3", ("video/mp4", 1280, 720, 3500)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, "
        "meta struct<mime: string, width: int, height: int, duration_ms: bigint>",
    )
    feats = decode_image_features(df.filter(F.col("kind") == "image")).collect()
    assert {r["media_id"] for r in feats} == {1, 2}
    assert all(len(r["features"]) == 8 and all(0 <= v < 1 for v in r["features"]) for r in feats)
    # deterministic
    feats2 = decode_image_features(df.filter(F.col("kind") == "image")).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    resized = resize_images(df, 224, 224).collect()
    assert all(r["meta"]["width"] == 224 and r["meta"]["height"] == 224 for r in resized)
    assert {r["media_id"] for r in resized} == {1, 2, 3}

    frames = frame_sample_video(df.filter(F.col("kind") == "video"), every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
    assert len({bytes(r["frame"]) for r in frames}) == 4  # distinct frame stubs

    stats = {r["kind"]: r for r in media_stats(df).collect()}
    assert stats["image"]["n_items"] == 2 and stats["video"]["max_duration_ms"] == 3500
