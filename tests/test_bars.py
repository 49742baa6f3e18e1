"""Bar analytics: OHLC resampling picks time-ordered open/close per
bucket (with deterministic tie-breaking), and the rolling stats use a
gap-correct RANGE frame — a missing day shrinks the frame instead of
silently reaching further back like a ROWS frame would."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.bars import (
    resample_bars,
    rolling_range_stats,
)


def _ticks(spark):
    base = dt.datetime(2024, 3, 1, 9, 30)
    rows = [
        # (ticker, ts offset minutes, price, volume, seq)
        ("AAA", 0, 10.0, 100, 1),
        ("AAA", 2, 12.0, 50, 2),
        ("AAA", 4, 9.0, 70, 3),
        ("AAA", 5, 11.0, 30, 4),   # next 5-minute bucket
        ("BBB", 1, 5.0, 10, 5),
        ("BBB", 3, 6.0, 20, 6),
    ]
    return spark.createDataFrame(
        [(t, base + dt.timedelta(minutes=m), p, v, s) for t, m, p, v, s in rows],
        "ticker string, datetime timestamp_ntz, close double, volume long, seq long",
    )


def test_resample_5min_ohlc(spark):
    bars = resample_bars(_ticks(spark), "5 minutes").orderBy("ticker", "bar_ts")
    got = [r.asDict() for r in bars.collect()]
    a0, a1, b0 = got[0], got[1], got[2]
    assert (a0["open"], a0["high"], a0["low"], a0["close"]) == (10.0, 12.0, 9.0, 9.0)
    assert a0["volume"] == 220 and a0["n_events"] == 3
    assert (a1["open"], a1["close"], a1["n_events"]) == (11.0, 11.0, 1)
    assert (b0["open"], b0["close"]) == (5.0, 6.0)
    # Bucket boundary: 9:35 tick landed in the second bucket.
    assert a1["bar_ts"].minute == 35


def test_resample_tiebreak_on_equal_timestamps(spark):
    ts = dt.datetime(2024, 3, 1, 9, 30)
    df = spark.createDataFrame(
        [("AAA", ts, 10.0, 2), ("AAA", ts, 20.0, 1)],
        "ticker string, datetime timestamp_ntz, close double, seq long",
    )
    bars = resample_bars(df, "1 hour", volume_col=None, tiebreak_col="seq")
    row = bars.first()
    # Same timestamp: (ts, seq) ordering makes seq=1 the open, seq=2 the close.
    assert row["open"] == 20.0 and row["close"] == 10.0


def test_rolling_range_frame_is_gap_correct(spark):
    # Days 0,1,2 then a gap, then day 10: the 3-day trailing frame at
    # day 10 must contain ONLY day 10 (RANGE), not the last 3 rows (ROWS).
    df = spark.createDataFrame(
        [("u", 0, 1.0), ("u", 1, 2.0), ("u", 2, 3.0), ("u", 10, 40.0)],
        "k string, d long, val double",
    )
    out = {
        r["d"]: r.asDict()
        for r in rolling_range_stats(df, n=3, key_col="k", ord_col="d", value_col="val").collect()
    }
    assert out[2]["n_in_frame"] == 3 and out[2]["roll_mean"] == 2.0
    assert out[10]["n_in_frame"] == 1 and out[10]["roll_mean"] == 40.0
    assert out[10]["roll_vol"] == 0.0
    # Partial leading frame: day 1 averages days 0-1.
    assert out[1]["n_in_frame"] == 2 and out[1]["roll_mean"] == 1.5
    assert out[2]["roll_min"] == 1.0 and out[2]["roll_max"] == 3.0


def test_rolling_variance_matches_numpy(spark):
    import numpy as np

    vals = [3.25, 7.5, 1.0, 9.75, 2.5]
    df = spark.createDataFrame(
        [("u", i, v) for i, v in enumerate(vals)], "k string, d long, val double"
    )
    out = rolling_range_stats(df, n=5, key_col="k", ord_col="d", value_col="val")
    last = out.filter(F.col("d") == 4).first()
    assert abs(last["roll_vol"] - float(np.std(vals))) < 1e-6
    assert abs(last["roll_mean"] - float(np.mean(vals))) < 1e-6


def test_rolling_stats_ignore_null_values_consistently(spark):
    """Sums skip nulls, so the count must too — otherwise a null row
    deflates the mean and fabricates variance."""
    df = spark.createDataFrame(
        [("u", 0, 10.0), ("u", 1, None), ("u", 2, 10.0)],
        "k string, d long, val double",
    )
    out = {
        r["d"]: r.asDict()
        for r in rolling_range_stats(df, n=3, key_col="k", ord_col="d", value_col="val").collect()
    }
    assert out[2]["n_in_frame"] == 2
    assert out[2]["roll_mean"] == 10.0 and out[2]["roll_vol"] == 0.0


def test_rolling_corr_matches_numpy_and_handles_degenerates(spark):
    import numpy as np

    rows = []
    xs = [1.0, 2.0, 3.5, 2.5, 4.0, 5.0, 4.5]
    ys = [2.0, 4.1, 6.8, 5.2, 8.0, 9.9, 9.1]
    rows += [("A", d, x, y) for d, (x, y) in enumerate(zip(xs, ys))]
    rows += [("B", 0, 1.0, 9.9), ("B", 1, 1.0, 3.3)]  # zero x-variance
    df = spark.createDataFrame(rows, "k string, day_num long, x double, y double")

    from polygon_io_data_ingestion_pipeline_spark.operators.bars import rolling_corr

    got = {
        (r["k"], r["day_num"]): r
        for r in rolling_corr(df, n=4, key_col="k").collect()
    }
    for d in range(len(xs)):
        lo = max(0, d - 3)
        fx, fy = np.array(xs[lo : d + 1]), np.array(ys[lo : d + 1])
        r = got[("A", d)]
        assert r["n_in_frame"] == d + 1 - lo
        if len(fx) < 2 or fx.std() == 0 or fy.std() == 0:
            assert r["roll_corr"] is None
        else:
            expect = float(np.corrcoef(fx, fy)[0, 1])
            assert abs(r["roll_corr"] - round(expect, 6)) <= 1e-6
    # zero variance on one side -> NULL, not a crash or a fake 0
    assert got[("B", 1)]["roll_corr"] is None


def test_rolling_stats_checked_mode_raises_on_overflow_magnitudes(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.bars import (
        rolling_corr,
        rolling_range_stats,
    )

    big = spark.createDataFrame(
        [("A", 1, 5.0e9, 1.0), ("A", 2, 6.0e9, 2.0)],
        "ticker string, day_num int, v double, y double",
    )
    with pytest.raises(ValueError, match="overflow-safe bound"):
        rolling_range_stats(
            big, 7, "ticker", "day_num", "v", scale=100, checked=True
        ).collect()
    with pytest.raises(ValueError, match="overflow-safe bound"):
        rolling_corr(
            big, 7, "ticker", "day_num", "v", "y", scale=100, checked=True
        ).collect()
    # safe magnitudes pass the check and compute normally
    ok = spark.createDataFrame(
        [("A", 1, 10.0, 1.0), ("A", 2, 12.0, 2.0)],
        "ticker string, day_num int, v double, y double",
    )
    assert rolling_range_stats(ok, 7, "ticker", "day_num", "v", checked=True).count() == 2
    assert rolling_corr(ok, 7, "ticker", "day_num", "v", "y", checked=True).count() == 2
