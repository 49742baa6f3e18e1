"""Per-key EWMA vs an explicit Python recurrence, null carry-forward,
key independence, and partitioning determinism."""

from __future__ import annotations

import datetime as dt

from polygon_io_data_ingestion_pipeline_spark.operators.bars import ewma

T0 = dt.datetime(2024, 5, 1, 9, 30)
MIN = dt.timedelta(minutes=1)
SCHEMA = "ticker string, datetime timestamp, close double"


def _loop(values, alpha):
    out, y = [], None
    for x in values:
        if x is None:
            out.append(y)
            continue
        y = x if y is None else (1 - alpha) * y + alpha * x
        out.append(y)
    return out


def test_matches_explicit_recurrence(spark):
    vals = [100.0, 101.0, 99.5, 103.25, 102.0, 98.75]
    rows = [("A", T0 + i * MIN, v) for i, v in enumerate(vals)]
    got = (
        ewma(spark.createDataFrame(rows, SCHEMA), alpha=0.25)
        .orderBy("datetime")
        .collect()
    )
    expect = _loop(vals, 0.25)
    for r, e in zip(got, expect):
        assert r["ewma"] == e  # identical double recurrence, no tolerance


def test_null_carries_prior_and_leading_null(spark):
    vals = [None, 50.0, None, 60.0]
    rows = [("A", T0 + i * MIN, v) for i, v in enumerate(vals)]
    got = (
        ewma(spark.createDataFrame(rows, SCHEMA), alpha=0.5)
        .orderBy("datetime")
        .collect()
    )
    expect = _loop(vals, 0.5)
    assert [r["ewma"] for r in got] == expect
    assert got[0]["ewma"] is None  # nothing to carry yet
    assert got[2]["ewma"] == 50.0  # prior smoothed value unchanged


def test_keys_independent_and_partitioning_invariant(spark):
    rows = []
    for k, base in (("A", 10.0), ("B", 500.0)):
        rows += [(k, T0 + i * MIN, base + i) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    one = {(r["ticker"], r["datetime"]): r["ewma"] for r in ewma(df, 0.3).collect()}
    many = {
        (r["ticker"], r["datetime"]): r["ewma"]
        for r in ewma(df.repartition(13), 0.3).collect()
    }
    assert one == many
    for k, base in (("A", 10.0), ("B", 500.0)):
        expect = _loop([base + i for i in range(20)], 0.3)
        got = [one[(k, T0 + i * MIN)] for i in range(20)]
        assert got == expect
