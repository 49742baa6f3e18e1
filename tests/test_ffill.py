"""Densify + forward fill: gaps materialize and carry the last
observation, leading nulls stay null, flags audit fabricated values."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.ffill import (
    densify,
    fill_series,
    forward_fill,
)


def test_densify_materializes_each_keys_own_span(spark):
    df = spark.createDataFrame(
        [("a", 3, 1.0), ("a", 6, 2.0), ("b", 10, 9.0)], "k string, d long, v double"
    )
    got = {(r["k"], r["d"]): r["v"] for r in densify(df, "k", "d").collect()}
    assert set(got) == {("a", 3), ("a", 4), ("a", 5), ("a", 6), ("b", 10)}
    assert got[("a", 4)] is None and got[("a", 6)] == 2.0


def test_fill_series_carries_forward_and_flags(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 4, 40.0)], "k string, d long, v double"
    )
    got = {
        r["d"]: (r["v"], r["was_filled"])
        for r in fill_series(df, "k", "d", ["v"]).collect()
    }
    assert got == {1: (10.0, 0), 2: (10.0, 1), 3: (10.0, 1), 4: (40.0, 0)}


def test_leading_nulls_stay_null(spark):
    # An observed row with a null value ahead of the first real value:
    # nothing to carry -> stays null, not flagged as filled.
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None)], "k string, d long, v double"
    )
    got = {
        r["d"]: (r["v"], r["was_filled"])
        for r in forward_fill(df, "k", "d", ["v"]).collect()
    }
    assert got[1] == (None, 0)
    assert got[2] == (5.0, 0)
    assert got[3] == (5.0, 1)


def test_multi_column_fill_flags_any(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0, 2.0), ("a", 2, None, 3.0), ("a", 3, 4.0, None)],
        "k string, d long, x double, y double",
    )
    got = {
        r["d"]: (r["x"], r["y"], r["was_filled"])
        for r in forward_fill(df, "k", "d", ["x", "y"]).collect()
    }
    assert got[2] == (1.0, 3.0, 1)
    assert got[3] == (4.0, 3.0, 1)
    assert got[1] == (1.0, 2.0, 0)
