"""Feature repair: imputation fills from the right group, absence
stays visible, and winsorization clips with honest audit flags."""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.impute import (
    impute_group_mean,
    winsorize,
)


def test_impute_uses_own_group_mean(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "g string, v double",
    )
    got = {
        (r["g"], r["v"]): r["was_imputed"]
        for r in impute_group_mean(df, "v", ["g"]).collect()
    }
    assert got[("a", 2.0)] == 1      # mean(1, 3)
    assert got[("b", 10.0)] in (0, 1)  # one original, one imputed copy share the key
    rows = impute_group_mean(df, "v", ["g"]).collect()
    assert sum(r["was_imputed"] for r in rows) == 2
    assert all(r["v"] is not None for r in rows)


def test_unobserved_group_keeps_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("c", None), ("c", None)], "g string, v double"
    )
    rows = impute_group_mean(df, "v", ["g"]).collect()
    c_rows = [r for r in rows if r["g"] == "c"]
    assert all(r["v"] is None and r["was_imputed"] == 0 for r in c_rows)


def test_winsorize_clips_and_flags(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 50.0), (3, 500.0), (4, None)], "i long, v double"
    )
    got = {r["i"]: (r["v"], r["was_clipped"]) for r in winsorize(df, "v", 0.0, 100.0).collect()}
    assert got[1] == (0.0, 1)
    assert got[2] == (50.0, 0)
    assert got[3] == (100.0, 1)
    assert got[4] == (None, 0)  # nulls pass through unflagged
    with pytest.raises(ValueError):
        winsorize(df, "v", 10.0, 0.0)


def test_null_group_key_still_imputes(spark):
    """groupBy keeps NULL as a group; the join back must be null-safe
    or the NULL group's mean can never reach its rows."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), (None, None), ("a", 7.0)],
        "g string, v double",
    )
    rows = impute_group_mean(df, "v", ["g"]).collect()
    null_rows = [r for r in rows if r["g"] is None]
    assert sorted(r["v"] for r in null_rows) == [1.0, 2.0, 3.0]
    assert sum(r["was_imputed"] for r in null_rows) == 1
