"""asof_join vs pandas.merge_asof across all direction/exact modes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.asof import asof_join

LEFT = pd.DataFrame(
    {
        "g": ["a"] * 5 + ["b"] * 3,
        "k": [1, 5, 10, 10, 20, 3, 7, 7],
        "lv": list(range(8)),
    }
)
RIGHT = pd.DataFrame(
    {
        "g": ["a"] * 4 + ["b"] * 2 + ["c"],
        "k": [2, 10, 10, 15, 7, 30, 1],
        "rv": [100, 200, 250, 300, 400, 500, 600],
    }
)


def _expected_key(g, k, direction, allow_exact):
    cand = RIGHT[RIGHT["g"] == g]["k"]
    if direction == "forward":
        cand = cand[cand >= k] if allow_exact else cand[cand > k]
        return float(cand.min()) if len(cand) else np.nan
    cand = cand[cand <= k] if allow_exact else cand[cand < k]
    return float(cand.max()) if len(cand) else np.nan


@pytest.mark.parametrize("direction", ["forward", "backward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_matched_keys(spark, direction, allow_exact):
    got = (
        asof_join(
            spark.createDataFrame(LEFT),
            spark.createDataFrame(RIGHT),
            on="k",
            by="g",
            direction=direction,
            allow_exact_matches=allow_exact,
            right_prefix="m_",
        )
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want = np.array(
        [_expected_key(r.g, r.k, direction, allow_exact) for r in LEFT.itertuples()]
    )
    np.testing.assert_array_equal(got["m_k"].to_numpy(dtype=float), want)


def test_forward_exact_snap(spark):
    """The factor-engine case: an event keyed exactly on a calendar day
    must snap to that day when exact matches are allowed, to the next
    one otherwise (the asof off-by-one caught by the factor fixture)."""
    left = pd.DataFrame({"g": ["x"], "k": [10], "lv": [0]})
    right = pd.DataFrame({"g": ["x", "x"], "k": [10, 12], "rv": [1, 2]})
    exact = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", by="g", direction="forward", allow_exact_matches=True,
    ).collect()[0]
    assert exact["asof_k"] == 10
    after = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", by="g", direction="forward", allow_exact_matches=False,
    ).collect()[0]
    assert after["asof_k"] == 12


def test_inner_drops_unmatched(spark):
    left = pd.DataFrame({"g": ["a", "a"], "k": [1, 99], "lv": [0, 1]})
    right = pd.DataFrame({"g": ["a"], "k": [5], "rv": [7]})
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", by="g", direction="forward", how="inner",
    ).toPandas()
    assert list(out["k"]) == [1] and list(out["asof_k"]) == [5]
