"""Interval overlap join: exact pair set (vs brute force, property-
tested), emit-once uniqueness without a distinct, bucket-width
invariance, and the guard rails."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.intervals import (
    interval_overlap_join,
)

iv = st.tuples(st.integers(0, 50), st.integers(0, 30)).map(lambda t: (t[0], t[0] + t[1]))


def _run(spark, left, right, width):
    ldf = spark.createDataFrame(
        pd.DataFrame([(i, s, e) for i, (s, e) in enumerate(left)],
                     columns=["lid", "ls", "le"])
    )
    rdf = spark.createDataFrame(
        pd.DataFrame([(i, s, e) for i, (s, e) in enumerate(right)],
                     columns=["rid", "rs", "re"])
    )
    rows = interval_overlap_join(ldf, rdf, "ls", "le", "rs", "re", width).collect()
    return [(r["lid"], r["rid"]) for r in rows]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    left=st.lists(iv, min_size=1, max_size=10),
    right=st.lists(iv, min_size=1, max_size=10),
    width=st.sampled_from([1, 3, 7, 100]),
)
def test_matches_bruteforce_and_emits_once(spark, left, right, width):
    got = _run(spark, left, right, width)
    want = [
        (i, j)
        for i, (ls, le) in enumerate(left)
        for j, (rs, re) in enumerate(right)
        if ls <= re and rs <= le
    ]
    assert sorted(got) == sorted(want)      # exact pair set...
    assert len(got) == len(set(got))        # ...each emitted exactly once


def test_rejects_column_collisions_and_bad_width(spark):
    df = spark.createDataFrame([(1, 2)], "s long, e long")
    with pytest.raises(ValueError, match="overlapping column"):
        interval_overlap_join(df, df, "s", "e", "s", "e", 10)
    other = df.select(
        df.s.alias("rs"), df.e.alias("re")
    )
    with pytest.raises(ValueError, match="bucket_width"):
        interval_overlap_join(df, other, "s", "e", "rs", "re", 0)
