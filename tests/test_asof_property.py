"""Property-based check: asof_join matches a brute-force oracle on
random inputs (random groups, duplicate keys, empty sides)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.asof import asof_join

keys = st.integers(min_value=0, max_value=30)
groups = st.sampled_from(["a", "b", "c"])
rows = st.lists(st.tuples(groups, keys), min_size=1, max_size=12)


def brute(left, right, direction, allow_exact):
    out = []
    for g, k in left:
        cand = [rk for rg, rk in right if rg == g]
        if direction == "forward":
            cand = [c for c in cand if (c >= k if allow_exact else c > k)]
            out.append(min(cand) if cand else None)
        else:
            cand = [c for c in cand if (c <= k if allow_exact else c < k)]
            out.append(max(cand) if cand else None)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    left=rows,
    right=rows,
    direction=st.sampled_from(["forward", "backward"]),
    allow_exact=st.booleans(),
)
def test_asof_matches_bruteforce(spark, left, right, direction, allow_exact):
    ldf = spark.createDataFrame(
        pd.DataFrame({"g": [g for g, _ in left], "k": [k for _, k in left],
                      "i": range(len(left))})
    )
    rdf = spark.createDataFrame(
        pd.DataFrame({"g": [g for g, _ in right], "k": [k for _, k in right],
                      "rv": [100 + i for i in range(len(right))]})
    )
    got = (
        asof_join(ldf, rdf, on="k", by="g", direction=direction,
                  allow_exact_matches=allow_exact, right_prefix="m_")
        .toPandas()
        .sort_values("i")
    )
    want = brute(left, right, direction, allow_exact)
    got_keys = [None if pd.isna(v) else int(v) for v in got["m_k"]]
    assert got_keys == want
