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


def brute(left, right, direction, allow_exact, tolerance=None):
    """pandas.merge_asof rule: nearest key; among duplicate keys the
    positionally FIRST (forward) / LAST (backward) right row wins."""
    out = []
    for g, k in left:
        cand = [(rk, pos) for pos, (rg, rk) in enumerate(right) if rg == g]
        if direction == "forward":
            cand = [c for c in cand if (c[0] >= k if allow_exact else c[0] > k)]
            if not cand:
                out.append((None, None))
                continue
            best = min(c[0] for c in cand)
            pos = min(p for c, p in cand if c == best)
        else:
            cand = [c for c in cand if (c[0] <= k if allow_exact else c[0] < k)]
            if not cand:
                out.append((None, None))
                continue
            best = max(c[0] for c in cand)
            pos = max(p for c, p in cand if c == best)
        if tolerance is not None and abs(best - k) > tolerance:
            out.append((None, None))
            continue
        out.append((best, 100 + pos))
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
    tolerance=st.sampled_from([None, 0, 3, 10]),
)
def test_asof_matches_bruteforce(spark, left, right, direction, allow_exact, tolerance):
    ldf = spark.createDataFrame(
        pd.DataFrame({"g": [g for g, _ in left], "k": [k for _, k in left],
                      "i": range(len(left))})
    )
    rdf = spark.createDataFrame(
        pd.DataFrame({"g": [g for g, _ in right], "k": [k for _, k in right],
                      "pos": range(len(right)),
                      "rv": [100 + i for i in range(len(right))]})
    )
    got = (
        asof_join(ldf, rdf, on="k", by="g", direction=direction,
                  allow_exact_matches=allow_exact, right_prefix="m_",
                  tiebreaker="pos", tolerance=tolerance)
        .toPandas()
        .sort_values("i")
    )
    want = brute(left, right, direction, allow_exact, tolerance)
    got_pairs = [
        (None if pd.isna(k) else int(k), None if pd.isna(v) else int(v))
        for k, v in zip(got["m_k"], got["m_rv"])
    ]
    assert got_pairs == want
