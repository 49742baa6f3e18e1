"""Property test: SCD2 interval compaction against a pure-Python
run-length model over random keyed sequences (incl. nulls and ties)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.scd import collapse_to_intervals

_seq = st.lists(
    st.sampled_from(["x", "y", "z", None]), min_size=1, max_size=12
)


def _model(values):
    """Expected runs: (value, first_idx, last_idx, n)."""
    runs = []
    for i, v in enumerate(values):
        if runs and runs[-1][0] == v:
            prev = runs.pop()
            runs.append((v, prev[1], i, prev[3] + 1))
        else:
            runs.append((v, i, i, 1))
    return runs


@settings(max_examples=15, deadline=None)
@given(st.dictionaries(st.sampled_from(["A", "B", "C"]), _seq, min_size=1, max_size=3))
def test_collapse_matches_run_length_model(spark, series):
    rows = [
        (k, i, v) for k, vals in series.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, t int, v string")
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["v"], r["n_rows"])
        for r in collapse_to_intervals(df, "k", "t", ["v"]).collect()
    )
    want = sorted(
        (k, a, b, v, n) for k, vals in series.items() for v, a, b, n in _model(vals)
    )
    assert got == want
