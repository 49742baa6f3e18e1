"""Property test: snapshot_diff against a pure-Python dict model.

Random pairs of keyed snapshots (overlapping keys, null values, multi
compare columns); the diff must classify exactly the keys the model
classifies, list exactly the columns whose values differ (null-safe),
and never emit unchanged keys.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.diff import snapshot_diff

val = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
snap = st.dictionaries(
    st.integers(min_value=0, max_value=9),  # key
    st.tuples(val, val),  # (a, b) payload columns
    max_size=8,
)


def _model(old: dict, new: dict):
    out = {}
    for k in old.keys() | new.keys():
        if k not in new:
            out[k] = ("removed", None)
        elif k not in old:
            out[k] = ("added", None)
        else:
            changed = [
                c
                for c, i in (("a", 0), ("b", 1))
                if old[k][i] != new[k][i]  # None != v is a change; None == None is not
            ]
            if changed:
                out[k] = ("changed", changed)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=snap, new=snap)
def test_diff_matches_dict_model(spark, old, new):
    schema = "id long, a long, b long"
    o = spark.createDataFrame([(k, v[0], v[1]) for k, v in old.items()], schema)
    n = spark.createDataFrame([(k, v[0], v[1]) for k, v in new.items()], schema)
    got = {
        r["id"]: (r["change_type"], list(r["changed_cols"]) if r["changed_cols"] is not None else None)
        for r in snapshot_diff(o, n, key_cols=("id",)).collect()
    }
    assert got == _model(old, new)
