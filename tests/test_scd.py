"""Gaps-and-islands SCD2 compaction: run boundaries, null-state
semantics, tiebreaks, and multi-attribute changes."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.scd import collapse_to_intervals


def _run(spark, rows, attrs=("v",), tiebreak=None):
    df = spark.createDataFrame(rows, "k string, t long, v string, u string")
    out = collapse_to_intervals(df, "k", "t", list(attrs), tiebreak_col=tiebreak)
    return sorted(
        (r["k"], r["valid_from"], r["valid_to"], tuple(r[a] for a in attrs), r["n_rows"])
        for r in out.collect()
    )


def test_consecutive_equal_states_collapse(spark):
    rows = [
        ("A", 1, "x", "-"), ("A", 2, "x", "-"), ("A", 3, "y", "-"),
        ("A", 4, "y", "-"), ("A", 5, "x", "-"),
    ]
    got = _run(spark, rows)
    assert got == [
        ("A", 1, 2, ("x",), 2),
        ("A", 3, 4, ("y",), 2),
        ("A", 5, 5, ("x",), 1),  # returning to x opens a NEW run
    ]


def test_null_is_a_state_not_a_wildcard(spark):
    rows = [
        ("A", 1, "x", "-"), ("A", 2, None, "-"), ("A", 3, None, "-"), ("A", 4, "x", "-"),
    ]
    got = _run(spark, rows)
    assert got == [
        ("A", 1, 1, ("x",), 1),
        ("A", 2, 3, (None,), 2),  # null run holds together (null-safe compare)
        ("A", 4, 4, ("x",), 1),
    ]


def test_all_null_leading_state_opens_a_run(spark):
    rows = [("A", 1, None, "-"), ("A", 2, None, "-")]
    assert _run(spark, rows) == [("A", 1, 2, (None,), 2)]


def test_keys_are_independent_and_multi_attr_changes_split(spark):
    rows = [
        ("A", 1, "x", "p"), ("A", 2, "x", "q"),  # u changes -> new run
        ("B", 1, "x", "p"), ("B", 2, "x", "p"),
    ]
    got = _run(spark, rows, attrs=("v", "u"))
    assert got == [
        ("A", 1, 1, ("x", "p"), 1),
        ("A", 2, 2, ("x", "q"), 1),
        ("B", 1, 2, ("x", "p"), 2),
    ]


def test_ordinal_ties_break_deterministically(spark):
    rows = [("A", 1, "x", "a"), ("A", 1, "y", "b"), ("A", 2, "y", "c")]
    got = _run(spark, rows, tiebreak="u")
    assert got == [("A", 1, 1, ("x",), 1), ("A", 1, 2, ("y",), 2)]
