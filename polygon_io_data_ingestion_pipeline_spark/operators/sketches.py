"""Approximate aggregates for corpus-scale audits.

Exact distinct counts and exact percentiles need a shuffle of every
distinct value / a full sort; at 100 TB the sketch versions (HLL++ for
distincts, Greenwald-Khanna for quantiles — both Spark built-ins,
merged map-side like any partial aggregate) answer the same audit
questions in one pass with bounded memory. Wrappers exist so callers
get a consistent, tested surface with documented error bounds; the
error-vs-exact floors are asserted in tests/test_sketches.py.

These are deliberately NOT registry queries: sketch internals differ
across engines, so no DuckDB oracle can hash-match them. The
correctness story is the error-bound test against the exact answer,
which is the sketch's actual contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    rsd: float = 0.02,
) -> DataFrame:
    """HLL++ distinct count of ``value_col`` (optionally per group):
    ``n_distinct_approx`` with relative standard deviation ``rsd``.
    One map-side-merged pass — no distinct shuffle."""
    agg = F.approx_count_distinct(value_col, rsd=rsd).alias("n_distinct_approx")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    relative_error: float = 0.01,
) -> DataFrame:
    """Greenwald-Khanna quantile sketch of ``value_col``: one row per
    group with ``quantiles`` (array aligned with ``probabilities``).
    Rank error <= relative_error * n — a full sort's answer to within
    the sketch bound, in one pass."""
    agg = F.percentile_approx(
        value_col,
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(int(1.0 / relative_error)),
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)
