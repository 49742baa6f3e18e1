"""SCD2 interval compaction (gaps-and-islands): collapse an ordered
change log into validity intervals — one row per (key, attribute-state
run) with its [valid_from, valid_to] bounds.

This is the dimension-history builder every warehouse runs downstream
of CDC feeds (the reference's SCD join, factors.py J1, CONSUMES such
intervals; this operator PRODUCES them from raw events), and in a
training-data lake it is the "what did this record look like at time t"
primitive behind point-in-time-correct feature extraction.

Scale shape: one shuffle — the per-key ordered window that flags state
changes (lag + null-safe compare) and numbers the runs (running sum of
flags), then a partial-aggregated groupBy on (key, run) for the bounds.
No self-join, no driver state; skew = the hottest single key's history,
same as any per-key window in the repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_to_intervals(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse consecutive rows whose ``attr_cols`` are unchanged into
    one validity-interval row per run.

    Returns (key, *attrs, valid_from, valid_to, n_rows) where
    valid_from/valid_to are the run's first/last ``ord_col`` values
    (inclusive observation bounds — callers wanting half-open intervals
    take the next run's valid_from).  Comparison is null-safe: a null
    attribute value is a STATE, not a wildcard (NULL -> NULL is
    unchanged; x -> NULL is a change).  Ties on ``ord_col`` break on
    ``tiebreak_col`` so runs are deterministic under any partitioning.
    """
    order = [F.col(ord_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed: Column | None = None
    for a in attr_cols:
        c = ~F.col(a).eqNullSafe(F.lag(a).over(w))
        changed = c if changed is None else (changed | c)
    # first row per key: lag is null -> eqNullSafe false for non-null
    # attrs, but an all-null first state must still open a run
    flag = F.when(F.lag(ord_col).over(w).isNull(), F.lit(1)).otherwise(
        changed.cast("int")
    )
    runs = df.withColumn("__run", F.sum(flag).over(w))
    return (
        runs.groupBy(key_col, "__run", *attr_cols)
        .agg(
            F.min(ord_col).alias("valid_from"),
            F.max(ord_col).alias("valid_to"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .drop("__run")
    )
