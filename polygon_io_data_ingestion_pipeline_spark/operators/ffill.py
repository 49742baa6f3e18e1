"""Calendar densification + forward fill: align a sparse keyed series
to a complete integer calendar and carry the last observation forward —
the gap-fill every market-data consumer runs before computing returns
(a missing trading day must mean "price unchanged", not "row absent"),
and the make-regular step before any fixed-step model sees a series.

Scale shapes:

- :func:`densify` generates each key's missing calendar rows with ONE
  ``sequence``/``explode`` over the key's own [min, max] span (output
  linear in the densified size, no driver-side calendar) and one keyed
  left join back. Spans come from the same partial-agg shuffle every
  keyed min/max costs.
- :func:`forward_fill` is ``last(col, ignorenulls=True)`` over an
  ordered per-key window — one hash shuffle on the key, the same price
  as any windowed computation. Values BEFORE a key's first observation
  stay null (there is nothing to carry); ``was_filled`` audits every
  fabricated value so downstream can weigh or exclude them.

Raw values pass through untouched (no float math), so DuckDB oracles
replay the fill exactly — ``last_value(... IGNORE NULLS)`` is the
identical semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    step: int = 1,
) -> DataFrame:
    """One row per (key, calendar point) for every ``step``-spaced point
    in the key's own [min(ord), max(ord)] span; columns other than the
    key/ordinal are null on fabricated rows."""
    span = df.groupBy(key_col).agg(
        F.min(ord_col).alias("__mn"), F.max(ord_col).alias("__mx")
    )
    cal = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__mn").cast("long"), F.col("__mx").cast("long"), F.lit(step))
        ).alias(ord_col),
    )
    return cal.join(df, [key_col, ord_col], "left")


def forward_fill(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    cols: Sequence[str],
    flag_col: str | None = "was_filled",
) -> DataFrame:
    """Carry each column's last non-null observation forward within the
    key, ordered by the ordinal. Rows before the first observation stay
    null. ``flag_col`` (if set) marks rows where ANY requested column
    was filled from the past rather than observed."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ord_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    if flag_col is not None:
        filled_any = None
        for c in cols:
            miss = F.col(c).isNull() & F.last(F.col(c), ignorenulls=True).over(w).isNotNull()
            filled_any = miss if filled_any is None else (filled_any | miss)
        out = out.withColumn(flag_col, filled_any.cast("int"))
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def fill_series(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    cols: Sequence[str],
    step: int = 1,
) -> DataFrame:
    """Densify + forward fill in one call — the align-to-calendar
    primitive."""
    return forward_fill(densify(df, key_col, ord_col, step), key_col, ord_col, cols)
