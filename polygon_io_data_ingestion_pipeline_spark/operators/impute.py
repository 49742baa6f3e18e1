"""Feature repair: outlier winsorization and group-keyed null
imputation — the two cleanup passes every feature/metrics pipeline
runs between raw events and a training table.

Scale shapes:

- :func:`winsorize` clips to FIXED literal bounds map-side (zero
  shuffles). Deriving the bounds from the data is a separate,
  explicit step (``approx_quantiles`` in :mod:`.sketches` — one
  sketch pass); splitting derive-from-fit and apply mirrors the
  fit/transform contract ML pipelines need anyway (bounds must come
  from the TRAIN split only, then apply everywhere).
- :func:`impute_group_mean` fills nulls with their group's mean in
  one partial-agg shuffle (group means) + one broadcast-or-AQE keyed
  join back; rows in a group with NO observed values stay null
  (explicitly surfaced via ``was_imputed`` so downstream can drop or
  escalate, rather than silently learning from fabricated zeros).

Engine-exactness: group means divide scaled-BIGINT sums by exact
counts (the repo's standard oracle discipline), so imputed values are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    lower: float,
    upper: float,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` into [lower, upper] (nulls pass through),
    plus a ``was_clipped`` audit flag. Pure map-side codegen."""
    if lower > upper:
        raise ValueError("lower bound exceeds upper bound")
    v = F.col(value_col)
    clipped = F.when(v < lower, F.lit(float(lower))).when(
        v > upper, F.lit(float(upper))
    ).otherwise(v)
    # Flag BEFORE overwriting the value column: F.col resolves against
    # the frame it is applied to, so flagging after the clip would read
    # the already-clipped value and never fire.
    return df.withColumn(
        "was_clipped", (v.isNotNull() & ((v < lower) | (v > upper))).cast("int")
    ).withColumn(out_col or value_col, clipped)


def impute_group_mean(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    scale: int = 1000000,
) -> DataFrame:
    """Fill nulls in ``value_col`` with the mean of the NON-NULL values
    in the row's group; adds ``was_imputed``. Groups with no observed
    values keep their nulls (flagged 0 — nothing was imputed), so
    absence stays visible instead of becoming a silent constant.

    One partial-agg shuffle for the means, one keyed join back (AQE
    broadcasts the mean table when small). The mean is computed as
    round(sum(round(v*scale)) / n / scale, 6) on exact integers —
    engine-identical.
    """
    vs = F.round(F.col(value_col) * scale).cast("long")
    means = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.round(F.sum(vs) / F.count(F.lit(1)) / scale, 6).alias("__gmean")
        )
    )
    # Null-SAFE key equality: groupBy keeps NULL as a group, so a NULL
    # group key with observed values HAS a mean — but a name-list join
    # (null-unsafe) could never match it back, silently breaking the
    # documented contract for the NULL group.
    cond = None
    for c in group_cols:
        eq = df[c].eqNullSafe(means[c])
        cond = eq if cond is None else cond & eq
    out = df.join(means, cond, "left").drop(*[means[c] for c in group_cols])
    filled = F.coalesce(F.col(value_col), F.col("__gmean"))
    return (
        out.withColumn(
            "was_imputed",
            (F.col(value_col).isNull() & F.col("__gmean").isNotNull()).cast("int"),
        )
        .withColumn(value_col, filled)
        .drop("__gmean")
    )
