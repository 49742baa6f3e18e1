"""Time-series bar analytics: OHLC resampling across timeframes and
RANGE-framed rolling statistics — the two rollups every market-data
consumer runs downstream of a bar lake (the reference ships minute and
day bars and leaves resampling to its notebooks; here they are
first-class operators).

Scale shapes:

- :func:`resample_bars` is ONE partial aggregation keyed on
  (key, time bucket): ``min_by``/``max_by`` give open/close without a
  sort or a window (both are ordinary mergeable aggregates — map-side
  combine applies, the only shape that rolls 100 TB of ticks into
  bars). Never ``first()`` over a window: that shuffles every row into
  a per-key sort just to keep one value per bucket.
- :func:`rolling_range_stats` uses a RANGE frame over an integer
  ordering key (``rangeBetween(-(n-1), 0)``), which is gap-correct: a
  key with missing days still averages over the trailing *n days*, not
  the trailing n rows — the difference between rolling volatility and
  a wrong number. One window per key partition; the input is already
  one-row-per-(key, day) after the daily rollup, so partitions are
  small regardless of raw event volume.

Engine-exactness: sums accumulate as scaled BIGINTs, and rolling
variance is computed as ``(n*S2 - S1^2) / n^2`` on those exact
integers, so the final float division (and its sqrt) is bit-identical
across engines — the repo's standard oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_bars(
    df: DataFrame,
    every: str,
    key_col: str = "ticker",
    ts_col: str = "datetime",
    price_col: str = "close",
    volume_col: str | None = "volume",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Roll (key, ts, price[, volume]) rows up into OHLC bars of width
    ``every`` (any Spark interval: '5 minutes', '1 hour', '1 day').

    Open/close come from ``min_by``/``max_by`` on the timestamp — plain
    mergeable aggregates, so the whole resample is one partial-agg
    shuffle on (key, bucket). Timestamps must be unique per key for a
    deterministic open/close; pass ``tiebreak_col`` (e.g. a sequence
    id) to break exact-timestamp ties by (ts, tiebreak) instead.
    """
    order: Column = F.col(ts_col)
    if tiebreak_col is not None:
        order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    aggs = [
        F.min_by(F.col(price_col), order).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), order).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if volume_col is not None:
        aggs.append(F.sum(volume_col).alias("volume"))
    return (
        df.groupBy(
            F.col(key_col), F.window(ts_col, every)["start"].alias("bar_ts")
        ).agg(*aggs)
    )




def _assert_quantization_safe(
    df: DataFrame, cols: list[str], scale: int, n: int
) -> None:
    """One cheap aggregate guarding the scaled-BIGINT window sums: the
    largest |value|*scale must keep ``n * (|v|*scale)^2`` under 2^63,
    else S2/Sxx/Syy would silently wrap and emit wrong variance or
    correlation instead of erroring.  Opt-in (``checked=True``) because
    it costs one extra scan — use it whenever the value magnitudes are
    untrusted."""
    import math

    bound = math.sqrt((2**63 - 1) / max(n, 1)) / scale
    row = df.select(
        *[F.max(F.abs(F.col(c))).alias(c) for c in cols]
    ).first()
    for c in cols:
        mx = row[c]
        if mx is not None and float(mx) > bound:
            raise ValueError(
                f"max |{c}| = {mx} exceeds the overflow-safe bound "
                f"{bound:.6g} for scale={scale}, n={n}: the scaled "
                f"integer S2 sums would wrap. Lower `scale` or "
                f"pre-clip the values."
            )

def rolling_range_stats(
    df: DataFrame,
    n: int,
    key_col: str,
    ord_col: str,
    value_col: str,
    scale: int = 100,
    checked: bool = False,
) -> DataFrame:
    """Trailing-``n`` rolling stats with a RANGE frame over an INTEGER
    ordering column (day number, bar number): mean, min, max,
    volatility (population std) and ``n_in_frame`` — the count of
    OBSERVED (non-null) values in the frame, consistent with the
    null-skipping sums (a frame with only nulls yields null stats).
    RANGE, not ROWS: gaps in the ordering key shrink the frame
    (5 rows in a 7-day window average over 5), which is the correct
    trailing-window semantics for sparse series.

    ``value_col`` is quantized to ``scale`` (default cents) so the
    frame's S1/S2 sums are exact BIGINTs; mean and variance divide the
    exact integers, making the floats engine-identical. S2 terms are
    (|v|*scale)^2 — keep ``scale * max|value|`` under ~3e9 (then each
    term < 9.2e18 / frame) or lower the scale. ``checked=True`` spends
    one extra aggregate to ENFORCE that bound (raises instead of
    silently wrapping) — use it on untrusted-magnitude data.
    """
    if checked:
        _assert_quantization_safe(df, [value_col], scale, n)
    v = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ord_col).cast("long"))
        .rangeBetween(-(n - 1), 0)
    )
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    # Count OBSERVED values, consistently with the null-skipping sums:
    # count(*) would deflate the mean and corrupt the variance whenever
    # the frame holds a null value row.
    cnt = F.count(v).over(w)
    mean = s1 / cnt / scale
    var = (cnt * s2 - s1 * s1) / (cnt * cnt) / (scale * scale)
    return df.select(
        key_col,
        ord_col,
        value_col,
        F.round(mean, 6).alias("roll_mean"),
        F.round(F.min(F.col(value_col)).over(w), 6).alias("roll_min"),
        F.round(F.max(F.col(value_col)).over(w), 6).alias("roll_max"),
        F.round(F.sqrt(var), 6).alias("roll_vol"),
        cnt.alias("n_in_frame"),
    )


def ewma(
    df: DataFrame,
    alpha: float,
    key_col: str = "ticker",
    ts_col: str = "datetime",
    value_col: str = "close",
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average
    (``y_t = (1 - alpha) * y_{t-1} + alpha * x_t``, seeded at the first
    observation — pandas ``ewm(adjust=False, ignore_na=True)``
    semantics; nulls carry the prior smoothed value forward unchanged
    and do NOT decay the prior weight).

    The recurrence is inherently sequential per key, so this is a
    legitimate ``applyInPandas`` case (same as sessionization): one
    shuffle on the key, then each key's series is smoothed in a single
    vectorized Arrow batch. State is O(1) per key and a key's history
    lives in one pandas frame — fine for per-instrument daily/minute
    series (thousands to millions of rows per key), the shape this
    lake produces. Ties on ``ts_col`` break on ``value_col`` so the
    output is deterministic under any partitioning.

    No SQL oracle by design (a per-row recurrence is what SQL cannot
    say without a recursive CTE in its own evaluation order);
    ``tests/test_ewma.py`` verifies against an explicit Python loop.
    """
    import pandas as pd  # noqa: F401 — resolved lazily on executors

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(key_col, ts_col, value_col).schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def smooth(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        )
        return pdf

    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(smooth, schema=schema)
    )


def rolling_corr(
    df: DataFrame,
    n: int,
    key_col: str = "ticker",
    ord_col: str = "day_num",
    x_col: str = "x",
    y_col: str = "y",
    scale: int = 100,
    checked: bool = False,
) -> DataFrame:
    """Trailing-``n`` rolling Pearson correlation between two aligned
    series — the pairwise co-movement metric (bench vs index beta
    inputs, click-vs-view co-trends) the single-series rolling stats
    can't answer.

    Same RANGE-frame discipline as :func:`rolling_range_stats`: the
    frame is ``n`` UNITS of the integer ordering key, so calendar gaps
    shrink the frame instead of silently reaching further back. Both
    inputs are quantized to exact scaled BIGINTs; all five running sums
    (Sx, Sy, Sxx, Syy, Sxy) are integer window sums, and
    ``corr = (cnt*Sxy - Sx*Sy) / sqrt((cnt*Sxx - Sx^2) * (cnt*Syy - Sy^2))``
    — the quantization scale cancels, and because every input to the
    final double math is an exact integer the result is bit-identical
    across engines (the repo's oracle discipline). Integer range: safe
    while ``cnt * max|v*scale|^2 < 9e18`` per frame — far beyond any
    daily-aggregate magnitude here; bump to DECIMAL beyond that.
    Frames with zero variance on either side yield NULL (undefined),
    as does a single-row frame.

    Returns (key, ord, x, y, roll_corr, n_in_frame).
    ``checked=True`` enforces the integer-range bound with one extra
    aggregate (raises on overflow-prone magnitudes instead of wrapping).
    """
    if checked:
        _assert_quantization_safe(df, [x_col, y_col], scale, n)
    qx = F.round(F.col(x_col) * scale, 0).cast("long")
    qy = F.round(F.col(y_col) * scale, 0).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ord_col).cast("long"))
        .rangeBetween(-(n - 1), 0)
    )
    d = df.select(key_col, ord_col, F.col(x_col), F.col(y_col), qx.alias("qx"), qy.alias("qy"))
    sx = F.sum("qx").over(w)
    sy = F.sum("qy").over(w)
    sxx = F.sum(F.col("qx") * F.col("qx")).over(w)
    syy = F.sum(F.col("qy") * F.col("qy")).over(w)
    sxy = F.sum(F.col("qx") * F.col("qy")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    cov = cnt * sxy - sx * sy
    vx = cnt * sxx - sx * sx
    vy = cnt * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0),
        F.round(
            cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")),
            6,
        ),
    )
    return d.select(
        key_col,
        ord_col,
        x_col,
        y_col,
        corr.alias("roll_corr"),
        cnt.alias("n_in_frame"),
    )
