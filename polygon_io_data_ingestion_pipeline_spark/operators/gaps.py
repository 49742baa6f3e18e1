"""Minute-path day edges, overnight gaps, and split-gap inference.

Reference: legacy_scripts/factor_builder.py — edges scan 727-744 (a
thread pool reading first/last close per day-file), ratio guess
746-753, declared-vs-inferred merge 789-814. Here the edges scan is a
single grouped aggregation over the minute lake (min_by/max_by), and
the guess is a native column expression over a literal candidate array
— no Python, one shuffle on (ticker, day).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SPLIT_CANDIDATES = (2.0, 3.0, 4.0, 5.0, 10.0, 20.0)
GAP_TOLERANCE = 0.15


def day_edges(minute_bars: DataFrame) -> DataFrame:
    """(ticker, event_day, first_close, last_close, prev_last, raw_gap):
    first/last close of each trading day and the overnight gap vs the
    prior day's last close (W6/W7)."""
    edges = (
        minute_bars.withColumn("event_day", F.to_date("datetime"))
        .groupBy("ticker", "event_day")
        .agg(
            F.min_by("close", "datetime").alias("first_close"),
            F.max_by("close", "datetime").alias("last_close"),
        )
    )
    w = Window.partitionBy("ticker").orderBy("event_day")
    return edges.withColumn("prev_last", F.lag("last_close").over(w)).withColumn(
        "raw_gap", F.col("first_close") / F.col("prev_last")
    )


def guess_split_ratio(gap_col: str = "raw_gap") -> Column:
    """Snap an overnight gap to the nearest canonical split ratio within
    15% relative tolerance, else NULL (factor_builder.py:746-753).

    Mirrors the reference exactly, including its direction-insensitive
    quirk: gap 2.0 and gap 0.5 both yield ratio 2.0.
    """
    cands = ", ".join(f"{c}D" for c in SPLIT_CANDIDATES)
    inv_sql = f"(CASE WHEN {gap_col} > 1 THEN {gap_col} ELSE 1.0 / {gap_col} END)"
    nearest = F.expr(
        f"array_sort(transform(array({cands}), c -> struct(abs(c - {inv_sql}) AS d, c AS c)))[0].c"
    )
    gap, inv = F.col(gap_col), F.expr(inv_sql)
    ok = (
        gap.isNotNull()
        & (gap > 0)
        & (F.abs(inv - nearest) / nearest <= F.lit(GAP_TOLERANCE))
    )
    return F.when(ok, nearest)


def infer_gap_ratios(edges: DataFrame) -> DataFrame:
    """(ticker, event_day, ratio_guess) for days whose overnight gap
    looks like a split."""
    return (
        edges.withColumn("ratio_guess", guess_split_ratio("raw_gap"))
        .filter(F.col("ratio_guess").isNotNull())
        .select("ticker", "event_day", "ratio_guess")
    )


def merge_declared_with_inferred(declared: DataFrame, inferred: DataFrame) -> DataFrame:
    """Reconcile declared per-day split ratios with gap-inferred ones
    (factor_builder.py:789-814), set-based:

    - a guess with no similar declared ratio in a ±1-day window is added
      (overriding any dissimilar declared ratio on that exact day);
    - a guess whose similar declared ratio sits on day+1 *moves* that
      ratio onto the gap day (the lake's observed reality wins on
      timing);
    - all other declared ratios pass through.

    ``declared``/``inferred``: (ticker, event_day, ratio[, _guess]).
    The reference applies guesses sequentially per ticker; this
    formulation is order-independent and identical whenever guesses
    don't overlap each other's windows (the practical case).
    """
    d = declared.select("ticker", F.col("event_day").alias("d_day"), "ratio")
    g = inferred.select("ticker", F.col("event_day").alias("g_day"), "ratio_guess")

    near = g.join(
        d,
        (g.ticker == d.ticker)
        & (F.datediff(F.col("d_day"), F.col("g_day")).between(-1, 1)),
        "left",
    ).select(
        g.ticker.alias("ticker"),
        "g_day",
        "ratio_guess",
        "d_day",
        "ratio",
    )
    per_guess = near.groupBy("ticker", "g_day", "ratio_guess").agg(
        F.max(
            F.when((F.col("ratio") / F.col("ratio_guess")).between(0.85, 1.15), 1).otherwise(0)
        ).alias("similar"),
        F.max(
            F.when(
                (F.datediff(F.col("d_day"), F.col("g_day")) == 1)
                & (F.abs(F.col("ratio") / F.col("ratio_guess") - 1) <= GAP_TOLERANCE),
                1,
            ).otherwise(0)
        ).alias("movable"),
    )
    # a guess is active when nothing similar was declared nearby, or
    # when the similar declared ratio sits on day+1 (then it moves)
    active = per_guess.filter((F.col("similar") == 0) | (F.col("movable") == 1))
    adds = active.select(
        "ticker", F.col("g_day").alias("event_day"), F.col("ratio_guess").alias("ratio")
    )
    drop_same = active.select("ticker", F.col("g_day").alias("event_day"))
    drop_next = active.filter((F.col("similar") == 1) & (F.col("movable") == 1)).select(
        "ticker", F.date_add("g_day", 1).alias("event_day")
    )
    keep = declared.join(
        drop_same.unionByName(drop_next), ["ticker", "event_day"], "left_anti"
    )
    return keep.unionByName(adds)
