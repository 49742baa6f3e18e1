"""N-stage ordered funnel analysis over an event stream.

A funnel is an ordered list of event types (e.g. signup -> click ->
purchase); a user completes stage i at the FIRST event of that type
that happens strictly AFTER their stage-(i-1) completion time. This is
the staged conversion rollup every event-analytics stack ships, and
each stage transition is the as-of-forward pattern of SURVEY §2.3 J2
(min-after-predecessor) applied to a stream.

Scale shape: one filtered partial-aggregated min per stage plus one
equi join per stage on the user key — all shuffles are on ``user_col``,
so with N stages the whole funnel is N keyed shuffles over
progressively SHRINKING frames (stage i only scans events of type i
joined against stage-(i-1) survivors). No windows over unbounded
partitions, no driver-side state; the per-user completion frame is one
row per stage-1 user.

Generalizes the hard-coded 3-stage query that shipped first
(plans/queries.py events_funnel_conversion, now a call into this
module); semantics are property-tested against a per-user pandas/python
oracle in tests/test_funnel.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Per-user stage completion times for an ordered stage list.

    Returns one row per user who completed stage 1, with columns
    ``(user_col, ts_1, ..., ts_N)`` — ``ts_i`` is the first time the
    user completed stage i (strictly after ``ts_{i-1}``), null once the
    funnel was abandoned. Stage names may repeat (e.g. click -> click
    counts a second, later click).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = events.select(
        F.col(user_col), F.col(type_col).alias("__t"), F.col(ts_col).alias("__ts")
    )
    cur = (
        ev.filter(F.col("__t") == stages[0])
        .groupBy(user_col)
        .agg(F.min("__ts").alias("ts_1"))
    )
    out = cur
    for i, stage in enumerate(stages[1:], start=2):
        prev = f"ts_{i - 1}"
        cur = (
            ev.filter(F.col("__t") == stage)
            .join(cur.select(user_col, prev), user_col)
            .filter(F.col("__ts") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"ts_{i}"))
        )
        out = out.join(cur.select(user_col, f"ts_{i}"), user_col, "left")
    return out


def funnel_conversion(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Funnel rollup: ``(stage, n_users)`` where ``stage`` is the
    DEEPEST stage each stage-1 user reached (1..N). Users who never
    completed stage 1 don't appear — the funnel's denominator is its
    entry population, matching the hand-written 3-stage original."""
    per_user = funnel_user_stages(events, stages, user_col, type_col, ts_col)
    deepest = F.lit(1)
    for i in range(2, len(stages) + 1):
        deepest = F.when(F.col(f"ts_{i}").isNotNull(), F.lit(i)).otherwise(deepest)
    return (
        per_user.select(deepest.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
