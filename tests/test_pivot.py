"""Pivot/unpivot reshaping: wide counts match the long groupBy, the
stack() melt round-trips exactly, and the explicit value list keeps the
plan free of a distinct-discovery job."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.plans.queries import (
    _EVENT_TYPES,
    REGISTRY,
)


def test_pivot_matches_long_counts_and_melts_back(spark, sf_dir):
    wide = REGISTRY["events_type_pivot"].fn(spark, sf_dir)

    from polygon_io_data_ingestion_pipeline_spark.sources import table

    long_counts = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wide_rows = wide.collect()
    for r in wide_rows:
        for t in _EVENT_TYPES:
            assert r[f"n_{t}"] == long_counts.get((r["user_id"], t), 0)

    # melt (unpivot) back to long form via stack(): the inverse reshape
    stack_expr = "stack({n}, {args}) AS (event_type, n)".format(
        n=len(_EVENT_TYPES),
        args=", ".join(f"'{t}', n_{t}" for t in _EVENT_TYPES),
    )
    melted = wide.select("user_id", F.expr(stack_expr)).filter(F.col("n") > 0)
    got = {(r["user_id"], r["event_type"]): r["n"] for r in melted.collect()}
    assert got == long_counts


def test_pivot_plan_shape(spark, sf_dir):
    """The pinned value list must not trigger the implicit pivot's
    distinct-values discovery JOB (a separate collect before planning);
    the plan itself is Spark's standard two-stage pivot — a (user,type)
    partial-agg count then a pivotfirst re-key on user — both map-side
    combined, and nothing Python."""
    wide = REGISTRY["events_type_pivot"].fn(spark, sf_dir)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "pivotfirst" in plan and "partial_pivotfirst" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
