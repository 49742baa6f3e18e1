"""Cohort retention analysis: the product-analytics rollup every event
warehouse serves (users grouped by first-seen period; how many return
k periods later), expressed as two keyed aggregations and one join —
no per-user iteration, no driver-side matrix assembly.

Scale shape: first-seen is one groupBy on the user key; the activity
set is a map-side truncation + per-(user, period) dedup riding the
same shuffle; the matrix is a groupBy on (cohort, offset) — cardinality
O(periods²), tiny. The only join is user-keyed and AQE-handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    period_days: int = 7,
) -> DataFrame:
    """(cohort, week_offset, n_active, cohort_size, retention): for each
    first-seen cohort period, how many of its users were active k
    periods later. ``retention`` is rounded so audits compare exactly;
    offset 0 is the cohort itself (retention 1.0 by construction)."""
    per = F.date_trunc(period, F.col(ts_col)).cast("date")
    act = df.select(F.col(user_col).alias("u"), per.alias("p")).distinct()
    first = act.groupBy("u").agg(F.min("p").alias("cohort"))
    joined = act.join(first, "u").select(
        "u",
        "cohort",
        (F.datediff(F.col("p"), F.col("cohort")) / period_days).cast("int").alias("week_offset"),
    )
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    matrix = joined.groupBy("cohort", "week_offset").agg(
        F.count_distinct("u").alias("n_active")
    )
    return (
        matrix.join(sizes, "cohort")
        .select(
            F.col("cohort").cast("string").alias("cohort"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )
