"""Interval overlap join — the range join Spark lacks a fast native
strategy for.

A naive ``l.join(r, (ls <= re) & (rs <= le))`` has no equi key, so
Spark plans BroadcastNestedLoopJoin (or a cartesian product): per-pair
work, the classic silent scale-killer the moment neither side fits in
a broadcast. The scale-correct shape is bucketization: quantize time
into fixed-width buckets, explode each interval over the buckets it
covers, equi-join on the bucket (one linear hash shuffle, AQE-split
hot buckets), and verify the exact overlap predicate.

Duplicate suppression is structural, not a ``distinct``: an
overlapping pair can share many buckets, but both intervals always
cover ``max(l_start, r_start)`` (the overlap's first instant), so the
pair is emitted only in THAT bucket — every overlap appears exactly
once with no dedup shuffle.

``bucket_width`` trades explode fan-out (``(len / width) + 1`` rows
per interval) against join selectivity; set it near the typical
interval length. All arithmetic is integer (epoch micros), so results
are engine-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (left row, right row) pairs whose closed integer intervals
    [l_start, l_end] and [r_start, r_end] overlap. Column names of the
    two inputs must be disjoint; start/end columns are integral (epoch
    micros, day numbers, ...)."""
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"overlapping column names: {sorted(dup)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = int(bucket_width)

    def buckets(s: str, e: str):
        return F.explode(
            F.sequence(
                F.floor(F.col(s) / w).cast("long"), F.floor(F.col(e) / w).cast("long")
            )
        )

    lb = left.withColumn("__bucket", buckets(l_start, l_end))
    rb = right.withColumn("__bucket", buckets(r_start, r_end))
    anchor = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / w).cast("long")
    return (
        lb.join(rb, "__bucket")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__bucket") == anchor)
        )
        .drop("__bucket")
    )
