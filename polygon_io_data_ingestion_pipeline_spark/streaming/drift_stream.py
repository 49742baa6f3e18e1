"""Streaming distribution-drift monitor: PSI of each event-time window
against a FROZEN reference snapshot.

The batch :mod:`..operators.drift` answers "did this refresh drift?";
the streaming twin answers it continuously — each finalized tumbling
window of the live stream is compared against the reference
distribution, emitting one PSI row per window that a sink can alert
on. This is the feed-quality tripwire in front of a training-data
lake: an upstream format change, a bot flood, or a mis-tagged source
shifts the value distribution long before any row-level rule fires.

Scale/state shape: the reference collapses to O(buckets) shares ONCE,
driver-side, and rides every micro-batch as literals — no
stream-static join, no state for the reference. The live side is ONE
watermarked tumbling-window aggregation whose per-bucket counts are
conditional-sum columns (buckets are a fixed literal set, so no
second stateful aggregation is needed — chained streaming aggs are
what Structured Streaming forbids). PSI is then map-side arithmetic
on the finalized one-row-per-window output. Append mode: each window
emits exactly once, when the watermark closes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.drift import _bucket


def psi_stream(
    stream: DataFrame,
    reference: DataFrame,
    value_col: str,
    edges: list[float],
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
    ts_col: str = "ts",
    alert_threshold: float = 0.25,
) -> DataFrame:
    """Per-window PSI of ``stream[value_col]`` vs the frozen
    ``reference`` distribution, bucketed by literal ``edges``.

    Returns an append-mode streaming frame
    (window_start, psi, n_cur, drifted) — one row per finalized
    window, same smoothing and rounding as the batch operator
    (:func:`..operators.drift.psi_numeric`) so thresholds transfer.
    """
    buckets = [-1] + list(range(len(edges) + 1))
    k = len(buckets)
    ref_counts = {
        r["b"]: r["c"]
        for r in reference.select(_bucket(value_col, edges).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    rt = sum(ref_counts.values())
    # Laplace +1 over the FULL bucket universe, like the batch operator
    # (its k counts only observed buckets; here the universe is fixed by
    # the edges, which also keeps a live bucket the reference never saw
    # finite).
    p = {b: (ref_counts.get(b, 0) + 1) / (rt + k) for b in buckets}

    # Group on the window STRUCT (extracting .start before the groupBy
    # severs the watermark linkage and Spark rejects append mode);
    # window_start is projected afterwards.
    win = (
        stream.withWatermark(ts_col, watermark_delay)
        .withColumn("__b", _bucket(value_col, edges))
        .groupBy(F.window(ts_col, window_duration).alias("__w"))
        .agg(
            F.count("*").alias("n_cur"),
            *[
                F.sum((F.col("__b") == b).cast("long")).alias(f"__c{i}")
                for i, b in enumerate(buckets)
            ],
        )
        .withColumn("window_start", F.col("__w.start"))
    )
    psi: Column | None = None
    for i, b in enumerate(buckets):
        q = (F.col(f"__c{i}") + 1) / (F.col("n_cur") + k)
        term = F.round((F.lit(p[b]) - q) * F.round(F.log(F.lit(p[b]) / q), 6), 9)
        psi = term if psi is None else psi + term
    psi = F.round(psi, 6)
    return win.select(
        "window_start",
        psi.alias("psi"),
        "n_cur",
        (psi >= alert_threshold).cast("int").alias("drifted"),
    )
