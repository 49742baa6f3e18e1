"""Watermarked tumbling-window aggregation over an event stream.

The streaming twin of the batch ``events_tumbling_hourly`` registry
query (reference: the per-day/per-hour rollups the ingest pipeline
derives from bar streams): counts and value sums per (hour window,
event type), with late data handled by an event-time watermark instead
of batch-job re-runs.

Semantics (Structured Streaming's standard model):

- The watermark trails the max observed event time by the configured
  delay; state for a window is kept until the watermark passes the
  window end, so events later than the delay are dropped — the
  explicit, bounded-state trade a 100 TB/day stream needs (unbounded
  lateness means unbounded state).
- In append output mode a window row is emitted exactly once, when the
  watermark finalizes it — downstream sinks (the parquet lake) never
  see partial aggregates, so the lake stays idempotent without
  merge-on-read bookkeeping.

Scale shape: one keyed shuffle per micro-batch on (window, key) with
map-side partial aggregation; state store size = active windows x keys,
bounded by the watermark horizon. No Python UDFs anywhere — the whole
pipeline is JVM window/agg expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-by-key: drop re-delivered events across
    micro-batches (at-least-once sources — REST pollers, file
    re-drops — become exactly-once downstream).

    The watermark bounds the dedup state: a key's fingerprint is kept
    until the watermark passes its event time, so replays inside the
    lateness horizon are suppressed while state stays
    O(keys per horizon) instead of O(all keys ever) — the only shape
    that survives an unbounded stream.

    Uses ``dropDuplicatesWithinWatermark`` (Spark >= 3.5): plain
    ``dropDuplicates`` only evicts state when the event-time column is
    itself part of the dedup key, so keying on ``event_id`` alone would
    accumulate one fingerprint per key forever despite the watermark —
    the exact unbounded-state failure this operator exists to prevent.
    """
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def tumbling_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str | None = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-(tumbling window, key) count and rounded value sum with an
    event-time watermark bounding lateness and state.

    Pass ``watermark_delay=None`` when the stream already carries a
    watermark (e.g. chained after :func:`dedup_stream`): Spark allows
    multiple stateful operators in one query but forbids redefining the
    watermark mid-pipeline."""
    if watermark_delay is not None:
        stream = stream.withWatermark(ts_col, watermark_delay)
    return (
        stream.groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )


def session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session aggregation with Spark's NATIVE
    ``session_window`` — sessions close after ``gap`` of inactivity and
    emit exactly once when the watermark passes their end.

    This is the JVM-native twin of ``sessionize_stream`` (the
    ``applyInPandasWithState`` operator): for the common
    count/sum-per-session case the built-in session window keeps the
    whole pipeline in Tungsten state management — no Python workers, no
    Arrow hops, state merged by the engine (two sessions bridged by a
    late event merge automatically, which hand-rolled state must code
    for). Reach for the Pandas-state operator only when the per-session
    logic genuinely exceeds aggregation (custom eviction, model state).

    Returns (key, session_start, session_end, n, total_value), append
    mode.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap).alias("__s"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            key_col,
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            "n",
            "total_value",
        )
    )
