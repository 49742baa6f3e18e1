"""Watermarked stream-stream interval join (event attribution).

The two-unbounded-inputs join every event pipeline eventually needs —
"which click followed which impression within N minutes" — expressed
as Spark's native stream-stream join so BOTH sides' buffered state is
watermark-bounded:

- Each side declares an event-time watermark; the join condition pairs
  the equality key with a time-range constraint
  (``right_ts`` in ``[left_ts, left_ts + within]``). Spark derives a
  state-eviction bound from the two (a row is held only until the
  other side's watermark passes its last possible match time), so
  state is O(events per horizon), never O(stream so far) — the only
  shape that survives an unbounded 100 TB/day stream. Without the
  range constraint Spark would have to buffer both sides forever.
- ``how="inner"`` emits matches as they are found (per micro-batch).
- ``how="left_outer"`` additionally emits each unmatched left row
  exactly once, with NULL right columns, AFTER the watermark proves no
  match can still arrive — the "impressions that never converted"
  feed; downstream sees a complete, append-only attribution log.

Right-side columns are prefixed (default ``r_``) so the joined schema
never collides regardless of the input schemas.

Reference scope: the reference pipeline joins bar streams to
reference-data snapshots only in batch (SURVEY §2 J-family); the
streaming twin is part of the beyond-reference streaming layer.
Verified by ``tests/test_join_stream.py``: in-window match,
out-of-window non-match, exactly-once outer emission after watermark
passage, checkpointed restart, and batch-equivalence of the inner join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + within]``; state bounded by ``watermark``.

    Works identically on batch DataFrames (same plan, minus state) —
    used by the tests to assert batch/stream parity.
    """
    lhs = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rhs = right
    for c in right.columns:
        rhs = rhs.withColumnRenamed(c, right_prefix + c)
    r_ts = right_prefix + right_ts
    if rhs.isStreaming:
        rhs = rhs.withWatermark(r_ts, watermark)
    cond = (
        (F.col(key) == F.col(right_prefix + key))
        & (F.col(r_ts) >= F.col(left_ts))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lhs.join(rhs, cond, how)
