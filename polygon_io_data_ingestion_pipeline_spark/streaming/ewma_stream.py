"""Stateful streaming EWMA: the online feature pipeline's smoother.

The batch engine smooths per-key series with ``bars.ewma``; this is the
streaming counterpart for unbounded feeds — each key's smoothed value
is carried as managed state between micro-batches, so the recurrence
``y = (1-alpha) * y_prev + alpha * x`` continues exactly where the last
batch left off instead of recomputing from history. The defining
property (pytest-pinned): streaming the data in ANY batch split yields
bit-identical smoothed values to one batch pass.

State per key is a single ``(last_ts, last_y)`` tuple in Spark's
checkpointed state store — O(active keys) state volume, restored on
restart. Events inside a micro-batch are sorted by event time (ties on
value, same determinism contract as the batch operator); late events
older than the state's ``last_ts`` are DROPPED with a flag counter
rather than silently corrupting the recurrence (an EWMA cannot be
retro-inserted without replaying the tail; the honest option is an
audited drop — the batch path is the replay tool).

Same ``applyInPandasWithState`` shape as the sessionizer: Arrow-batched
per group, one keyed shuffle per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = "key bigint, ts timestamp, value double, ewma double, late boolean"
_STATE_SCHEMA = "last_ts bigint, last_y double"


def ewma_stream(
    events: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key EWMA; write with ``outputMode("append")``.

    Emits one row per input event: ``(key, ts, value, ewma, late)``.
    ``late`` rows (event time <= the smoothed frontier from a previous
    batch) carry a NULL ewma and did not advance the state.
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            last_ts, last_y = state.get
            if last_y is not None and last_y != last_y:
                # NaN sentinel: frontier advanced but no numeric
                # observation yet (leading nulls only so far)
                last_y = None
        else:
            last_ts, last_y = None, None

        rows: list[tuple[int, float]] = []
        for pdf in pdfs:
            # NaT timestamps are unorderable (astype would mint a garbage
            # int and destabilize the sort) — drop them outright
            pdf = pdf[pdf[ts_col].notna()]
            rows.extend(
                zip(pdf[ts_col].astype("int64").tolist(), pdf[value_col].tolist())
            )
        rows.sort()
        out: list[tuple[Any, int, float, float | None, bool]] = []
        for t, x in rows:
            if last_ts is not None and t <= last_ts:
                out.append((k, t, x, None, True))
                continue
            if x is None or x != x:
                # null/NaN value: pandas ewm(ignore_na=True) semantics —
                # the smoothed series carries the prior value and the
                # recurrence does NOT advance (a NaN must never enter
                # state, or it would poison every later emission); the
                # event-time frontier still advances so replays of this
                # timestamp read as late.
                last_ts = t
                out.append((k, t, x, last_y, False))
                continue
            last_y = x if last_y is None else (1 - alpha) * last_y + alpha * x
            last_ts = t
            out.append((k, t, x, last_y, False))
        if last_ts is not None:
            state.update(
                (last_ts, float(last_y) if last_y is not None else float("nan"))
            )
        yield pd.DataFrame(
            {
                "key": pd.array([r[0] for r in out], dtype="int64"),
                "ts": pd.to_datetime([r[1] for r in out]),
                "value": pd.array([r[2] for r in out], dtype="float64"),
                "ewma": pd.array([r[3] for r in out], dtype="float64"),
                "late": pd.array([r[4] for r in out], dtype="bool"),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, EWMA_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
