"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

The batch engine already sessionizes with a lag-window over the full
table (plans/queries.py ``events_sessionize``); this is the streaming
counterpart for unbounded feeds, where the session must be carried as
managed state between micro-batches instead of recomputed from history:

- state per key = the open session ``(start, last_seen, n_events)``,
  held in Spark's state store (checkpointed, restored on restart);
- a new event within ``gap`` of ``last_seen`` extends the open session;
  a later event closes it (emitted with ``closed = true``) and opens a
  new one;
- every touched key also emits its current open-session snapshot
  (``closed = false``) — update-mode consumers always see the latest;
- data crosses the JVM/Python boundary Arrow-batched per group, like
  every other Pandas-UDF surface in this repo; state is a tiny tuple.

At 100 TB-feed scale this is the shape you want: state volume is
O(active keys), each micro-batch shuffles only its own events (hash on
the key), and skew lands on the state-store partitioning, which AQE
does not touch — so the key column should be pre-salted upstream if a
single entity dominates the feed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed boolean"
)
_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming DataFrame of session rows from a streaming event feed.

    ``events`` must be a streaming DataFrame with at least
    ``(key_col bigint, ts_col timestamp)``. Write the result with
    ``outputMode("update")``.
    """
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = None

        out: list[tuple[Any, int, int, int, bool]] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(pdf[ts_col].astype("int64").tolist())
        for t in sorted(ts_all):
            if start is None:
                start = last = t
                n = 1
            elif t - last <= gap_ns:
                last = max(last, t)
                n += 1
            else:
                out.append((uid, start, last, n, True))
                start = last = t
                n = 1
        if start is not None:
            state.update((start, last, n))
            out.append((uid, start, last, n, False))
        yield pd.DataFrame(
            {
                "user_id": pd.array([r[0] for r in out], dtype="int64"),
                "session_start": pd.to_datetime([r[1] for r in out]),
                "session_end": pd.to_datetime([r[2] for r in out]),
                "n_events": pd.array([r[3] for r in out], dtype="int64"),
                "closed": pd.array([r[4] for r in out], dtype="bool"),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
