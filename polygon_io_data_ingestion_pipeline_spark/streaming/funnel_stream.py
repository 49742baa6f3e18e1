"""Streaming N-stage funnel: incremental per-user stage progression via
``applyInPandasWithState`` — the unbounded-feed counterpart of the
batch ``operators/funnel.py`` (same strictly-after,
min-after-predecessor semantics, property-tested against it).

State per user = the completion time of each stage reached so far
(fixed-length list, nulls past the frontier). Each micro-batch:

- the user's new events merge into the walk in event-time order;
- a stage completes at the first event of its type strictly AFTER the
  previous stage's completion time — identical to the batch operator,
  so replaying the same events through either path gives the same
  per-user stage times;
- every touched user emits a snapshot row (update-mode consumers always
  see the latest deepest stage).

Out-of-order caveat, stated honestly: like any state machine fed
incrementally, a stage-k event that arrives in a LATER micro-batch than
a stage-(k+1) event it should have preceded can produce a different
walk than the batch replay (the batch operator sees all events sorted).
Within a micro-batch events are sorted before the walk, so ordinary
micro-batch jitter is absorbed; cross-batch regressions need the batch
path (T2-style overwrite re-run), exactly like the reference handles
late corrections.

Scale shape: one keyed shuffle per micro-batch on the user key; state
is O(active users) x N stage slots; Arrow-batched per group like every
Pandas surface in this repo.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def funnel_stream(
    events: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming DataFrame of per-key funnel snapshots
    ``(<key_col>, deepest_stage, ts_1 .. ts_N as epoch-ns longs)`` —
    the key column keeps the input's name and type. Write with
    ``outputMode("update")``.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    n = len(stages)
    # The output key column mirrors the INPUT key column in both name
    # and type — hardcoding "user_id bigint" would break any stream
    # keyed by a string session id (or mislabel an integer custom key).
    key_sql = events.schema[key_col].dataType.simpleString()
    key_np = {"bigint": "int64", "int": "int32", "smallint": "int16"}.get(
        key_sql, "object"
    )
    out_schema = f"{key_col} {key_sql}, deepest_stage int, " + ", ".join(
        f"ts_{i} bigint" for i in range(1, n + 1)
    )
    state_schema = ", ".join(f"t{i} bigint" for i in range(1, n + 1))
    stage_list = list(stages)

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        times: list = list(state.get) if state.exists else [None] * n

        evs: list[tuple[int, str]] = []
        for pdf in pdfs:
            evs.extend(
                zip(pdf[ts_col].astype("int64").tolist(), pdf[type_col].tolist())
            )
        evs.sort()
        for ts, etype in evs:
            # find the first incomplete stage this event can complete
            for i, stage in enumerate(stage_list):
                if times[i] is not None:
                    continue
                prev = times[i - 1] if i else None
                if etype == stage and (i == 0 or (prev is not None and ts > prev)):
                    times[i] = ts
                break  # only the frontier stage is eligible

        if times[0] is not None:
            state.update(tuple(times))
            deepest = max(i + 1 for i, t in enumerate(times) if t is not None)
            yield pd.DataFrame(
                {
                    key_col: pd.array([uid], dtype=key_np),
                    "deepest_stage": pd.array([deepest], dtype="int32"),
                    **{
                        f"ts_{i + 1}": pd.array([times[i]], dtype="Int64")
                        for i in range(n)
                    },
                }
            )
        else:
            yield pd.DataFrame(
                {
                    key_col: pd.array([], dtype=key_np),
                    "deepest_stage": pd.array([], dtype="int32"),
                    **{f"ts_{i + 1}": pd.array([], dtype="Int64") for i in range(n)},
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
