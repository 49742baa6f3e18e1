"""N-stage funnel operator vs a per-user python oracle, property-style:
random event streams (duplicate timestamps, repeated stage names,
missing stages, out-of-order delivery) must match a sequential
per-user walk of the funnel semantics."""

from __future__ import annotations

import random

from polygon_io_data_ingestion_pipeline_spark.operators.funnel import (
    funnel_conversion,
    funnel_user_stages,
)


def _oracle_user_stages(events, stages):
    """Sequential per-user oracle: for each user, walk their events in
    time order; stage i completes at the first event of that type
    strictly after stage i-1's completion time."""
    by_user: dict[int, list] = {}
    for uid, etype, ts in events:
        by_user.setdefault(uid, []).append((ts, etype))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        times: list = []
        prev = None
        for stage in stages:
            nxt = None
            for ts, etype in evs:
                if etype == stage and (prev is None or ts > prev):
                    nxt = ts
                    break
            times.append(nxt)
            if nxt is None:
                break
            prev = nxt
        if times[0] is not None:
            times += [None] * (len(stages) - len(times))
            out[uid] = times
    return out


def _random_events(rng, n_users, n_events, types):
    return [
        (
            rng.randrange(n_users),
            rng.choice(types),
            rng.randrange(20),  # small range -> plenty of ts collisions
        )
        for _ in range(n_events)
    ]


def _run_case(spark, events, stages):
    df = spark.createDataFrame(
        events, "user_id long, event_type string, ts_us long"
    ).repartition(5)
    got_stages = {
        r["user_id"]: [r[f"ts_{i}"] for i in range(1, len(stages) + 1)]
        for r in funnel_user_stages(df, stages).collect()
    }
    want = _oracle_user_stages(events, stages)
    assert got_stages == want

    got_conv = {
        r["stage"]: r["n_users"] for r in funnel_conversion(df, stages).collect()
    }
    want_conv: dict[int, int] = {}
    for times in want.values():
        deepest = max(i + 1 for i, t in enumerate(times) if t is not None)
        want_conv[deepest] = want_conv.get(deepest, 0) + 1
    assert got_conv == want_conv


def test_funnel_matches_oracle_random_streams(spark):
    rng = random.Random(42)
    types = ["signup", "click", "view", "purchase"]
    for trial in range(6):
        events = _random_events(rng, n_users=12, n_events=150, types=types)
        _run_case(spark, events, ["signup", "click", "purchase"])


def test_funnel_four_stages_and_repeated_stage_name(spark):
    rng = random.Random(7)
    types = ["a", "b", "c"]
    events = _random_events(rng, n_users=10, n_events=200, types=types)
    # 4 stages incl. a repeated name: the second 'b' needs a later b.
    _run_case(spark, events, ["a", "b", "b", "c"])


def test_funnel_strictly_after_excludes_ties(spark):
    # click at the exact signup timestamp must NOT count (strict >).
    events = [(1, "signup", 5), (1, "click", 5), (2, "signup", 5), (2, "click", 6)]
    _run_case(spark, events, ["signup", "click"])


def test_funnel_entry_population_only(spark):
    # users with no stage-1 event never appear, even with later stages
    events = [(1, "click", 3), (1, "purchase", 4), (2, "signup", 1)]
    _run_case(spark, events, ["signup", "click", "purchase"])
