"""Pin the driver CORRECTNESS window policy.

The external driver hash-verifies only the first ``DRIVER_WINDOW_SIZE``
registry entries, in iteration order.  Round 6 replaced the static deferral
list with a two-tier policy: ``PINNED_WINDOW`` anchors (one per operator
family, verified every round) plus history-aware rotation of everything
else, least-recently-externally-verified first.  These tests pin both tiers
and the rotation property itself.
"""

from polygon_io_data_ingestion_pipeline_spark.plans.queries import (
    DRIVER_WINDOW_SIZE,
    PINNED_WINDOW,
    REGISTRY,
    _external_green_history,
    rotation_order,
)


def window_names() -> list[str]:
    return list(REGISTRY)[:DRIVER_WINDOW_SIZE]


def test_pinned_anchors_inside_driver_window():
    window = set(window_names())
    missing = [n for n in PINNED_WINDOW if n not in window]
    assert not missing, f"pinned anchors fell out of the driver window: {missing}"


def test_pinned_list_leaves_rotation_room():
    # The pinned tier must stay ~half the window so rotation can cycle the
    # rest of the registry through external verification within a few
    # rounds.  32 is the hard ceiling; today it is 25.
    assert all(n in REGISTRY for n in PINNED_WINDOW)
    assert len(set(PINNED_WINDOW)) == len(PINNED_WINDOW)
    assert len(PINNED_WINDOW) <= 32


def test_window_slots_all_have_oracles():
    lacking = [n for n in window_names() if not REGISTRY[n].oracle]
    assert not lacking, f"windowed queries without oracle SQL: {lacking}"


def test_rotation_prioritizes_never_verified_queries():
    """With the committed CORRECTNESS history, every never-externally-green
    query that fits must occupy a rotation slot before any already-green
    query takes one."""
    hist = _external_green_history()
    names = list(REGISTRY)
    slots = DRIVER_WINDOW_SIZE - len([n for n in PINNED_WINDOW if n in REGISTRY])
    pool = rotation_order(names, hist)
    never = [n for n in pool if n not in hist]
    window = set(window_names())
    expected_in = never[:slots]
    missing = [n for n in expected_in if n not in window]
    assert not missing, f"never-verified queries displaced from window: {missing}"


def test_worst_case_verification_latency_bound():
    """Every registered query must earn an external driver row within
    ceil(pool / free_slots) rounds, and that bound — computed from the
    ACTUAL pool and window sizes, not a hardcoded estimate — must stay
    small enough (<= 4 rounds) that no query rests on the in-repo parity
    replica for long.  Growing the registry or the pinned tier past this
    bound requires consciously widening the window or trimming anchors."""
    import math

    pinned = [n for n in PINNED_WINDOW if n in REGISTRY]
    free_slots = DRIVER_WINDOW_SIZE - len(pinned)
    pool = len(REGISTRY) - len(pinned)
    assert free_slots > 0
    bound = math.ceil(pool / free_slots)
    assert bound <= 4, (
        f"worst-case external-verification latency is {bound} rounds "
        f"(pool={pool}, free_slots={free_slots}) — widen the window or "
        f"trim PINNED_WINDOW"
    )


def test_rotation_order_is_staleness_first():
    """Pure-function check with a synthetic history: never-green first (in
    registration order), then ascending last-green round."""
    names = list(REGISTRY)
    pool_all = [n for n in names if n not in set(PINNED_WINDOW)]
    a, b, c, d = pool_all[:4]
    hist = {a: 5, b: 2, c: 4}  # d never green
    order = rotation_order(names, hist)
    pos = {n: i for i, n in enumerate(order)}
    assert pos[d] < pos[b] < pos[c] < pos[a]
    # queries absent from hist keep registration order among themselves
    nevers = [n for n in order if n not in hist]
    assert nevers == [n for n in names if n in set(nevers)]


def test_registry_iteration_is_window_then_rotated_tail():
    """REGISTRY must iterate pinned anchors first, then the rotation pool in
    staleness order — so the driver's [0:50] slice IS the intended window."""
    hist = _external_green_history()
    names_now = list(REGISTRY)
    pinned = [n for n in PINNED_WINDOW if n in REGISTRY]
    expected = pinned + rotation_order(names_now, hist)
    assert names_now == expected


def test_coverage_doc_matches_registry_count():
    """COVERAGE.md's hand-written "N registered queries" line must state
    the actual registry size — it drifted 118 vs 120 in round 7."""
    import os
    import re

    from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY

    doc = open(
        os.path.join(os.path.dirname(__file__), os.pardir, "COVERAGE.md")
    ).read()
    m = re.search(r"\*\*(\d+) registered queries", doc)
    assert m, "COVERAGE.md no longer states the registered-query count"
    assert int(m.group(1)) == len(REGISTRY), (
        f"COVERAGE.md says {m.group(1)} queries; registry holds {len(REGISTRY)}"
    )
