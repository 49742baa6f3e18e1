"""Distributed as-of join.

Reproduces ``pandas.merge_asof`` semantics (reference:
legacy_scripts/factor_builder.py:261-267, 320-326, 781-785, 888-892 —
``direction="forward", allow_exact_matches=True`` snapping corporate
events to the next observed trading day) as a pure DataFrame plan:

1. Union left probes and right references into one relation, tagged by
   side, carrying the right payload as a struct whose FIRST field is the
   ordering key.
2. One window per ``by`` partition ordered by ``(on, side)``:
   ``min(payload) over (current row .. unbounded following)`` finds the
   nearest following right row (struct ordering is lexicographic, and
   every row in the frame has on >= current on). Backward direction uses
   ``max`` over the preceding frame.
3. Keep left rows, unpack the struct.

Cost model: a single hash shuffle on ``by`` + one sort — the same price
as any windowed computation; no per-group Python, no broadcast of the
event table, no skew beyond what the keys already have. This scales to
arbitrarily many groups (the reference runs one pandas program per id in
a process pool; here the ids are just window partitions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    direction: str = "forward",
    allow_exact_matches: bool = True,
    right_prefix: str = "asof_",
    how: str = "left",
    tiebreaker: str | None = None,
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join ``left`` to the nearest ``right`` row per ``by`` group.

    Every non-key column of ``right`` is attached to matching left rows
    with ``right_prefix`` prepended; the matched ordering key itself is
    exposed as ``<right_prefix><on>``. ``how='inner'`` drops unmatched
    left rows (the reference's ``.dropna(subset=['event_day'])``).

    Duplicate ``on`` values within a ``by`` group: by default ties
    resolve by lexicographic comparison of the remaining payload fields
    (NULL fields sort first) — deterministic but NOT pandas'
    positional rule. Pass ``tiebreaker`` (a right column holding each
    row's position) to reproduce ``pandas.merge_asof`` exactly: it is
    placed as the struct's second field, so ``forward`` (min) keeps the
    positionally FIRST duplicate and ``backward`` (max) the positionally
    LAST — pandas' documented behavior.

    ``tolerance`` (pandas ``merge_asof(tolerance=...)``): a match
    further than this from the probe (in ``on`` units — use a numeric
    ordering key such as epoch micros) is treated as no match. Applied
    as a map-side post-filter on the matched key, so it adds zero
    shuffles; with ``how='inner'`` out-of-tolerance rows drop.
    """
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative")
    if direction not in ("forward", "backward"):
        raise ValueError(f"direction must be forward|backward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)

    payload_cols = [c for c in right.columns if c not in by]
    if on not in payload_cols:
        raise ValueError(f"right side must contain ordering column {on!r}")
    if tiebreaker is not None and tiebreaker not in payload_cols:
        raise ValueError(f"right side must contain tiebreaker column {tiebreaker!r}")
    # First struct field MUST be the ordering key: min/max over the
    # struct then means "nearest by `on`"; the optional tiebreaker comes
    # second so it decides among same-`on` duplicates before any other
    # payload field is compared.
    ordered = [on] + ([tiebreaker] if tiebreaker else []) + [
        c for c in payload_cols if c not in (on, tiebreaker)
    ]
    payload = F.struct(*[F.col(c).alias(c) for c in ordered])

    # Side ordering controls exact-match visibility: the frame is
    # row-based (currentRow..following for forward, preceding..currentRow
    # for backward), so a right row at the same `on` is visible to a
    # left row iff it sorts inside that frame — AFTER the left row for
    # forward matches, BEFORE it for backward.
    if direction == "forward":
        right_side, left_side = (1, 0) if allow_exact_matches else (0, 1)
    else:
        right_side, left_side = (0, 1) if allow_exact_matches else (1, 0)

    payload_type = right.select(payload.alias(_PAYLOAD)).schema[0].dataType
    l_tag = left.withColumn(_SIDE, F.lit(left_side)).withColumn(
        _PAYLOAD, F.lit(None).cast(payload_type)
    )
    r_tag = (
        right.select(*by, F.col(on), payload.alias(_PAYLOAD))
        .withColumn(_SIDE, F.lit(right_side))
        .withColumn("__is_right", F.lit(1))
    )
    unioned = l_tag.withColumn("__is_right", F.lit(0)).unionByName(
        r_tag, allowMissingColumns=True
    )

    w = Window.partitionBy(*by).orderBy(F.col(on), F.col(_SIDE))
    if direction == "forward":
        matched = F.min(_PAYLOAD).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    else:
        matched = F.max(_PAYLOAD).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    out = (
        unioned.withColumn("__match", matched)
        .filter(F.col("__is_right") == 0)
        .drop(_PAYLOAD, _SIDE, "__is_right")
    )
    match_col = F.col(f"__match.{on}")
    if tolerance is not None:
        gap = (match_col - F.col(on)) if direction == "forward" else (F.col(on) - match_col)
        keep = match_col.isNotNull() & (gap <= F.lit(tolerance))
    else:
        keep = F.lit(True)
    out = out.select(
        *left.columns,
        F.when(keep, match_col).alias(f"{right_prefix}{on}"),
        *[
            F.when(keep, F.col(f"__match.{c}")).alias(f"{right_prefix}{c}")
            for c in payload_cols
            if c != on
        ],
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{on}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be left|inner, got {how!r}")
    return out
