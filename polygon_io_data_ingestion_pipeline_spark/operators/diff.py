"""Snapshot diff — the audit primitive for a versioned lake.

Given two snapshots of a keyed table (yesterday's corpus vs today's,
pre- vs post-backfill bars, two exports of the security master),
produce the exact change log: which keys were added, removed, or
changed, and for changed keys WHICH columns moved. This is the
verification step behind idempotent re-runs ("the backfill touched
only the intended partition"), takedown audits ("the doc is gone and
nothing else moved"), and corpus release notes.

Scale shape: one full-outer hash join on the key columns; per-column
comparison is map-side CASE expressions on the joined row; the common
``unchanged`` bulk is filtered out BEFORE any downstream sink.
Null-safe equality (``<=>``) throughout, so null -> value and
value -> null transitions count as changes and null == null does not.

Engine-portable: the changed-column list is a deterministic
alphabetically-ordered array of column names — no hashing, no floats
beyond the values themselves.

Reference scope: the reference diffs manifests to decide re-downloads
(SURVEY §2 S6/S15); this generalizes that to row- and column-level
content diffs. Verified by ``orders_snapshot_diff`` (full SQL oracle)
and ``tests/test_diff.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns one row per added / removed / changed key:
    ``(*key_cols, change_type, changed_cols array<string>)``.
    Unchanged keys are dropped. ``compare_cols`` defaults to every
    shared non-key column (alphabetical). Keys must be unique per
    snapshot (the lake's upsert/primary-key contract).
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = tuple(sorted(shared - set(key_cols)))

    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(1).alias("in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(1).alias("in_new"),
    )
    cond = None
    for k in key_cols:
        this = F.col(f"k_{k}").eqNullSafe(F.col(f"nk_{k}"))
        cond = this if cond is None else cond & this
    j = o.join(n, cond, "full_outer")

    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    change_type = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"k_{k}"), F.col(f"nk_{k}")).alias(k) for k in key_cols
    ]
    return (
        j.select(
            *keys,
            change_type.alias("change_type"),
            F.when(
                F.col("in_old").isNotNull() & F.col("in_new").isNotNull(), changed
            ).alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )
