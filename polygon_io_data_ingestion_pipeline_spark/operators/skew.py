"""Skew mitigation helpers.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers cover the two patterns AQE can't fix:

- :func:`salted_aggregate` — a grouped aggregation where a handful of
  hot keys (one mega-ticker, one viral document) would pin a single
  reducer. Two-level aggregation: partial-aggregate on (key, salt),
  then merge partials per key. Works for any algebraic aggregate you
  can express as (partial, merge) column pairs.
- :func:`salted_broadcast_left` — replicate a small-but-hot build side
  ``salt_n`` times so a skewed probe side spreads over ``salt_n`` tasks
  even under a shuffle join (when the build side is too big to
  broadcast outright).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_n: int = 16,
) -> DataFrame:
    """Two-level grouped aggregation over a salted key.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    partial columns per keys. Example — a skew-proof sum/count/avg::

        salted_aggregate(
            df, ["ticker"],
            partial_aggs={"s": F.sum("v"), "c": F.count("*")},
            merge_aggs={"total": F.sum("s"), "rows": F.sum("c")},
        )
    """
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_n).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_broadcast_left(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the build side replicated across ``salt_n``
    salts so hot probe keys fan out over ``salt_n`` reducers.

    Only ``inner``/``left`` are valid: the build side exists ``salt_n``
    times, so right/outer joins would surface each unmatched build row
    once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted join supports inner|left, got {how!r}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias("__salt")
    build_rep = build.select("*", salts)
    probe_s = probe.withColumn("__salt", (F.rand(seed=11) * salt_n).cast("int"))
    out = probe_s.join(build_rep, [*on, "__salt"], how)
    return out.drop("__salt")
