"""Distributed exact rank / percent-rank transform.

``rank() OVER (ORDER BY value)`` is the classic feature-engineering
normalization (quantile/rank-gauss inputs, percentile scores) and the
classic scale trap: a global ORDER BY window funnels every row through
ONE reducer. The standard fix, implemented here: one
``approx_percentile`` sketch pass yields ~``n_buckets`` cut points that
ride as literals; each row maps to its value-range bucket map-side;
exact ranking then runs per bucket (parallelism = bucket count), and
per-bucket row counts (a tiny frame) prefix-sum into global offsets —
``global rank = bucket offset + within-bucket rank``, EXACT because
equal values always share a bucket (the bucket is a function of the
value) and buckets are value-ordered.

Same two-level discipline as ``sequence_packing`` and
``token_budget_mixture``; the sketch only balances work, never affects
the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, value, rank, pct_rank) with SQL ``rank()`` tie semantics
    (equal values share the rank of their first position) and
    ``percent_rank()`` = (rank - 1) / (n - 1). Null values are excluded
    (SQL window functions would sort them to an engine-chosen end;
    callers decide their policy explicitly)."""
    src = df.select(F.col(id_col), F.col(value_col)).filter(
        F.col(value_col).isNotNull()
    )
    pcts = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = src.select(
        F.expr(
            f"approx_percentile(CAST({value_col} AS DOUBLE), "
            f"array({', '.join(str(p) for p in pcts)}))"
        ).alias("c")
    ).first()
    cuts = sorted({float(x) for x in (cuts_row["c"] or [])})
    if cuts:
        lits = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in cuts)
        bucket = F.expr(
            f"size(filter(array({lits}), t -> t < CAST({value_col} AS DOUBLE)))"
        )
    else:
        bucket = F.lit(0)
    keyed = src.withColumn("__bucket", bucket)

    # localCheckpoint: the counts frame shares keyed's lineage with the
    # ranking branch below; without severing it the self-join can hit
    # ambiguous-attribute resolution (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    # observed). It is <= n_buckets rows — materializing is free.
    counts = (
        keyed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n")).localCheckpoint()
    )
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    # the offsets window is global but runs on <= n_buckets rows
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__bucket", "__offset")

    w_in = Window.partitionBy("__bucket").orderBy(value_col)
    ranked = (
        keyed.withColumn("__r_in", F.rank().over(w_in))
        .join(F.broadcast(offsets), "__bucket")
        .withColumn("rank", (F.col("__offset") + F.col("__r_in")).cast("long"))
    )
    total = src.count()
    denom = max(total - 1, 1)
    return ranked.select(
        id_col,
        value_col,
        "rank",
        F.round((F.col("rank") - 1) / F.lit(float(denom)), 6).alias("pct_rank"),
    )


def distributed_ntile(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_tiles: int = 10,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, value, tile) with SQL ``ntile(n) OVER (ORDER BY value, id)``
    semantics — equal-count bins (sizes differ by at most one, larger
    bins first), deterministic via the id tiebreak, computed without the
    single-reducer global window: the same value-range bucketing as
    :func:`distributed_rank` yields an exact global row_number, and the
    tile is pure arithmetic on it (NTILE's remainder rule: the first
    ``total % n`` tiles hold ``total//n + 1`` rows).

    Ties ON THE BUCKET BOUNDARY are safe: row_number's (value, id)
    order is total, so the decomposition is exact regardless of where
    equal values fall. Nulls are excluded, as in distributed_rank."""
    src = df.select(F.col(id_col), F.col(value_col)).filter(
        F.col(value_col).isNotNull()
    )
    pcts = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = src.select(
        F.expr(
            f"approx_percentile(CAST({value_col} AS DOUBLE), "
            f"array({', '.join(str(p) for p in pcts)}))"
        ).alias("c")
    ).first()
    cuts = sorted({float(x) for x in (cuts_row["c"] or [])})
    if cuts:
        lits = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in cuts)
        bucket = F.expr(
            f"size(filter(array({lits}), t -> t < CAST({value_col} AS DOUBLE)))"
        )
    else:
        bucket = F.lit(0)
    keyed = src.withColumn("__bucket", bucket)
    counts = (
        keyed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n")).localCheckpoint()
    )
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__bucket", "__offset")
    w_in = Window.partitionBy("__bucket").orderBy(value_col, id_col)
    rn = (
        keyed.withColumn("__r_in", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__bucket")
        .withColumn("__rn", (F.col("__offset") + F.col("__r_in")).cast("long"))
    )
    total = src.count()
    q, r = divmod(total, n_tiles)
    boundary = r * (q + 1)
    if q == 0:
        tile = F.col("__rn")  # fewer rows than tiles: one row per tile
    else:
        tile = F.when(
            F.col("__rn") <= boundary,
            ((F.col("__rn") - 1) / F.lit(q + 1)).cast("long") + 1,
        ).otherwise(F.lit(r) + ((F.col("__rn") - 1 - boundary) / F.lit(q)).cast("long") + 1)
    return rn.select(id_col, value_col, tile.cast("int").alias("tile"))
