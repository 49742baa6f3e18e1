"""Distribution drift between two dataset snapshots (reference vs
current): the Population Stability Index, the audit every recurring
training-data refresh runs before a new crawl/feed slice is allowed to
join the corpus (and the monitoring metric for feature pipelines).

PSI = sum over buckets of (p_i - q_i) * ln(p_i / q_i), with the
conventional reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
drifted.

Scale shape: bucket assignment is a map-side literal-array fold (the
same shape as the Z-order rank), each side then collapses to ONE
per-bucket count aggregation — two partial-agg shuffles total,
O(buckets) rows after. The join/smoothing/PSI math runs on the tiny
bucket table. Nothing driver-side but the bucket edges themselves
(production: derive them once from the reference with
``approx_quantiles`` in :mod:`.sketches`; pass literal edges for
audit-reproducible runs).

Engine-exactness: shares are exact-integer counts with +1 Laplace
smoothing (so empty buckets neither divide by zero nor blow up the
log); each bucket's ln is quantized to 6 decimals before the
multiply, PSI terms are quantized and summed as scaled BIGINTs — the
repo's standard oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(value_col: str, edges: list[float]) -> Column:
    """Bucket index 0..len(edges): count of edges <= value, as one
    literal-array expression (map-side, codegen-friendly). NULLs land
    in their own bucket -1 so they are tracked, not dropped."""
    lits = ", ".join(f"CAST({float(e)!r} AS DOUBLE)" for e in edges)
    return F.expr(
        f"CASE WHEN {value_col} IS NULL THEN -1 "
        f"ELSE size(filter(array({lits}), t -> t <= CAST({value_col} AS DOUBLE))) END"
    ).cast("int")


def psi_numeric(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    edges: list[float],
    feature: str | None = None,
) -> DataFrame:
    """One-row PSI report for a numeric column, bucketed by literal
    ``edges``: (feature, psi, n_buckets, n_ref, n_cur, drifted)."""
    rb = (
        ref.select(_bucket(value_col, edges).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("rc"))
    )
    cb = (
        cur.select(_bucket(value_col, edges).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cc"))
    )
    return _psi_from_counts(rb, cb, feature or value_col)


def psi_categorical(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    feature: str | None = None,
) -> DataFrame:
    """PSI over a categorical column: each observed category (either
    side) is its own bucket; categories missing on one side get the
    Laplace floor rather than an infinite log term."""
    rb = ref.groupBy(F.col(cat_col).alias("b")).agg(F.count("*").alias("rc"))
    cb = cur.groupBy(F.col(cat_col).alias("b")).agg(F.count("*").alias("cc"))
    return _psi_from_counts(rb, cb, feature or cat_col)


def _psi_from_counts(rb: DataFrame, cb: DataFrame, feature: str) -> DataFrame:
    # Null-SAFE bucket equality: a NULL category present on both sides
    # must be ONE bucket. A plain full-outer join on the key never
    # matches NULL==NULL, which would split it into two phantom
    # single-sided buckets — inflating k and reporting spurious drift
    # on exactly the dirty data this operator audits.
    both = rb.join(cb, rb["b"].eqNullSafe(cb["b"]), "full_outer").select(
        F.coalesce(rb["rc"], F.lit(0)).alias("rc"),
        F.coalesce(cb["cc"], F.lit(0)).alias("cc"),
    )
    tot = both.agg(
        F.sum("rc").alias("rt"), F.sum("cc").alias("ct"), F.count("*").alias("k")
    )
    smoothed = both.crossJoin(F.broadcast(tot)).select(
        "rt",
        "ct",
        "k",
        # Laplace +1 per bucket: p, q exact rationals with no zeros.
        ((F.col("rc") + 1) / (F.col("rt") + F.col("k"))).alias("p"),
        ((F.col("cc") + 1) / (F.col("ct") + F.col("k"))).alias("q"),
    )
    term = F.round(
        (F.col("p") - F.col("q")) * F.round(F.log(F.col("p") / F.col("q")), 6), 9
    )
    return (
        smoothed.select(
            "rt",
            "ct",
            "k",
            F.round(term * 1e9, 0).cast("long").alias("t"),
        )
        .groupBy("rt", "ct", "k")
        .agg(F.round(F.sum("t") / F.lit(1e9), 6).alias("psi"))
        .select(
            F.lit(feature).alias("feature"),
            "psi",
            F.col("k").cast("long").alias("n_buckets"),
            F.col("rt").cast("long").alias("n_ref"),
            F.col("ct").cast("long").alias("n_cur"),
            (F.col("psi") >= 0.25).cast("int").alias("drifted"),
        )
    )


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    numeric: dict[str, list[float]] | None = None,
    categorical: list[str] | None = None,
) -> DataFrame:
    """Multi-feature drift report: one PSI row per feature, the same
    uniform schema as the profile/constraint reports — a refresh gate
    consumes one shape."""
    parts = [
        psi_numeric(ref, cur, col, edges) for col, edges in (numeric or {}).items()
    ] + [psi_categorical(ref, cur, col) for col in categorical or []]
    if not parts:
        raise ValueError("no features given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
