"""Approximate aggregates for corpus-scale audits.

Exact distinct counts and exact percentiles need a shuffle of every
distinct value / a full sort; at 100 TB the sketch versions (HLL++ for
distincts, Greenwald-Khanna for quantiles — both Spark built-ins,
merged map-side like any partial aggregate) answer the same audit
questions in one pass with bounded memory. Wrappers exist so callers
get a consistent, tested surface with documented error bounds; the
error-vs-exact floors are asserted in tests/test_sketches.py.

These are deliberately NOT registry queries: sketch internals differ
across engines, so no DuckDB oracle can hash-match them. The
correctness story is the error-bound test against the exact answer,
which is the sketch's actual contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    rsd: float = 0.02,
) -> DataFrame:
    """HLL++ distinct count of ``value_col`` (optionally per group):
    ``n_distinct_approx`` with relative standard deviation ``rsd``.
    One map-side-merged pass — no distinct shuffle."""
    agg = F.approx_count_distinct(value_col, rsd=rsd).alias("n_distinct_approx")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    relative_error: float = 0.01,
) -> DataFrame:
    """Greenwald-Khanna quantile sketch of ``value_col``: one row per
    group with ``quantiles`` (array aligned with ``probabilities``).
    Rank error <= relative_error * n — a full sort's answer to within
    the sketch bound, in one pass."""
    agg = F.percentile_approx(
        value_col,
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(int(1.0 / relative_error)),
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


#: Count-min hash-row primes (d rows). Independent md5 salts per row.
_CMS_SALTS = ("cm0", "cm1", "cm2", "cm3")


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Mergeable count-min sketch of ``value_col`` frequencies.

    The third leg of the approximate-audit trio (HLL distincts, GK
    quantiles, CMS frequencies): answers "how often does key x occur"
    to within ``eps * N`` (eps = e/width) with probability
    ``1 - (1/2)^depth`` WITHOUT a shuffle keyed on the (possibly
    enormous) value domain. Exact per-key counts need a shuffle whose
    key count is the domain size; the sketch shuffles exactly
    ``depth * width`` counter cells regardless of domain or corpus
    size.

    Implementation is pure DataFrame algebra — no custom aggregator:
    each row maps to ``depth`` (row, bucket) cells (md5-salted, the
    repo's engine-portable hash idiom), and one partial-aggregated
    groupBy over the 2-level cell key sums the counters map-side. The
    result IS the sketch: ``(row, bucket, c)`` cells, mergeable with
    any other sketch of the same shape by unioning cells and re-summing
    (tested), which makes it the incremental/streaming shape too.

    Query with :func:`cms_estimate` (min over rows — the classic CMS
    upper-bound estimate: overestimates only, never under).
    """
    cells = []
    for r, salt in enumerate(_CMS_SALTS[:depth]):
        bucket = F.expr(
            f"CAST(conv(substr(md5('{salt}' || CAST({value_col} AS STRING)), 1, 8), 16, 10)"
            f" AS BIGINT) % {width}"
        )
        cells.append(F.struct(F.lit(r).alias("row"), bucket.alias("bucket")))
    return (
        df.select(F.explode(F.array(*cells)).alias("cell"))
        .select("cell.row", "cell.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        # The sketch is self-describing: width rides in the cells so a
        # query with a mismatched width RAISES instead of recomputing
        # buckets against the wrong modulus and returning plausible
        # zeros. Constant per sketch; merge by grouping on
        # (row, bucket, width) — unioning different widths is invalid
        # and the group key makes that structurally impossible too.
        .select("row", "bucket", "c", F.lit(int(width)).alias("width"))
    )


def cms_estimate(
    sketch_cells, keys: Sequence[str], width: int | None = None
) -> dict[str, int]:
    """Point-estimate frequencies for ``keys`` from collected sketch
    cells (driver-side: the sketch is depth x width counters, tiny).

    ``sketch_cells`` is the DataFrame from :func:`count_min_sketch` or
    an equivalent list of Rows. Returns ``{key: estimated_count}``,
    each the min over hash rows — an upper bound on the true count.

    The width is read from the sketch itself (the cells carry it); pass
    ``width`` only for legacy cell lists without the column, and a
    mismatch between the passed value and the stored one RAISES —
    recomputing buckets with a different modulus would silently return
    plausible wrong (typically zero) estimates.
    """
    import hashlib

    rows = (
        # bounded: a CMS is depth x width counter cells, independent of data size
        sketch_cells.collect()
        if isinstance(sketch_cells, DataFrame)
        else list(sketch_cells)
    )
    def _has_width(r) -> bool:
        d = r.asDict() if hasattr(r, "asDict") else r
        return "width" in d

    stored = {int(r["width"]) for r in rows if _has_width(r)}
    if len(stored) > 1:
        raise ValueError(f"sketch cells mix widths {sorted(stored)}: invalid merge")
    if stored:
        (w,) = stored
        if width is not None and width != w:
            raise ValueError(f"sketch was built with width={w}, queried with width={width}")
        width = w
    elif width is None:
        raise ValueError("cells carry no width column; pass width= explicitly")
    table: dict[tuple[int, int], int] = {
        (r["row"], r["bucket"]): r["c"] for r in rows
    }
    present_rows = {rr for rr, _ in table}
    out: dict[str, int] = {}
    for k in keys:
        ests = []
        for r, salt in enumerate(_CMS_SALTS):
            if r not in present_rows:
                continue  # sketch was built with a smaller depth
            h = hashlib.md5((salt + k).encode()).hexdigest()
            b = int(h[:8], 16) % width
            ests.append(table.get((r, b), 0))
        out[k] = min(ests) if ests else 0
    return out
