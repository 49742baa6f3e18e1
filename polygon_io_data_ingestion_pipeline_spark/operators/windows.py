"""Window-shaped numeric helpers.

The reference's semantic core is per-security running products of
split/dividend factors normalized so the factor is exactly 1.0 on the
most recent bar (reference: legacy_scripts/factor_builder.py:272-276,
334-336, 818-824, 900-904). Spark has no native cumulative product, so
we compile it to ``exp(sum(log(x)))`` over a running window — all
JVM-side, whole-stage-codegen friendly, one shuffle on the partition
keys. Ratios are strictly positive in this domain; a documented
tolerance of ~1e-12 relative vs exact sequential multiplication applies
(the reference itself computes in float64).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def cumprod(col: Column | str, w: WindowSpec) -> Column:
    """Running product of a strictly-positive column over ``w``.

    ``w`` must be an ordered WindowSpec; the running frame
    (unboundedPreceding..currentRow) is applied here.
    """
    c = F.col(col) if isinstance(col, str) else col
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.exp(F.sum(F.log(c)).over(running))


def normalize_to_last(col: Column | str, w: WindowSpec) -> Column:
    """Divide ``col`` by its value on the last row of the partition.

    Implements the reference's anchor-to-most-recent convention
    (factor == 1.0 on each id's final bar, factor_builder.py:273).
    """
    c = F.col(col) if isinstance(col, str) else col
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c / F.last(c).over(whole)
