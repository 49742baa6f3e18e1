"""Window-shaped numeric helpers.

The reference's semantic core is per-security running products of
split/dividend factors normalized so the factor is exactly 1.0 on the
most recent bar (reference: legacy_scripts/factor_builder.py:272-276,
334-336, 818-824, 900-904). We compile cumprod to the native
``product`` aggregate over a running window — JVM-side, one shuffle on
the partition keys, and **exact** sequential float64 multiplication,
matching pandas ``cumprod`` bit-for-bit on the common case (split
ratios are small integers/powers of two, where the earlier
``exp(sum(log))`` formulation picked up ~1-ulp noise that could flip a
round-half tie).
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
    return F.product(c).over(running)


def normalize_to_last(col: Column | str, w: WindowSpec) -> Column:
    """Divide ``col`` by its value on the last row of the partition.

    Implements the reference's anchor-to-most-recent convention
    (factor == 1.0 on each id's final bar, factor_builder.py:273).
    """
    c = F.col(col) if isinstance(col, str) else col
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c / F.last(c).over(whole)
