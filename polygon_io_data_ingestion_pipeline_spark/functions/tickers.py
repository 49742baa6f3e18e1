"""Ticker symbol normalization.

Mirrors the reference's preflight normalization (reference:
legacy_scripts/run_pullers.py:25-63): uppercase, trim, map the class
separators ``/ - ^ space`` to ``.``, collapse repeats; variant
generation for REST lookups tries the alternate separators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEPS = "/-^ "


def normalize_ticker_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.upper(F.trim(c))
    out = F.regexp_replace(out, r"[/\-\^ ]", ".")
    out = F.regexp_replace(out, r"\.+", ".")
    return F.regexp_replace(out, r"\.$", "")


def ticker_variants(symbol: str) -> list[str]:
    """Driver-side candidate symbols for REST lookups (BRK.B -> BRK-B,
    BRKB, BRK/B ...), order-preserving dedup like run_pullers.py:218."""
    base = symbol.strip().upper()
    for s in _SEPS:
        base = base.replace(s, ".")
    while ".." in base:
        base = base.replace("..", ".")
    base = base.rstrip(".")
    cands = [base]
    if "." in base:
        cands += [base.replace(".", "-"), base.replace(".", "/"), base.replace(".", "")]
    return list(dict.fromkeys(cands))
