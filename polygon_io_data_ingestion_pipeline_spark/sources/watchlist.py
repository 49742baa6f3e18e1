"""Ticker-universe (watchlist) loading.

Reference: src/polygon_ingest/ingest.py:457-464 (JSON list or
line-per-ticker text, case-folded) and
scripts/build_index_universes.py:36-49 (universe union + dedup).
Watchlists are tiny control data: loaded driver-side, applied as a
broadcast ``isin`` filter.
"""

from __future__ import annotations

import json
from pathlib import Path

from ..functions.tickers import ticker_variants


def load_watchlist(path: str | Path) -> set[str]:
    """JSON array or one-symbol-per-line text -> uppercased set."""
    text = Path(path).read_text()
    try:
        symbols = json.loads(text)
        if not isinstance(symbols, list):
            raise ValueError("watchlist JSON must be a list")
    except json.JSONDecodeError:
        symbols = [line for line in text.splitlines() if line.strip()]
    return {str(s).strip().upper() for s in symbols if str(s).strip()}


def union_universes(*universes: set[str]) -> list[str]:
    """SPX ∪ NDX-style union, order-stable (build_index_universes.py:47)."""
    return sorted(set().union(*universes))


def expand_variants(symbols: set[str]) -> dict[str, list[str]]:
    """symbol -> REST lookup candidates (run_pullers.py:38-63)."""
    return {s: ticker_variants(s) for s in sorted(symbols)}
