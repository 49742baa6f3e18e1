from .timeutil import epoch_to_timestamp, end_of_day, eastern_wall_clock
from .tickers import normalize_ticker_expr, ticker_variants

__all__ = [
    "epoch_to_timestamp",
    "end_of_day",
    "eastern_wall_clock",
    "normalize_ticker_expr",
    "ticker_variants",
]
