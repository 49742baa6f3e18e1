from .asof import asof_join
from .windows import cumprod, normalize_to_last
from .factors import (
    adjust_bars,
    apply_dividend_factors,
    apply_split_factors,
    attach_id,
    build_dividend_factors,
    build_split_factors,
    prep_dividends,
    prep_splits,
    renormalize_tr,
)
from .gaps import (
    day_edges,
    guess_split_ratio,
    infer_gap_ratios,
    merge_declared_with_inferred,
)
from .minute_path import (
    adjust_minute_bars,
    dividend_factors_from_days,
    effective_day_factors,
    split_factors_from_days,
)

__all__ = [
    "asof_join",
    "cumprod",
    "normalize_to_last",
    "adjust_bars",
    "apply_dividend_factors",
    "apply_split_factors",
    "attach_id",
    "build_dividend_factors",
    "build_split_factors",
    "prep_dividends",
    "prep_splits",
    "renormalize_tr",
    "day_edges",
    "guess_split_ratio",
    "infer_gap_ratios",
    "merge_declared_with_inferred",
    "adjust_minute_bars",
    "dividend_factors_from_days",
    "effective_day_factors",
    "split_factors_from_days",
]
