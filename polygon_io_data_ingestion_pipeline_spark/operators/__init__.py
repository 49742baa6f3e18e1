from .asof import asof_join
from .windows import cumprod, normalize_to_last

__all__ = ["asof_join", "cumprod", "normalize_to_last"]
