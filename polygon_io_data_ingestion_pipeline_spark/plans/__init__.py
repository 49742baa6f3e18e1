from .queries import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
