"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (Polygon.io flat-file ingestion,
partitioned Parquet lake, corporate-action adjustment) re-expressed
Spark-first, plus large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md §7):
- Everything is a DataFrame with an explicit schema; no RDDs.
- Declarative plans so Catalyst does pruning/pushdown/broadcast for free.
- Custom semantics (as-of join, cumulative product, split-gap inference)
  are library helpers compiled to window/join expressions — no engine
  extensions, no row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
