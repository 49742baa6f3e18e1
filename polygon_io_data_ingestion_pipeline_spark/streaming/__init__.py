from .drift_stream import psi_stream
from .corpus_stream import (
    corpus_pipeline,
    start_corpus_ingest,
    write_corpus_batch,
    write_corpus_batch_exact,
)
from .ewma_stream import ewma_stream
from .funnel_stream import funnel_stream
from .ingest_stream import stream_ingest_bars, write_ingest_batch
from .join_stream import stream_interval_join
from .sessionize_stream import SESSION_SCHEMA, sessionize_stream
from .windowed_stream import dedup_stream, session_counts, tumbling_counts

__all__ = [
    "psi_stream",
    "session_counts",
    "SESSION_SCHEMA",
    "corpus_pipeline",
    "start_corpus_ingest",
    "write_corpus_batch",
    "write_corpus_batch_exact",
    "dedup_stream",
    "ewma_stream",
    "funnel_stream",
    "sessionize_stream",
    "stream_ingest_bars",
    "stream_interval_join",
    "tumbling_counts",
    "write_ingest_batch",
]
