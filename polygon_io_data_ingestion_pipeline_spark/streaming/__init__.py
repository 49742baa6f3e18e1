from .ingest_stream import stream_ingest_bars, write_ingest_batch
from .sessionize_stream import SESSION_SCHEMA, sessionize_stream

__all__ = [
    "SESSION_SCHEMA",
    "sessionize_stream",
    "stream_ingest_bars",
    "write_ingest_batch",
]
