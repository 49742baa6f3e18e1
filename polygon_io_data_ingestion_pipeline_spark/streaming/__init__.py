from .ingest_stream import stream_ingest_bars, write_ingest_batch

__all__ = ["stream_ingest_bars", "write_ingest_batch"]
