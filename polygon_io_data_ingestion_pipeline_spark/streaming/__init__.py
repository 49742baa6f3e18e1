from .ingest_stream import stream_ingest_bars

__all__ = ["stream_ingest_bars"]
