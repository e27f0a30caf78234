from .ingest import stream_ingest_candles, streaming_resample  # noqa: F401
