from .ingest import (  # noqa: F401
    stream_ingest_candles, streaming_dedup, streaming_resample,
    streaming_sessions,
)
from .stateful import stateful_sessionize  # noqa: F401
