from qendpoint_spark.streaming.stateful import stream_first_seen_pages
from qendpoint_spark.streaming.incremental import (
    compact_staging,
    sessionize_events,
    stream_events_windowed,
    stream_ingest_pages,
)

__all__ = [
    "compact_staging",
    "sessionize_events",
    "stream_events_windowed",
    "stream_ingest_pages",
    "stream_first_seen_pages",
]
