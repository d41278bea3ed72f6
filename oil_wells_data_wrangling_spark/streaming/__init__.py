from oil_wells_data_wrangling_spark.streaming.events import (
    read_event_stream,
    stream_window_agg,
    stream_dedup,
    stream_sessionize,
    stream_enrich,
)

__all__ = [
    "read_event_stream",
    "stream_window_agg",
    "stream_dedup",
    "stream_sessionize",
    "stream_enrich",
]
