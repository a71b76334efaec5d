from salesanalytics_etl_spark.streaming.events import (
    hourly_event_rollup,
    read_events_stream,
    sessionize,
    streaming_hourly_rollup,
)

__all__ = [
    "hourly_event_rollup",
    "sessionize",
    "read_events_stream",
    "streaming_hourly_rollup",
]
