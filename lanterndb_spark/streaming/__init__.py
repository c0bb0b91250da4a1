from lanterndb_spark.streaming.events import (
    incremental_postings_stream,
    stream_events,
    windowed_event_counts,
)

__all__ = ["stream_events", "windowed_event_counts", "incremental_postings_stream"]
