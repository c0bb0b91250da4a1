from lanterndb_spark.streaming.events import (
    incremental_postings_stream,
    stream_events,
    windowed_event_counts,
)
from lanterndb_spark.streaming.scd import Scd2Ingest, scd2_ingest_stream
from lanterndb_spark.streaming.drift import DriftMonitor, drift_monitor_stream
from lanterndb_spark.streaming.spans import SpanDedupIngest, span_dedup_ingest_stream
from lanterndb_spark.streaming.hnsw import HnswIngest, hnsw_ingest_stream

__all__ = [
    "stream_events", "windowed_event_counts", "incremental_postings_stream",
    "Scd2Ingest", "scd2_ingest_stream",
    "DriftMonitor", "drift_monitor_stream",
    "SpanDedupIngest", "span_dedup_ingest_stream",
    "HnswIngest", "hnsw_ingest_stream",
]
