from pipeline_mf_etl_spark.streaming.transforms import (
    daily_rollup,
    enriched_side_rollup,
    dedupe_events_batch,
    dedupe_events_stream,
    neardup_candidates_against_index,
    normalize_event_ts,
    quality_route,
    read_documents_stream,
    read_events_stream,
    replayed_events,
    session_rollup,
    sliding_rollup,
)

__all__ = [
    "daily_rollup",
    "enriched_side_rollup",
    "dedupe_events_batch",
    "dedupe_events_stream",
    "neardup_candidates_against_index",
    "normalize_event_ts",
    "quality_route",
    "read_documents_stream",
    "read_events_stream",
    "replayed_events",
    "session_rollup",
    "sliding_rollup",
]
