from diagnosisextraction_ml_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    streaming_quality_filter,
)
