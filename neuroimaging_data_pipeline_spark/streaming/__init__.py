from neuroimaging_data_pipeline_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
    foreach_batch_pipeline,
    session_counts,
    stream_parquet_dir,
    tumbling_counts,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "stream_parquet_dir",
    "tumbling_counts",
    "session_counts",
    "foreach_batch_pipeline",
]
