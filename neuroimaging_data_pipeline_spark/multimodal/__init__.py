from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_features,
    frame_sample_plan,
    resize_plan,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
    "decode_features",
    "resize_plan",
    "frame_sample_plan",
]
