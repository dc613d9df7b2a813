from neuroimaging_data_pipeline_spark.similarity.cosine import (
    cosine_topk,
    lsh_bucket,
    lsh_topk,
    random_hyperplanes,
)

__all__ = ["cosine_topk", "lsh_topk", "lsh_bucket", "random_hyperplanes"]
