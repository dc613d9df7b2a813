from neuroimaging_data_pipeline_spark.dedup.exact import (
    exact_dedup,
    exact_dedup_keys,
)
from neuroimaging_data_pipeline_spark.dedup.minhash import (
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    shingles,
)
from neuroimaging_data_pipeline_spark.dedup.simhash import (
    simhash,
    simhash_candidate_pairs,
)

__all__ = [
    "exact_dedup",
    "exact_dedup_keys",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_verify",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_candidate_pairs",
]
