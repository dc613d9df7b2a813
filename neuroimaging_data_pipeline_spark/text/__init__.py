from neuroimaging_data_pipeline_spark.text.analysis import (
    LANG_MARKERS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    lang_scores,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "LANG_MARKERS",
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "mean_word_length",
    "quality_score",
    "lang_scores",
    "lang_id",
    "fingerprint",
]
