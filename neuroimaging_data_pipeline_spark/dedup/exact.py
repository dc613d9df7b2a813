"""Exact deduplication (hash-groupBy).

Scale: one shuffle on the content hash. The hash (md5 of normalized
text) is computed map-side, so the shuffle carries (hash, id) pairs,
not document bodies; the keep-decision is a min() aggregate, not a
window, to get map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.text.analysis import fingerprint


def exact_dedup_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 1_000_000,
) -> DataFrame:
    """One row per distinct content hash: (content_hash, keep_id,
    n_dups). keep_id = smallest id in the group (deterministic)."""
    return (
        docs.select(
            F.col(id_col), fingerprint(text_col, prefix_len).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Return docs with duplicates removed (keeps min-id per content
    hash) — a semi-join of the corpus against the keep set, so the
    full rows only move for survivors."""
    keep = exact_dedup_keys(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, on=id_col, how="left_semi")
