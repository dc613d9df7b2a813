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


def incremental_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus index — the
    production shape: a crawl snapshot lands and must not re-admit
    content the corpus already holds, nor its own within-batch
    repeats. Returns one row per batch doc:
    (id, content_hash, status) with status
    'dup_of_index'  — content already in the index (checked first),
    'dup_in_batch'  — repeat of a smaller-id batch doc not in index,
    'new'           — first occurrence anywhere.

    Scale shape: both sides reduce to (hash, id) map-side before any
    shuffle; the batch-vs-index check is a hash equi-join of two
    hash-keyed tables (co-partitionable; neither side broadcast —
    both scale with the corpus), and the within-batch keep decision
    is a min() aggregate, not a window."""
    bh = batch.select(
        F.col(id_col), fingerprint(text_col).alias("content_hash")
    )
    ih = index.select(
        fingerprint(text_col).alias("content_hash")
    ).distinct()
    first_in_batch = bh.groupBy("content_hash").agg(
        F.min(id_col).alias("_first_id")
    )
    return (
        bh.join(ih.withColumn("_in_index", F.lit(1)), "content_hash", "left")
        .join(first_in_batch, "content_hash")
        .select(
            id_col,
            "content_hash",
            F.when(F.col("_in_index").isNotNull(), "dup_of_index")
            .when(F.col(id_col) != F.col("_first_id"), "dup_in_batch")
            .otherwise("new")
            .alias("status"),
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
