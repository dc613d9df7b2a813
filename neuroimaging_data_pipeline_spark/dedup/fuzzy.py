"""Fuzzy (edit-distance) duplicate pairing — the record-linkage
primitive for OCR noise, typo'd boilerplate and template drift that
token-set methods (MinHash Jaccard) under-weight because a single
character edit changes every shingle it touches.

Scale design: edit distance is O(len^2) per pair and all-pairs is
O(n^2), so BOTH axes are bounded up front:
- candidate generation is a BLOCKED self-join — only documents
  agreeing on (length bucket, normalized prefix) ever meet, an
  equi-join on a compact key, never a cross join;
- a block-size cap (``max_block``) drops pathological blocks
  (boilerplate floods) loudly via an aggregate filter, the same
  flood-guard discipline as the SimHash/MinHash buckets;
- the distance itself runs on a fixed-length prefix
  (``prefix_len``), making the per-pair cost a constant, JVM-side
  ``levenshtein`` (no Python row ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREFIX_LEN = 48
LEN_BUCKET = 16
MAX_BLOCK = 64


def _norm(text_col: str):
    return F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )


def fuzzy_pairs(
    docs: DataFrame,
    max_dist: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = PREFIX_LEN,
    len_bucket: int = LEN_BUCKET,
    max_block: int = MAX_BLOCK,
) -> DataFrame:
    """Candidate near-duplicate pairs by bounded edit distance:
    (id_a, id_b, dist) with id_a < id_b and dist <= max_dist,
    computed on the normalized ``prefix_len``-char prefix within
    (length-bucket, 12-char-prefix) blocks capped at ``max_block``
    members."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        _norm(text_col).alias("_norm"),
    ).select(
        "_id",
        F.substring("_norm", 1, prefix_len).alias("_prefix"),
        F.struct(
            (F.length("_norm") / len_bucket).cast("int").alias("lb"),
            F.substring("_norm", 1, 12).alias("pfx"),
        ).alias("_block"),
    )
    ok_blocks = (
        base.groupBy("_block")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter((F.col("_bn") > 1) & (F.col("_bn") <= max_block))
        .select("_block")
    )
    blocked = base.join(ok_blocks, "_block")
    left = blocked.select(
        "_block",
        F.col("_id").alias("id_a"),
        F.col("_prefix").alias("_pa"),
    )
    right = blocked.select(
        "_block",
        F.col("_id").alias("id_b"),
        F.col("_prefix").alias("_pb"),
    )
    return (
        left.join(right, "_block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_pa", "_pb").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .dropDuplicates(["id_a", "id_b"])
    )
