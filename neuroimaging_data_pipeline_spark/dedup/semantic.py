"""SemDeDup-style semantic deduplication over an embedding column.

The cluster-blocked embedding dedup of Abbas et al. 2023 ("SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
k-means the corpus embeddings, then within each cluster drop every
vector that has a near-duplicate (cosine >= threshold) with a smaller
id — one representative per semantic-duplicate group survives, and
cross-cluster pairs are never materialized.

Scale shape: the centroid table is broadcast KB-state (the MLlib
iterative k-means shape, see similarity/cosine.py:kmeans_centroids);
assignment is a map-only corpus pass; the quadratic work is one dense
BLAS GEMM per cluster (bucketed_neardup_pairs), embarrassingly
parallel across clusters — exactly how the paper runs at web scale,
where n_cells grows with the corpus so every cluster stays
GEMM-sized.

Determinism: seeding, Lloyd tie-breaks, and per-component rounding
follow kmeans_centroids; the drop rule compares ROUNDED cosines and
keeps the smallest id, so the DuckDB twin (which unrolls the same
Lloyd passes in SQL) reproduces the identical keep set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.similarity.cosine import (
    assign_nearest,
    bucketed_neardup_pairs,
    kmeans_centroids,
)


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 8,
    lloyd_iters: int = 2,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, kept) for every vector: its k-means cluster and
    whether it survives semantic dedup (kept=0 iff some smaller-id
    vector in the same cluster has rounded cosine >= threshold)."""
    vecs = emb.select(id_col, vec_col)
    cents = kmeans_centroids(
        vecs, n_cells=n_cells, lloyd_iters=lloyd_iters,
        id_col=id_col, vec_col=vec_col,
    )
    cells = assign_nearest(vecs, cents, id_col, vec_col, 1)
    pairs = bucketed_neardup_pairs(
        cells,
        bucket_col="_cid",
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (
        cells.select(id_col, F.col("_cid").alias("cid"))
        .join(dropped.withColumn("_drop", F.lit(1)), id_col, "left")
        .select(
            id_col,
            "cid",
            F.when(F.col("_drop").isNull(), 1).otherwise(0).alias("kept"),
        )
    )
