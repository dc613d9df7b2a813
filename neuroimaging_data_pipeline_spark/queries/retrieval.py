"""Retrieval + embedding-curation query surface (late-r4, sixth pass):
BM25 probe-query retrieval, the exact k-NN graph, SemDeDup-style
semantic dedup, and mixture-weighted corpus sampling.

These are the remaining first-class training-data-pipeline shapes the
engine had not yet registered: ranking retrieval (decontamination /
quality audits by query), the all-pairs neighbor graph (input to
graph dedup and SemDeDup), cluster-blocked semantic dedup (Abbas et
al. 2023), and deterministic mixture sampling (domain reweighting a
la Pile/Dolma). Registered after the window-priority modules — their
driver-window slots stay with the ts-repinned event-time queries;
green rows come from the sf0.01 + sf0.1 replica runs in SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.sources.tables import read_table
from neuroimaging_data_pipeline_spark.text.mixing import (
    mixture_sample_sql,
)
from neuroimaging_data_pipeline_spark.text.retrieval import (
    bm25_topk,
    bm25_topk_sql,
)

#: Probe queries for s_bm25_topk — literal by contract (they model a
#: benchmark/audit probe set, KB-sized at any corpus scale). 'dup' is
#: the one rare corpus term (df ~5%), so q1 exercises a high-idf term
#: while q0/q2 exercise the near-saturated-df regime.
BM25_PROBES = [
    (0, "spark window agg"),
    (1, "dup merge"),
    (2, "hash join sort fast"),
]


def s_bm25_topk(spark, sf_dir):
    """BM25 top-5 documents per probe query (text/retrieval.py).

    The corpus side is one tokenize pass semi-joined to the broadcast
    query-term list; df/totals are broadcast-sized aggregates; scores
    are DECIMAL-summed and ranked on the rounded value with doc-id
    tie-breaks, so the DuckDB twin ranks identical keys."""
    docs = read_table(spark, sf_dir, "documents", min_partitions=16)
    return bm25_topk(docs, BM25_PROBES, k=5)


S_BM25_SQL = bm25_topk_sql(BM25_PROBES, k=5)


def s_knn_graph(spark, sf_dir):
    """Exact top-3 neighbor graph over all embeddings
    (similarity/cosine.py:knn_graph): sharded brute force — one BLAS
    GEMM per (query-shard, corpus-shard) cell, local top-k inside the
    cell, global merge over n_blocks*k candidates per vector. Rank
    keys are the ROUNDED cosines in both engines so GEMM ulp noise
    cannot flip a rank."""
    from neuroimaging_data_pipeline_spark.similarity.cosine import knn_graph

    emb = read_table(spark, sf_dir, "embeddings", min_partitions=16)
    return knn_graph(emb, k=3, n_blocks=4)


_KG_DOT = (
    "list_sum(list_transform(list_zip(a.embedding, q.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_KG_NORM_A = (
    "sqrt(list_sum(list_transform(a.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_KG_NORM_Q = (
    "sqrt(list_sum(list_transform(q.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)

S_KNN_GRAPH_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS vec_id, a.vec_id AS nbr_id,
         (ROUND({_KG_DOT} / ({_KG_NORM_A} * {_KG_NORM_Q}), 6) + 0.0) AS cosine
  FROM embeddings a
  JOIN embeddings q ON a.vec_id <> q.vec_id
), ranked AS (
  SELECT vec_id, nbr_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rn
  FROM scored
)
SELECT vec_id, nbr_id, cosine FROM ranked WHERE rn <= 3
"""


def d_semdedup(spark, sf_dir):
    """SemDeDup (dedup/semantic.py): k-means-blocked semantic dedup —
    8 cells, two deterministic Lloyd passes (the s_ivf_topk machinery),
    one BLAS GEMM per cluster for the within-cluster pair scan, and
    keep-the-smallest-id per near-dup group. The oracle unrolls the
    identical Lloyd passes in SQL and recomputes the same drop set."""
    from neuroimaging_data_pipeline_spark.dedup.semantic import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings", min_partitions=16)
    return semantic_dedup(emb, n_cells=8, lloyd_iters=2, threshold=0.2)


def _semdedup_sql(threshold: float = 0.2) -> str:
    """DuckDB twin of d_semdedup: the s_ivf_topk Lloyd CTEs (imported
    from queries/simsearch.py — literally the same SQL text), then
    within-cell pairs on rounded cosine, then NOT EXISTS keep."""
    from neuroimaging_data_pipeline_spark.queries.simsearch import (
        _ivf_assign_sql,
        _ivf_lloyd_sql,
    )

    return f"""
WITH cents0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
{_ivf_lloyd_sql(0)}
{_ivf_lloyd_sql(1)}
assign AS ({_ivf_assign_sql("cents2")}), cells AS (
  SELECT vec_id, embedding, cid FROM assign WHERE crn = 1
), pairs AS (
  SELECT a.vec_id AS id_a, q.vec_id AS id_b
  FROM cells a
  JOIN cells q ON a.cid = q.cid AND a.vec_id < q.vec_id
  WHERE (ROUND(
           list_sum(list_transform(list_zip(a.embedding, q.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) + 0.0) >= {threshold}
), dropped AS (
  SELECT DISTINCT id_b FROM pairs
)
SELECT c.vec_id, c.cid,
       CAST(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.id_b
"""


D_SEMDEDUP_SQL = _semdedup_sql()


#: Mixture weights for t_mix_sample — integer thresholds out of 1000
#: (src0 kept whole, src1 halved, ..., sources outside the allowlist
#: dropped). Literal by contract: a mixture config is a KB-sized dim.
MIX_THRESHOLDS = {
    "src0": 1000,
    "src1": 500,
    "src2": 250,
    "src3": 100,
    "src5": 750,
    "src8": 333,
    "src13": 50,
}


def t_mix_sample(spark, sf_dir):
    """Mixture-weighted deterministic sampling (text/mixing.py): each
    source downsampled to its target rate by content-addressed md5
    bucket — the Pile/Dolma domain-reweighting step, reproducible
    across engines/runs/partitionings (no rand()). Map-only: the
    broadcast mixture dim joins in, one md5 compare per row, zero
    shuffle."""
    from neuroimaging_data_pipeline_spark.text.mixing import mixture_sample

    docs = read_table(spark, sf_dir, "documents", min_partitions=16)
    return mixture_sample(docs, MIX_THRESHOLDS).select(
        "doc_id", "source", "bucket"
    )


T_MIX_SAMPLE_SQL = mixture_sample_sql(MIX_THRESHOLDS)


QUERIES = {
    "s_bm25_topk": s_bm25_topk,
    "s_knn_graph": s_knn_graph,
    "d_semdedup": d_semdedup,
    "t_mix_sample": t_mix_sample,
}

ORACLE = {
    "s_bm25_topk": S_BM25_SQL,
    "s_knn_graph": S_KNN_GRAPH_SQL,
    "d_semdedup": D_SEMDEDUP_SQL,
    "t_mix_sample": T_MIX_SAMPLE_SQL,
}
