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


QUERIES = {
    "s_bm25_topk": s_bm25_topk,
}

ORACLE = {
    "s_bm25_topk": S_BM25_SQL,
}
