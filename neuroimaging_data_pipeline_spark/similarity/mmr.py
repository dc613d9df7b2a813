"""Maximal Marginal Relevance (MMR) diversity re-ranking — Carbonell
& Goldstein, SIGIR 1998: greedily pick the result that maximizes
lambda * relevance - (1 - lambda) * max-similarity-to-already-picked.
The standard fix for retrieval returning k near-identical hits
(exactly what a deduplicated-but-still-redundant web corpus produces)
and the selection shape RAG result diversification uses.

Determinism discipline — SCALED-INTEGER objective: relevance and
pairwise similarities enter as round(cos * 1e6) BIGINTs, and with
lambda = 0.7 the objective is the exact integer 7*rel_i - 3*ms_i
(output = that integer / 1e7, the same division of the same integer
in both engines). A float objective is impossible here: any decimal
lambda times a 6-decimal-rounded relevance lands EXACTLY on a
7th-decimal half-way boundary, where Spark (HALF_UP on the shortest
decimal repr) and DuckDB (round of the full binary double) disagree
by construction — measured on the first fixture tried. Integer
scoring has no boundaries at all; ties break on candidate id
ascending.

Scale shape: the pool is a per-query TOP-``pool`` candidate set (from
any retrieval stage — brute force here, ANN at scale), so every MMR
step works on queries x pool rows with vectors attached — KB per
query, broadcast-joined; the k-step greedy loop is k tiny
DataFrame unions, no driver collect, no corpus-scale work after the
pool is built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.similarity.cosine import (
    _dot,
    _norm,
    cosine_topk,
)


#: lambda = LAM_NUM / 10; objective scaled by 1e7.
LAM_NUM = 7


def _cos_i(a, b) -> F.Column:
    """round(cosine * 1e6) as BIGINT — the integer similarity."""
    return F.round(
        F.try_divide(_dot(a, b), _norm(a) * _norm(b)) * F.lit(1e6), 0
    ).cast("long")


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, mmr) — the greedy MMR selection of
    ``k`` results from each query's top-``pool`` cosine candidates,
    lambda = 0.7 via the exact integer objective 7*rel_i - 3*ms_i."""
    cand = (
        cosine_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
        .select(
            "query_id",
            id_col,
            F.round(F.col("cosine") * F.lit(1e6), 0).cast("long").alias(
                "rel_i"
            ),
        )
        .join(F.broadcast(corpus.select(id_col, vec_col)), id_col)
        # the pool (queries x pool rows, KB) is referenced by every
        # greedy step — materialize once or each step re-runs the
        # corpus-wide relevance scan (measured 4x on the whole query)
        .localCheckpoint(eager=True)
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("rel_i"), F.asc(id_col)
    )
    selected = (
        cand.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.lit(1).alias("rank"),
            F.col(id_col),
            (F.lit(LAM_NUM) * F.col("rel_i")).alias("mmr_i"),
            F.col(vec_col),
        )
    )
    for step in range(2, k + 1):
        # selected is <= k rows per query at every step — broadcast
        # both its uses (anti-join filter and the pairwise-sim join);
        # without the hint the post-union side has no stats and the
        # static planner falls back to SortMergeJoin.
        rem = cand.join(
            F.broadcast(selected.select("query_id", id_col)),
            ["query_id", id_col],
            "left_anti",
        )
        sims = (
            rem.alias("r")
            .join(
                F.broadcast(
                    selected.select(
                        "query_id", F.col(vec_col).alias("_svec")
                    )
                ).alias("s"),
                "query_id",
            )
            .groupBy("query_id", f"r.{id_col}", "r.rel_i", f"r.{vec_col}")
            .agg(
                F.max(_cos_i(F.col(f"r.{vec_col}"), F.col("_svec"))).alias(
                    "_ms_i"
                )
            )
        )
        ws = Window.partitionBy("query_id").orderBy(
            F.desc("_mmr_i"), F.asc(id_col)
        )
        pick = (
            sims.withColumn(
                "_mmr_i",
                F.lit(LAM_NUM) * F.col("rel_i")
                - F.lit(10 - LAM_NUM) * F.col("_ms_i"),
            )
            .withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                F.lit(step).alias("rank"),
                F.col(id_col),
                F.col("_mmr_i").alias("mmr_i"),
                F.col(vec_col),
            )
        )
        # flat lineage per step: selected is <= k*queries rows and is
        # referenced three times by the NEXT step — without the eager
        # checkpoint the plan depth grows geometrically with k
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select(
        "query_id",
        "rank",
        id_col,
        (F.col("mmr_i").cast("double") / F.lit(1e7)).alias("mmr"),
    )
