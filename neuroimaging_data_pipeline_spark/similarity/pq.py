"""Product quantization (PQ) — the FAISS-style vector-compression
path of billion-scale ANN (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011).

The embedding is split into ``m`` contiguous subspaces; each subspace
gets its own ``k``-centroid codebook trained by Lloyd's algorithm
under **L2** (PQ's metric, unlike the cosine used by the IVF/SemDeDup
machinery in ``similarity/cosine.py``); a vector's code is its nearest
centroid id per subspace — ``m`` small ints replacing d floats (here
4x8 codes for 64 floats; at 100 TB this is the difference between an
in-RAM ANN index and none).

Scale shape (mirrors kmeans_centroids): codebooks are m*k rows of
KB-scale driver state between Lloyd passes — the standard Spark
iterative-algorithm shape; each pass is ONE shuffle (the per-cell
member mean, partial-aggregable); assignment itself is map-only
against the broadcast codebook table, pure JVM column expressions
(zip_with/aggregate — no Python row ops anywhere).

Determinism discipline (same as IVF): seeding = the k smallest-id
vectors' subvectors; distances ROUNDED to 6 decimals before the
argmin with centroid-id tie-break; centroid means ROUNDED to 6
between passes — so the oracle can unroll the identical passes in SQL
and land on identical codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _l2sq(a, b):
    """Squared L2 distance between two equal-length double arrays,
    JVM-side (zip_with + aggregate fold in position order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(
    df: DataFrame, m: int, sub: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, s, v) — one row per (vector, subspace), v the double-cast
    length-``sub`` slice. Map-only."""
    slices = F.array(
        *[
            F.transform(
                F.slice(F.col(vec_col), s * sub + 1, sub),
                lambda x: x.cast("double"),
            )
            for s in range(m)
        ]
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("s", "v")
    )


def _assign(sub: DataFrame, cbs: DataFrame, id_col: str) -> DataFrame:
    """Nearest codebook centroid per (vector, subspace) by ROUNDED L2,
    tie-break cid asc — one max_by aggregate (partial-agg, no per-key
    sort). Returns (id, s, code, sq_err, v)."""
    scored = sub.join(cbs, "s").withColumn(
        "_d", F.round(_l2sq(F.col("v"), F.col("cvec")), 6) + F.lit(0.0)
    )
    # min(d, cid) == max of (-d, -cid)
    order = F.struct((-F.col("_d")).alias("nd"), (-F.col("cid")).alias("nc"))
    payload = F.struct(F.col("cid"), F.col("_d"), F.col("v"))
    best = scored.groupBy(id_col, "s").agg(F.max_by(payload, order).alias("_b"))
    return best.select(
        id_col,
        "s",
        F.col("_b.cid").alias("code"),
        F.col("_b._d").alias("sq_err"),
        F.col("_b.v").alias("v"),
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 8,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks; returns the broadcast
    (s, cid, cvec) table. Empty cells keep their previous centroid.
    All m subspaces train inside the SAME jobs (subspace is just a
    key), so a Lloyd pass costs one scan + one shuffle regardless of
    m."""
    spark = corpus.sparkSession
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    seeds = _subvectors(
        corpus.orderBy(F.asc(id_col)).limit(k), m, sub, id_col, vec_col
    ).select(
        "s", F.col(id_col).alias("cid"), F.col("v").alias("cvec")
    )
    cb = {(r["s"], r["cid"]): list(r["cvec"]) for r in seeds.collect()}

    def _broadcast_cb():
        rows = [(s, cid, vec) for (s, cid), vec in sorted(cb.items())]
        return F.broadcast(
            spark.createDataFrame(
                rows, "s int, cid long, cvec array<double>"
            )
        )

    subv = _subvectors(corpus, m, sub, id_col, vec_col)
    for _ in range(lloyd_iters):
        members = _assign(subv, _broadcast_cb(), id_col)
        comp = (
            members.select("s", "code", F.posexplode("v").alias("pos", "val"))
            .groupBy("s", "code", "pos")
            .agg((F.round(F.avg("val"), 6) + F.lit(0.0)).alias("mval"))
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in comp.collect():
            upd.setdefault((r["s"], r["code"]), {})[r["pos"]] = r["mval"]
        for key, comps in upd.items():
            cb[key] = [comps[p] for p in range(sub)]
    return _broadcast_cb()


def pq_codes(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, subspace, code, sq_err) — one row per (vector, subspace):
    the PQ code and the rounded squared quantization error. Map-only
    against the broadcast codebooks; the long skinny output is the
    hash-friendly form (a per-vector code array is one groupBy away
    when a consumer wants it)."""
    dim_row = corpus.select(vec_col).first()[0]
    m = 1 + codebooks.agg(F.max("s")).first()[0]
    sub = len(dim_row) // m
    subv = _subvectors(corpus, m, sub, id_col, vec_col)
    out = _assign(subv, codebooks, id_col)
    return out.select(
        id_col,
        F.col("s").cast("int").alias("subspace"),
        F.col("code").cast("long").alias("code"),
        F.col("sq_err").alias("sq_err"),
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k_codes: int = 8,
    k: int = 5,
    refine_r: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k — the composed FAISS index shape: a
    coarse IVF quantizer prunes the corpus to ``nprobe`` cells per
    query, and candidates are scored by PQ asymmetric distance
    computation (ADC: the query's exact subvectors against each
    candidate's CODE centroids) instead of touching raw vectors.

    This is what makes billion-scale ANN tractable: the scan reads
    m small ints per candidate, the ADC table is queries x m x
    k_codes rounded distances (KB — broadcast), and only
    ~nprobe/n_cells of the corpus is scored per query. (Classic
    IVF-PQ quantizes residuals; this composition quantizes raw
    vectors — the IVFFlat+ADC hybrid — so the PQ codebooks are
    exactly the oracle-checked s_pq_codes artifacts.)

    Scale shape: cells + codes are one-time build products (driver
    KB state for centroids/codebooks, map-only assignment); the
    query-time plan is cell equi-join -> code equi-join -> broadcast
    ADC lookup -> one partial-agg sum per (query, candidate) -> per-
    query top-k window over the pruned candidate set only.

    ``refine_r > 0`` adds the FAISS IndexRefineFlat step: the ADC
    ranking keeps only a per-query shortlist of ``refine_r``
    candidates, whose RAW vectors are then fetched and re-ranked by
    exact L2 (output column ``l2sq``). In high dimensions distances
    concentrate — within a cluster the neighbor gaps are smaller
    than PQ's quantization error, so ADC alone cannot order the
    shortlist (measured: recall@5 plateaus ~0.32 on a 16-cluster
    mixture fixture no matter how nprobe/m/k are tuned) — but it
    reliably puts the true neighbors IN the shortlist. Exact math on
    queries x refine_r rows (~5% of corpus here) lifts recall@5 to
    1.0 while the scan still touches only nprobe/n_cells of the
    codes. Without refine the output stays (query_id, id, approx_l2sq).
    """
    from neuroimaging_data_pipeline_spark.similarity.cosine import (
        assign_nearest,
        kmeans_centroids,
    )

    cents = kmeans_centroids(
        corpus, n_cells=n_cells, lloyd_iters=1, id_col=id_col, vec_col=vec_col
    )
    cells = assign_nearest(corpus, cents, id_col, vec_col, 1).select(
        id_col, F.col("_cid").alias("cell")
    )
    cbs = pq_codebooks(corpus, m=m, k=k_codes, lloyd_iters=1,
                       id_col=id_col, vec_col=vec_col)
    codes = pq_codes(corpus, cbs, id_col=id_col, vec_col=vec_col).select(
        id_col, F.col("subspace").alias("s"), "code"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    probed = assign_nearest(q, cents, "query_id", "qvec", nprobe).select(
        "query_id", F.col("_cid").alias("cell")
    )
    dim = len(corpus.select(vec_col).first()[0])
    qsub = _subvectors(q, m, dim // m, "query_id", "qvec")
    adc = F.broadcast(
        qsub.join(cbs, "s").select(
            "query_id",
            "s",
            F.col("cid").alias("code"),
            (F.round(_l2sq(F.col("v"), F.col("cvec")), 6) + F.lit(0.0)).alias(
                "ad"
            ),
        )
    )
    cand = (
        # a query batch is bounded at any corpus scale -> broadcast
        cells.join(F.broadcast(probed), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )
    scored = (
        cand.join(codes, id_col)
        .join(adc, ["query_id", "s", "code"])
        .groupBy("query_id", id_col)
        .agg((F.round(F.sum("ad"), 6) + F.lit(0.0)).alias("approx_l2sq"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_l2sq"), F.asc(id_col)
    )
    if not refine_r:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", id_col, "approx_l2sq")
        )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= refine_r)
        .select("query_id", id_col)
    )
    # queries x refine_r rows — broadcast against the streamed corpus
    exact = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            id_col,
            (F.round(_l2sq(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.transform(F.col("qvec"), lambda x: x.cast("double")),
            ), 6) + F.lit(0.0)).alias("l2sq"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("l2sq"), F.asc(id_col))
    return (
        exact.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "l2sq")
    )
