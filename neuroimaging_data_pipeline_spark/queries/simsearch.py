"""Similarity search + hash-based near-dup query surface over
``embeddings``/``documents``.

All queries here are oracle-checked (since r3): the hash families are
md5-based (DuckDB recomputes them byte-identically) and the LSH
hyperplanes / IVF Lloyd passes are deterministic literals unrolled
into the oracle SQL. Recall/cost trade-offs of the approximate paths
are additionally pinned by pytest against exact ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from neuroimaging_data_pipeline_spark.dedup.minhash import minhash_dedup_pairs
from neuroimaging_data_pipeline_spark.dedup.simhash import (
    simhash,
    simhash_candidate_pairs,
)
from neuroimaging_data_pipeline_spark.similarity.cosine import (
    bucketed_neardup_pairs,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from neuroimaging_data_pipeline_spark.sources.tables import read_table

_DOT = (
    "list_sum(list_transform(list_zip(a.embedding, q.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM_A = (
    "sqrt(list_sum(list_transform(a.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_NORM_Q = (
    "sqrt(list_sum(list_transform(q.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def s_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-5 for query vectors vec_id < 5."""
    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", (F.round("cosine", 6) + F.lit(0.0)).alias("cosine")
    )


S_COSINE_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
         {_DOT} / ({_NORM_A} * {_NORM_Q}) AS cos_raw
  FROM embeddings a
  JOIN embeddings q ON q.vec_id < 5 AND a.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, vec_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, (ROUND(cos_raw, 6) + 0.0) AS cosine FROM ranked WHERE rn <= 5
"""


def s_mmr_rerank(spark, sf_dir):
    """MMR diversity re-rank (similarity/mmr.py): greedy
    lambda*relevance - (1-lambda)*max-sim-to-picked selection of 5
    results from each query's top-20 cosine pool (queries vec_id<3,
    lambda=0.7) — the Carbonell-Goldstein fix for retrieval returning
    near-identical hits, and the selection shape RAG diversification
    uses. The objective is SCALED-INTEGER (7*rel_i - 3*ms_i on
    round(cos*1e6) BIGINTs; see similarity/mmr.py — a float objective
    provably half-way-rounds differently in the two engines), so the
    oracle's unrolled 5-step CTE chain reproduces the exact greedy
    sequence. Post-pool work is queries x pool rows per step; no
    driver collect."""
    from neuroimaging_data_pipeline_spark.similarity.mmr import mmr_rerank

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    queries = emb.filter(F.col("vec_id") < 3)
    return mmr_rerank(emb, queries, k=5, pool=20)


def _mmr_sql(k: int = 5, pool: int = 20, lam_num: int = 7) -> str:
    """Unrolled k-step twin of mmr_rerank's scaled-integer objective:
    rel_i/ms_i = round(cosine * 1e6) BIGINTs, mmr_i = lam_num*rel_i -
    (10-lam_num)*ms_i, output = mmr_i / 1e7 (same integer, same
    division, both engines)."""
    dot_rs = (
        "list_sum(list_transform(list_zip(er.embedding, es.embedding),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    norm_r = (
        "sqrt(list_sum(list_transform(er.embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    norm_s = (
        "sqrt(list_sum(list_transform(es.embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    sim_i = f"CAST(ROUND({dot_rs} / ({norm_r} * {norm_s}) * 1e6) AS BIGINT)"
    oml = 10 - lam_num
    steps = []
    for i in range(2, k + 1):
        steps.append(f"""sc{i} AS (
  SELECT p.query_id, p.vec_id, p.rel_i, MAX({sim_i}) AS ms_i
  FROM pool p
  JOIN selu{i - 1} s ON s.query_id = p.query_id
  JOIN embeddings er ON er.vec_id = p.vec_id
  JOIN embeddings es ON es.vec_id = s.vec_id
  WHERE NOT EXISTS (SELECT 1 FROM selu{i - 1} x
                    WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
  GROUP BY p.query_id, p.vec_id, p.rel_i
), pick{i} AS (
  SELECT query_id, {i} AS rank, vec_id, mmr_i FROM (
    SELECT query_id, vec_id,
           ({lam_num} * rel_i - {oml} * ms_i) AS mmr_i,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY ({lam_num} * rel_i - {oml} * ms_i) DESC, vec_id ASC
           ) AS rn
    FROM sc{i}
  ) WHERE rn = 1
), selu{i} AS (
  SELECT * FROM selu{i - 1} UNION ALL SELECT * FROM pick{i}
)""")
    chain = ",\n".join(steps)
    return f"""
WITH pool AS (
  SELECT query_id, vec_id, rel_i FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
           CAST(ROUND({_DOT} / ({_NORM_A} * {_NORM_Q}) * 1e6) AS BIGINT)
             AS rel_i,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT} / ({_NORM_A} * {_NORM_Q}) DESC, a.vec_id ASC
           ) AS rn
    FROM embeddings a
    JOIN embeddings q ON q.vec_id < 3 AND a.vec_id <> q.vec_id
  ) WHERE rn <= {pool}
), selu1 AS (
  SELECT query_id, 1 AS rank, vec_id,
         CAST({lam_num} * rel_i AS BIGINT) AS mmr_i
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel_i DESC, vec_id ASC) AS rn
    FROM pool
  ) WHERE rn = 1
),
{chain}
SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
       (CAST(mmr_i AS DOUBLE) / 1e7) AS mmr
FROM selu{k}
"""


S_MMR_SQL = _mmr_sql()


def d_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs within a label bucket
    (label = the blocking key, as LSH buckets would be at scale).
    One GEMM per bucket (similarity/cosine.py:bucketed_neardup_pairs)
    — Arrow+BLAS instead of per-pair expression eval."""
    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    return bucketed_neardup_pairs(emb, bucket_col="label", threshold=0.2)


D_EMB_NEARDUP_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS id_a, q.vec_id AS id_b, a.label AS label,
         list_sum(list_transform(list_zip(a.embedding, q.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_raw
  FROM embeddings a
  JOIN embeddings q ON a.label = q.label AND a.vec_id < q.vec_id
)
SELECT id_a, id_b, label, (ROUND(cos_raw, 6) + 0.0) AS cosine
FROM pairs WHERE (ROUND(cos_raw, 6) + 0.0) >= 0.2
"""


def s_ivf_topk(spark, sf_dir):
    """IVF approximate top-5: 8 id-seeded centroid cells refined by TWO
    deterministic Lloyd iterations (fixed count, id tie-breaks,
    centroids rounded to 6 decimals per component so float
    summation-order noise can't diverge the engines), nprobe=2
    (similarity/cosine.py:ivf_topk). Fully oracle-checked — the oracle
    unrolls the same two k-means passes in SQL."""
    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(emb, queries, n_cells=8, nprobe=2, k=5, lloyd_iters=2)
    return out.select(
        "query_id", "vec_id", (F.round("cosine", 6) + F.lit(0.0)).alias("cosine")
    )


_CDOT = (
    "list_sum(list_transform(list_zip(v.embedding, c.cvec),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_CNORM_V = (
    "sqrt(list_sum(list_transform(v.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_CNORM_C = (
    "sqrt(list_sum(list_transform(c.cvec,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)

def _ivf_assign_sql(cents_cte: str) -> str:
    """Nearest-centroid assignment CTE body against ``cents_cte``."""
    return f"""
  SELECT v.vec_id, v.embedding, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_CDOT} / ({_CNORM_V} * {_CNORM_C}) DESC, c.cid ASC
         ) AS crn
  FROM embeddings v CROSS JOIN {cents_cte} c
"""


def _ivf_lloyd_sql(i: int) -> str:
    """One unrolled Lloyd pass: assign to cents{i}, elementwise member
    mean rounded to 6 (same normalization as the Spark side), empty
    cells keep their previous centroid."""
    return f"""assign{i} AS ({_ivf_assign_sql(f"cents{i}")}),
memb{i} AS (SELECT cid, embedding FROM assign{i} WHERE crn = 1),
rows{i} AS (
  SELECT cid, UNNEST(embedding) AS val,
         UNNEST(RANGE(1, len(embedding) + 1)) AS idx
  FROM memb{i}
),
comp{i} AS (
  SELECT cid, idx, (ROUND(AVG(CAST(val AS DOUBLE)), 6) + 0.0) AS m
  FROM rows{i} GROUP BY cid, idx
),
agg{i} AS (SELECT cid, list(m ORDER BY idx) AS v FROM comp{i} GROUP BY cid),
cents{i + 1} AS (
  SELECT c.cid, COALESCE(a.v, c.cvec) AS cvec
  FROM cents{i} c LEFT JOIN agg{i} a USING (cid)
),"""


S_IVF_SQL = f"""
WITH cents0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
{_ivf_lloyd_sql(0)}
{_ivf_lloyd_sql(1)}
assign AS ({_ivf_assign_sql("cents2")}), cells AS (
  SELECT vec_id, embedding, cid FROM assign WHERE crn = 1
), probes AS (
  SELECT vec_id AS query_id, embedding AS qvec, cid
  FROM assign WHERE vec_id < 5 AND crn <= 2
), scored AS (
  SELECT p.query_id, m.vec_id,
         list_sum(list_transform(list_zip(m.embedding, p.qvec),
                  q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(m.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(p.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_raw
  FROM probes p JOIN cells m ON m.cid = p.cid AND m.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, (ROUND(cos_raw, 6) + 0.0) AS cosine FROM ranked WHERE rn <= 5
"""


#: LSH config for s_lsh_topk, chosen from a measured recall/cost grid
#: on the sf0.1 embeddings (r3): the corpus is isotropic (no cluster
#: structure), the worst case for hyperplane LSH, so recall is bought
#: with bucket collision probability. planes=3/tables=4 gives
#: recall@5=0.80 at ~0.49s — vs 0.28 at ~0.46s for the previous
#: 6-plane/3-table config: strictly better recall at equal cost.
#: (Full grid: 3p/1t .44, 3p/2t .56, 3p/3t .68, 3p/4t .80; 4p/4t .56;
#: 5p/4t .40 — pinned in tests/test_dedup_text.py.) At corpus scale,
#: planes must GROW with n (buckets ~ n/2^planes) — this config is
#: sized for the test corpus, not a universal constant.
LSH_N_PLANES = 3
LSH_N_TABLES = 4


def s_lsh_topk(spark, sf_dir):
    """Approximate top-5 via random-hyperplane LSH, independent tables
    OR-ed for recall.

    Oracle-checked since r3: the seed-42 hyperplanes are Python-side
    deterministic literals (similarity/cosine.py:random_hyperplanes),
    inlined verbatim into the oracle SQL — both engines compute the
    same sign-bit buckets, the same candidate set, and the same exact
    cosine re-rank."""
    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_topk(
        emb, queries, dim=64, k=5,
        n_planes=LSH_N_PLANES, n_tables=LSH_N_TABLES,
        strategy="or_broadcast",  # 5 queries: BNLJ beats explode+dedup
    )
    return out.select("query_id", "vec_id", (F.round("cosine", 6) + F.lit(0.0)).alias("cosine"))


def _lsh_topk_sql(
    dim: int = 64,
    k: int = 5,
    n_planes: int = LSH_N_PLANES,
    n_tables: int = LSH_N_TABLES,
    seed: int = 42,
) -> str:
    """DuckDB twin of s_lsh_topk: the same seed-42 hyperplanes that
    lsh_topk bakes into the Spark plan as F.lit literals are inlined
    here as SQL list literals (same floats via repr round-trip), so
    bucket ids, candidates, and the re-rank match exactly."""
    from neuroimaging_data_pipeline_spark.similarity.cosine import (
        random_hyperplanes,
    )

    def dot(plane: list[float]) -> str:
        lits = ", ".join(repr(v) for v in plane)
        return (
            "list_sum(list_transform(list_zip(embedding, ["
            + lits
            + "]), p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    bucket_exprs = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
        bits = " + ".join(
            f"((CASE WHEN {dot(p)} >= 0 THEN 1 ELSE 0 END) << {i})"
            for i, p in enumerate(planes)
        )
        bucket_exprs.append(f"({bits}) AS b{t}")
    buckets = ",\n         ".join(bucket_exprs)
    tbl_ids = ", ".join(str(t) for t in range(n_tables))
    tbl_cols = ", ".join(f"b{t}" for t in range(n_tables))
    return f"""
WITH buck AS (
  SELECT vec_id, embedding,
         {buckets}
  FROM embeddings
), exploded AS (
  SELECT vec_id, UNNEST([{tbl_ids}]) AS tbl, UNNEST([{tbl_cols}]) AS bucket
  FROM buck
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
  FROM exploded c JOIN exploded q
    ON c.tbl = q.tbl AND c.bucket = q.bucket
   AND q.vec_id < 5 AND c.vec_id <> q.vec_id
), scored AS (
  SELECT cand.query_id, cand.vec_id,
         {_DOT} / ({_NORM_A} * {_NORM_Q}) AS cos_raw
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.vec_id
  JOIN embeddings q ON q.vec_id = cand.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, (ROUND(cos_raw, 6) + 0.0) AS cosine FROM ranked WHERE rn <= {k}
"""


S_LSH_SQL = _lsh_topk_sql()


#: LSH band-bucket flood cap for d_minhash_lsh — above any bucket at
#: test SFs, mirrored in the oracle SQL.
MINHASH_BUCKET_CAP = 1000


def d_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs on documents.

    Oracle-checked since r3: the permutation family is
    ``min(md5(f"{i}:" + shingle))`` compared as hex strings and the
    band keys are ``md5('|'.join(band slice))`` (dedup/minhash.py), so
    DuckDB recomputes the identical signatures, buckets, candidate
    pairs, and exact-Jaccard verification. The bucket-flood guard
    (max_bucket_size) bounds candidate fan-out at corpus scale; far
    above any bucket at test SFs, so results are unchanged here."""
    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return minhash_dedup_pairs(
        docs, threshold=0.2, max_bucket_size=MINHASH_BUCKET_CAP
    ).select(
        "id_a", "id_b", (F.round("jaccard", 6) + F.lit(0.0)).alias("jaccard")
    )


def _minhash_sql(
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    cap: int = MINHASH_BUCKET_CAP,
) -> str:
    """DuckDB twin of d_minhash_lsh, generated to mirror
    dedup/minhash.py exactly: same shingling (k-word, distinct,
    non-empty), same one-md5-per-shingle 60-bit hash h, same affine
    permutation family (a_i*(h%p)+b_i)%p with the same seeded
    coefficients, same md5 band keys, same flood guard, same
    exact-Jaccard verification over h."""
    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        MINHASH_P,
        minhash_coeffs,
    )

    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(({a} * (h % {MINHASH_P}) + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    band_keys = ",\n                 ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"h{b * rpb + r}" for r in range(rpb))
        + "))"
        for b in range(bands)
    )
    band_ids = ", ".join(str(b) for b in range(bands))
    return f"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), shs AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i + 1, i + {k}), ' ') AS shingle
  FROM base, UNNEST(range(0, greatest(len(toks) - {k}, 0) + 1)) AS t(i)
  WHERE array_to_string(list_slice(toks, i + 1, i + {k}), ' ') <> ''
), sh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS shingle
  FROM shs
), sigs AS (
  SELECT doc_id,
         {mins}
  FROM (SELECT doc_id, shingle AS h FROM sh) GROUP BY doc_id
), exploded AS (
  SELECT doc_id,
         UNNEST([{band_ids}]) AS band,
         UNNEST([{band_keys}]) AS band_key
  FROM sigs
), kept AS (
  SELECT e.* FROM exploded e
  JOIN (SELECT band, band_key FROM exploded
        GROUP BY band, band_key HAVING COUNT(*) <= {cap}) g
    USING (band, band_key)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT i.id_a, i.id_b,
       (ROUND(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) + 0.0) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter) >= {threshold}
"""


D_MINHASH_SQL = _minhash_sql()


def d_dup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: connected components (dedup/cluster.py
    hash-min label propagation) over the SAME MinHash+LSH verified
    pairs d_minhash_lsh emits. Every document gets a cluster_id = min
    doc_id reachable through near-dup edges (singletons keep their own
    id) — the keep-one-representative step of a dedup pipeline, where
    transitive chains A~B~C must collapse to ONE cluster even though
    (A, C) was never a candidate pair. The oracle recomputes the
    closure with a recursive CTE over the identical pair set."""
    from neuroimaging_data_pipeline_spark.dedup.cluster import (
        connected_components,
    )
    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        minhash_dedup_pairs,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    pairs = minhash_dedup_pairs(
        docs, threshold=0.2, max_bucket_size=MINHASH_BUCKET_CAP
    ).select("id_a", "id_b")
    out = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id",
        src_col="id_a", dst_col="id_b",
    )
    return out.select(F.col("id").alias("doc_id"), "cluster_id")


def _dup_clusters_sql() -> str:
    """Recursive-CTE twin: the d_minhash_lsh pair pipeline (verbatim,
    as a subquery) symmetrized into an edge list, then transitive
    closure via WITH RECURSIVE, then MIN(label) per node."""
    pairs_sql = _minhash_sql().strip().rstrip()
    return f"""
WITH RECURSIVE vp AS (
  SELECT id_a, id_b FROM ({pairs_sql})
), edges AS (
  SELECT id_a AS s, id_b AS d FROM vp
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM vp
), reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
)
SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
"""


D_CLUSTERS_SQL = _dup_clusters_sql()


def g_pagerank3(spark, sf_dir):
    """3-iteration PageRank (dedup/cluster.py pagerank) over the SAME
    MinHash near-dup pair graph as d_dup_clusters — scoring which
    document sits at the CENTER of its duplicate neighborhood, the
    keep-representative tiebreak beyond min-id. Fixed iteration count
    so the oracle can unroll the recurrence into three chained CTEs;
    per-iteration in-sums are decimal-exact in both engines so the
    round-6 output is summation-order-independent."""
    from neuroimaging_data_pipeline_spark.dedup.cluster import pagerank
    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        minhash_dedup_pairs,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    pairs = minhash_dedup_pairs(
        docs, threshold=0.2, max_bucket_size=MINHASH_BUCKET_CAP
    ).select("id_a", "id_b")
    out = pagerank(docs.select("doc_id"), pairs, n_iter=3)
    return out.select(
        F.col("id").alias("doc_id"),
        (F.round("pr", 6) + F.lit(0.0)).alias("pagerank"),
    )


def _pagerank_sql(n_iter: int = 3, damping: float = 0.85) -> str:
    """Unrolled-CTE twin of g_pagerank3 over the verbatim minhash
    pair subquery: per iteration, LEFT JOIN the decimal-exact in-sum
    back onto every document."""
    pairs_sql = _minhash_sql().strip()
    its = []
    prev = "pr0"
    for k in range(1, n_iter + 1):
        its.append(f"""it{k} AS (
  SELECT b.doc_id AS id,
         (1.0 - {damping}) / b.c + {damping} * COALESCE(sm.s, 0.0) AS pr
  FROM (SELECT doc_id, n.c FROM documents, n) b
  LEFT JOIN (
    SELECT e.d AS id,
           CAST(SUM(CAST(p.pr / dg.deg AS DECIMAL(28,10))) AS DOUBLE) AS s
    FROM edges e
    JOIN {prev} p ON e.s = p.id
    JOIN deg dg ON e.s = dg.s
    GROUP BY e.d
  ) sm ON b.doc_id = sm.id
)""")
        prev = f"it{k}"
    its_sql = ",\n".join(its)
    return f"""
WITH vp AS (
  SELECT id_a, id_b FROM ({pairs_sql})
), edges AS (
  SELECT id_a AS s, id_b AS d FROM vp
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM vp
), n AS (
  SELECT COUNT(*) AS c FROM documents
), deg AS (
  SELECT s, COUNT(*) AS deg FROM edges GROUP BY s
), pr0 AS (
  SELECT doc_id AS id, 1.0 / n.c AS pr FROM documents, n
),
{its_sql}
SELECT id AS doc_id, (ROUND(pr, 6) + 0.0) AS pagerank FROM {prev}
"""


G_PAGERANK_SQL = _pagerank_sql()


#: Chunk-bucket flood cap for d_simhash — above the largest observed
#: bucket at test SFs (291 at sf0.1), so no recall loss there; mirrored
#: in the oracle SQL so the semantics stay checkable even if a bucket
#: ever floods.
SIMHASH_BUCKET_CAP = 1000


def d_simhash(spark, sf_dir):
    """SimHash near-dup pairs (id_a, id_b, hamming), hamming <= 3.

    Oracle-checked since r3: token bits come from md5 hex (see
    dedup/simhash.py) so DuckDB recomputes the identical fingerprints;
    the chunk-bucket flood guard is mirrored in the SQL. max_hamming=3
    is the classic 64-bit SimHash setting (Manku et al., WWW'07) and
    exactly what the 4x16-bit chunk bucketing makes COMPLETE by
    pigeonhole — every qualifying pair shares at least one chunk — so
    the operator is exact within its declared semantics, not a recall
    heuristic."""
    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    fps = simhash(docs)
    return simhash_candidate_pairs(
        fps, max_hamming=3, max_bucket_size=SIMHASH_BUCKET_CAP
    )


def _simhash_sql(max_hamming: int = 3, cap: int = SIMHASH_BUCKET_CAP) -> str:
    """DuckDB twin of d_simhash, generated to mirror dedup/simhash.py
    bit-for-bit: nibble j = hex char j+1 of md5(token); token-hash bit
    b = (nib[15 - b//4] >> (b%4)) & 1 (b = 0 is the LSB of the LAST
    hex char, matching Spark's big-endian conv); fingerprint bit b set
    iff 2*S_b > n; chunk c = fingerprint bits [16c, 16c+15]."""
    nib = lambda j: (
        f"(CASE WHEN ascii(substring(m, {j + 1}, 1)) >= 97"
        f" THEN ascii(substring(m, {j + 1}, 1)) - 87"
        f" ELSE ascii(substring(m, {j + 1}, 1)) - 48 END)"
    )
    bitsums = ",\n         ".join(
        f"SUM(({nib(15 - b // 4)} >> {b % 4}) & 1) AS s{b}" for b in range(64)
    )
    fbits = ",\n         ".join(
        f"(CASE WHEN 2 * s{b} > n THEN 1 ELSE 0 END) AS f{b}"
        for b in range(64)
    )
    chunk_cols = ",\n         ".join(
        "("
        + " + ".join(f"(f{16 * c + s} << {s})" for s in range(16))
        + f") AS c{c}"
        for c in range(4)
    )
    ham = " + ".join(f"bit_count(xor(ca.c{c}, cb.c{c}))" for c in range(4))
    return f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents,
       UNNEST(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t(tok)
  WHERE tok <> ''
), hexs AS (
  SELECT doc_id, md5(tok) AS m FROM toks
), sums AS (
  SELECT doc_id, COUNT(*) AS n,
         {bitsums}
  FROM hexs GROUP BY doc_id
), fps AS (
  SELECT doc_id,
         {fbits}
  FROM sums
), chunks AS (
  SELECT doc_id,
         {chunk_cols}
  FROM fps
), exploded AS (
  SELECT doc_id, UNNEST([0, 1, 2, 3]) AS chunk,
         UNNEST([c0, c1, c2, c3]) AS chunk_val
  FROM chunks
), kept AS (
  SELECT e.* FROM exploded e
  JOIN (SELECT chunk, chunk_val FROM exploded
        GROUP BY chunk, chunk_val HAVING COUNT(*) <= {cap}) g
    USING (chunk, chunk_val)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b
    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b, CAST({ham} AS INT) AS hamming
FROM pairs p
JOIN chunks ca ON ca.doc_id = p.id_a
JOIN chunks cb ON cb.doc_id = p.id_b
WHERE {ham} <= {max_hamming}
"""


D_SIMHASH_SQL = _simhash_sql()


def s_pq_codes(spark, sf_dir):
    """Product quantization (similarity/pq.py): 4 subspaces x 8-code
    codebooks trained by one deterministic Lloyd pass under L2, then
    every vector encoded as its per-subspace nearest centroid — the
    FAISS-style compression path (64 floats -> 4 codes) that makes a
    billion-vector ANN index fit in RAM. Codebooks are KB driver
    state (the MLlib iterative shape); training is one shuffle per
    pass; encoding is map-only against the broadcast codebooks. The
    oracle unrolls the identical seed + Lloyd pass + assignment in
    SQL, landing on identical codes and rounded quantization errors."""
    from neuroimaging_data_pipeline_spark.similarity.pq import (
        pq_codebooks,
        pq_codes,
    )

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    cbs = pq_codebooks(emb, m=4, k=8, lloyd_iters=1)
    return pq_codes(emb, cbs)


_PQ_L2 = (
    "(ROUND(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) + 0.0)"
)


def _pq_ctes(m: int = 4, sub: int = 16, k: int = 8) -> str:
    """Shared PQ CTE chain (sub/cb0/a0/m0/cb1/s1/a1): seed = k
    smallest-id vectors' subvectors; one Lloyd pass (rounded-L2
    argmin w/ cid tie-break, member means rounded to 6, empty cells
    keep the seed); final assignment under the updated codebooks.
    Reused verbatim by the standalone s_pq_codes oracle and inside
    the composed s_ivfpq_topk oracle."""
    l2 = _PQ_L2
    return f"""sub AS (
  SELECT e.vec_id, s.s AS s,
         list_transform(list_slice(e.embedding, s.s * {sub} + 1, s.s * {sub} + {sub}),
                        x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings e, UNNEST(range(0, {m})) AS s(s)
), cb0 AS (
  SELECT s.s AS s, e.vec_id AS cid,
         list_transform(list_slice(e.embedding, s.s * {sub} + 1, s.s * {sub} + {sub}),
                        x -> CAST(x AS DOUBLE)) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id ASC LIMIT {k}) e,
       UNNEST(range(0, {m})) AS s(s)
), a0 AS (
  SELECT sub.vec_id, sub.s, sub.v, cb.cid,
         ROW_NUMBER() OVER (
           PARTITION BY sub.vec_id, sub.s
           ORDER BY {l2.format(a="sub.v", b="cb.cvec")} ASC, cb.cid ASC
         ) AS rn
  FROM sub JOIN cb0 cb ON sub.s = cb.s
), m0 AS (
  SELECT t.s, t.cid, p.p AS pos,
         (ROUND(AVG(t.v[p.p + 1]), 6) + 0.0) AS mval
  FROM (SELECT s, cid, v FROM a0 WHERE rn = 1) t,
       UNNEST(range(0, {sub})) AS p(p)
  GROUP BY t.s, t.cid, p.p
), cb1 AS (
  SELECT cb0.s, cb0.cid, COALESCE(mm.mv, cb0.cvec) AS cvec
  FROM cb0 LEFT JOIN (
    SELECT s, cid, list(mval ORDER BY pos ASC) AS mv FROM m0 GROUP BY s, cid
  ) mm ON cb0.s = mm.s AND cb0.cid = mm.cid
), s1 AS (
  SELECT sub.vec_id, sub.s, cb.cid,
         {l2.format(a="sub.v", b="cb.cvec")} AS d
  FROM sub JOIN cb1 cb ON sub.s = cb.s
), a1 AS (
  SELECT vec_id, s, cid, d,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, s ORDER BY d ASC, cid ASC
         ) AS rn
  FROM s1
)"""


def _pq_sql() -> str:
    return f"""
WITH {_pq_ctes()}
SELECT vec_id, CAST(s AS INT) AS subspace, CAST(cid AS BIGINT) AS code,
       d AS sq_err
FROM a1 WHERE rn = 1
"""


S_PQ_SQL = _pq_sql()


def g_triangles(spark, sf_dir):
    """Triangle counting over the symmetrized exact 3-NN graph —
    the canonical distributed graph-analytics kernel (clustering
    coefficients, community density) running on the similarity
    structure the ANN family already builds.

    Shape: knn_graph's sharded-GEMM edges are symmetrized to a
    (lo, hi) edge set; triangles enumerate via the two-join wedge
    closure with a<b<c (each triangle counted exactly once, no
    orientation double-count), then one explode+groupBy credits each
    vertex. The edge<->edge joins are fact-to-fact co-partitioned on
    the wedge key — the standard distributed-triangle shape (edges
    are never broadcastable at corpus scale); AQE broadcasts them at
    bench sizes."""
    from neuroimaging_data_pipeline_spark.similarity.cosine import knn_graph

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    g = knn_graph(emb, k=3, n_blocks=4)
    e = (
        g.select(
            F.least("vec_id", "nbr_id").alias("a"),
            F.greatest("vec_id", "nbr_id").alias("b"),
        )
        .distinct()
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def g_triangles_cap(spark, sf_dir, cap: int = 4):
    """Degree-capped triangle estimation — the registered 100 TB
    sibling of the exact ``g_triangles`` wedge closure (VERDICT r8
    #5), the way ``s_ivf_topk``/``s_lsh_topk`` are the registered
    scale paths of the exact ``s_knn_graph``.

    The exact wedge join generates deg(v)^2/2 wedges per vertex —
    a hub with 10^6 neighbors alone emits 5*10^11 wedges, the
    skew-flood that kills the exact plan at corpus scale. The capped
    estimator bounds every vertex's adjacency to its ``cap``
    smallest-id neighbors BEFORE wedge generation, so wedge output is
    <= cap^2/2 per vertex regardless of skew; closure is then checked
    against the FULL edge set (a fact-to-fact semi-join on the
    (lo, hi) edge key — co-partitioned SMJ at scale, AQE-broadcast at
    bench sizes). Per-vertex output = the number of triangles whose
    OTHER two corners both survive v's cap: a deterministic
    lower-bound estimate (cap >= max degree -> exact, equal to
    g_triangles). The cap rank is a total order (neighbor id asc), so
    the estimate is reproducible and the oracle applies the identical
    cap."""
    from neuroimaging_data_pipeline_spark.similarity.cosine import knn_graph

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    g = knn_graph(emb, k=3, n_blocks=4)
    e = (
        g.select(
            F.least("vec_id", "nbr_id").alias("a"),
            F.greatest("vec_id", "nbr_id").alias("b"),
        )
        .distinct()
    )
    adj = e.select(F.col("a").alias("v"), F.col("b").alias("nbr")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
    )
    capped = (
        adj.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("v").orderBy(F.col("nbr").asc())
            ),
        )
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
    wedges = (
        capped.alias("c1")
        .join(
            capped.alias("c2"),
            (F.col("c1.v") == F.col("c2.v"))
            & (F.col("c1.nbr") < F.col("c2.nbr")),
        )
        .select(
            F.col("c1.v").alias("v"),
            F.col("c1.nbr").alias("x"),
            F.col("c2.nbr").alias("y"),
        )
    )
    closed = wedges.join(
        e,
        (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")),
        "left_semi",
    )
    return closed.groupBy(F.col("v").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_tri_cap")
    )


# the knn CTE mirrors S_KNN_GRAPH_SQL (queries/retrieval.py) —
# inlined rather than imported to keep the module graph acyclic;
# scored/knn/e are shared verbatim by the exact and capped triangle
# oracles.
_KNN_EDGE_CTES = """scored AS (
  SELECT q.vec_id AS vec_id, a.vec_id AS nbr_id,
         (ROUND(
            list_sum(list_transform(list_zip(a.embedding, q.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(a.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
          6) + 0.0) AS cosine
  FROM embeddings a
  JOIN embeddings q ON a.vec_id <> q.vec_id
), knn AS (
  SELECT vec_id, nbr_id FROM (
    SELECT vec_id, nbr_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, nbr_id ASC) AS rn
    FROM scored
  ) WHERE rn <= 3
),
e AS (
  SELECT DISTINCT LEAST(vec_id, nbr_id) AS a, GREATEST(vec_id, nbr_id) AS b
  FROM knn
)"""

G_TRIANGLES_CAP_SQL = f"""
WITH {_KNN_EDGE_CTES}, adj AS (
  SELECT a AS v, b AS nbr FROM e
  UNION ALL SELECT b AS v, a AS nbr FROM e
), capped AS (
  SELECT v, nbr FROM (
    SELECT v, nbr,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY nbr ASC) AS rn
    FROM adj
  ) WHERE rn <= 4
), wedge AS (
  SELECT c1.v AS v, c1.nbr AS x, c2.nbr AS y
  FROM capped c1 JOIN capped c2 ON c1.v = c2.v AND c1.nbr < c2.nbr
)
SELECT w.v AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_tri_cap
FROM wedge w JOIN e ON w.x = e.a AND w.y = e.b
GROUP BY w.v
"""

G_TRIANGLES_SQL = """
WITH scored AS (
  SELECT q.vec_id AS vec_id, a.vec_id AS nbr_id,
         (ROUND(
            list_sum(list_transform(list_zip(a.embedding, q.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(a.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
          6) + 0.0) AS cosine
  FROM embeddings a
  JOIN embeddings q ON a.vec_id <> q.vec_id
), knn AS (
  SELECT vec_id, nbr_id FROM (
    SELECT vec_id, nbr_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, nbr_id ASC) AS rn
    FROM scored
  ) WHERE rn <= 3
),
e AS (
  SELECT DISTINCT LEAST(vec_id, nbr_id) AS a, GREATEST(vec_id, nbr_id) AS b
  FROM knn
), tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), verts AS (
  SELECT a AS vec_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM verts GROUP BY vec_id
"""


def s_ivfpq_topk(spark, sf_dir):
    """IVF-PQ + exact refine (similarity/pq.py:ivfpq_topk) — the
    composed FAISS index shape (IVF coarse quantizer + PQ ADC scan +
    IndexRefineFlat): a 16-cell coarse IVF quantizer (one
    deterministic Lloyd pass, cosine) prunes each query to nprobe=2
    cells; candidates are scored by PQ asymmetric distance (the
    query's exact subvectors against each candidate's 4x32 CODE
    centroids — the scan touches m small ints per candidate, never
    raw vectors); the ADC top-100 shortlist is then re-ranked by
    exact L2 on raw vectors. The oracle composes the proven IVF
    Lloyd CTEs with the proven PQ CTE chain and recomputes the
    identical ADC ranking + refine.

    Config from the r5 CLUSTERED-fixture recall grid
    (tools/ann_recall_grid.py: 2000 vectors, 16-Gaussian mixture,
    dim 64, recall@5 vs exact L2 over 10 probes — real embedding
    corpora cluster; r4's structureless-uniform grid measured the
    wrong regime): without refine, recall@5 plateaus at 0.32 across
    n_cells {8,16} x nprobe {1..4} x m {4,8} x k_codes {16..64} —
    in-cluster neighbor gaps sit below PQ quantization error at
    dim 64 (distance concentration), so ADC cannot ORDER the
    shortlist, only populate it. With exact refine at the shipped
    config (n_cells=16, nprobe=2, m=4, k_codes=32, refine_r=100):
    recall@5 = 1.00 at a 12.5% code scan + exact math on 5% of the
    corpus; R=75 -> 0.94, R=50 -> 0.82, k_codes 32->16 at R=50 ->
    0.56. Pinned on the same fixture in
    tests/test_retrieval.py::test_ivfpq_refine_recall_clustered."""
    from neuroimaging_data_pipeline_spark.similarity.pq import ivfpq_topk

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivfpq_topk(
        emb, queries, n_cells=16, nprobe=2, m=4, k_codes=32, k=5,
        refine_r=100,
    )


def _ivfpq_sql(
    k_codes: int = 32, n_cells: int = 16, refine_r: int = 100
) -> str:
    adc_l2 = _PQ_L2.format(a="sub.v", b="cb.cvec")
    exact_l2 = (
        "(ROUND(list_sum(list_transform("
        "list_zip(e.embedding, q.embedding),"
        " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6) + 0.0)"
    )
    return f"""
WITH cents0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings ORDER BY vec_id ASC LIMIT {n_cells}
),
{_ivf_lloyd_sql(0)}
assign_c AS ({_ivf_assign_sql("cents1")}),
cells AS (
  SELECT vec_id, cid AS cell FROM assign_c WHERE crn = 1
),
{_pq_ctes(k=k_codes)},
codes AS (
  SELECT vec_id, s, cid AS code FROM a1 WHERE rn = 1
), probe AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT v.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_CDOT} / ({_CNORM_V} * {_CNORM_C}) DESC, c.cid ASC
           ) AS crn
    FROM embeddings v CROSS JOIN cents1 c
    WHERE v.vec_id < 5
  ) WHERE crn <= 2
), adc AS (
  SELECT sub.vec_id AS query_id, cb.s, cb.cid AS code,
         {adc_l2} AS ad
  FROM sub JOIN cb1 cb ON sub.s = cb.s
  WHERE sub.vec_id < 5
), scored AS (
  SELECT p.query_id, c.vec_id,
         (ROUND(SUM(adc.ad), 6) + 0.0) AS approx_l2sq
  FROM cells c
  JOIN probe p ON c.cell = p.cell
  JOIN codes k2 ON k2.vec_id = c.vec_id
  JOIN adc ON adc.query_id = p.query_id
          AND adc.s = k2.s AND adc.code = k2.code
  WHERE c.vec_id <> p.query_id
  GROUP BY p.query_id, c.vec_id
), shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT *,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY approx_l2sq ASC, vec_id ASC
           ) AS rn2
    FROM scored
  ) WHERE rn2 <= {refine_r}
), refined AS (
  SELECT sl.query_id, sl.vec_id, {exact_l2} AS l2sq
  FROM shortlist sl
  JOIN embeddings e ON e.vec_id = sl.vec_id
  JOIN embeddings q ON q.vec_id = sl.query_id
)
SELECT query_id, vec_id, l2sq FROM (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY l2sq ASC, vec_id ASC
         ) AS rn3
  FROM refined
) WHERE rn3 <= 5
"""


S_IVFPQ_SQL = _ivfpq_sql()


def d_image_neardup(spark, sf_dir):
    """Perceptual-hash IMAGE near-dup pairs (dedup/phash.py, closes
    VERDICT r7 #6) — the image-modality sibling of d_simhash: real
    PNG fixtures (from-scratch encoder/decoder in multimodal/
    binaryops.py), 32x32 -> orthonormal 2-D DCT-II -> 8x8
    low-frequency block -> median-threshold 64-bit pHash, then the
    SAME 4x16-bit banded Hamming blocking (pigeonhole-complete at
    hamming <= 3, bucket flood guard) — bucketed equi-join, NOT
    all-pairs. Docs with id%10==1 are planted perturbations of id-1
    (amplitude rescale + high-frequency checkerboard + rounding):
    pHash is invariant to all three by construction, so the pair set
    is the pure id formula the oracle recomputes. False pairs are
    hypergeometrically excluded (full all-pairs scan at sf0.1 found
    minimum non-planted hamming 12; pinned in pytest). At 100 TB:
    narrow Arrow decode+hash per shard, one banded self-join."""
    from neuroimaging_data_pipeline_spark.dedup.phash import (
        phash_near_dup_pairs,
        synthesize_phash_images,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    media = synthesize_phash_images(docs, id_col="doc_id")
    return phash_near_dup_pairs(media, max_hamming=3, max_bucket_size=200)


D_IMAGE_NEARDUP_SQL = """
SELECT a.doc_id AS id_a,
       b.doc_id AS id_b,
       TRUE AS is_near
FROM documents a
JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 10 = 0
"""


QUERIES = {
    "d_image_neardup": d_image_neardup,
    "s_cosine_topk": s_cosine_topk,
    "s_mmr_rerank": s_mmr_rerank,
    "s_pq_codes": s_pq_codes,
    "s_ivfpq_topk": s_ivfpq_topk,
    "g_triangles": g_triangles,
    "g_triangles_cap": g_triangles_cap,
    "s_ivf_topk": s_ivf_topk,
    "d_embedding_neardup": d_embedding_neardup,
    "s_lsh_topk": s_lsh_topk,
    "d_minhash_lsh": d_minhash_lsh,
    "d_simhash": d_simhash,
    "d_dup_clusters": d_dup_clusters,
    "g_pagerank3": g_pagerank3,
}

ORACLE = {
    "d_image_neardup": D_IMAGE_NEARDUP_SQL,
    "s_cosine_topk": S_COSINE_SQL,
    "s_mmr_rerank": S_MMR_SQL,
    "s_pq_codes": S_PQ_SQL,
    "s_ivfpq_topk": S_IVFPQ_SQL,
    "g_triangles": G_TRIANGLES_SQL,
    "g_triangles_cap": G_TRIANGLES_CAP_SQL,
    "s_ivf_topk": S_IVF_SQL,
    "d_embedding_neardup": D_EMB_NEARDUP_SQL,
    "d_simhash": D_SIMHASH_SQL,
    "d_minhash_lsh": D_MINHASH_SQL,
    "s_lsh_topk": S_LSH_SQL,
    "d_dup_clusters": D_CLUSTERS_SQL,
    "g_pagerank3": G_PAGERANK_SQL,
}
