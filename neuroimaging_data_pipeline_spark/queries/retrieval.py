"""Retrieval + corpus-curation query surface (late-r4, sixth pass).

The remaining first-class training-data-pipeline shapes the engine
had not yet registered:

- ranking retrieval: ``s_bm25_topk`` (decontamination / quality
  audits by probe query);
- neighbor structure: ``s_knn_graph`` (exact blocked-GEMM k-NN
  graph), ``d_semdedup`` (SemDeDup, Abbas et al. 2023),
  ``s_quantize_int8`` (SQ8 vector compression);
- corpus composition: ``t_mix_sample`` (Pile/Dolma-style mixture
  rates), ``t_source_cap`` (per-domain cap), ``t_chunk`` (RAG
  sliding windows), ``t_pack_blocks`` (GPT concat-and-chop packing);
- tokenization: ``t_bpe_train`` / ``t_bpe_tokens`` (distributed BPE,
  training oracle-checked round-for-round);
- corpus QA / models: ``t_ks_drift`` (exact two-sample KS per
  source), ``a_logreg_gd`` (full-batch-GD quality classifier with an
  unrolled-CTE oracle).

Registered after the window-priority modules — their driver-window
slots stay with the ts-repinned event-time queries; green rows come
from the sf0.01 + sf0.1 replica runs in SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.drift import (
    auc_drift_sql,
    ks_drift_sql,
)
from neuroimaging_data_pipeline_spark.sources.tables import read_table
from neuroimaging_data_pipeline_spark.text.mixing import (
    epoch_shuffle_sql,
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
    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
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

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
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

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
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

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return mixture_sample(docs, MIX_THRESHOLDS).select(
        "doc_id", "source", "bucket"
    )


T_MIX_SAMPLE_SQL = mixture_sample_sql(MIX_THRESHOLDS)


def t_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle (text/mixing.py epoch_shuffle) —
    the before-every-epoch global permutation a training pipeline
    runs: order key = content-addressed md5 of (epoch seed, doc_id),
    reproducible across runs/engines/partitionings (rand() is none of
    those, and a resumed epoch must not re-deal what loaders already
    read); shard = 60-bit hash prefix mod 8 (uniform, no loader
    skew); pos = rank within shard. ONE shuffle at any scale:
    partition by shard + sort within partition is exactly this
    window's plan. The oracle recomputes key, shard and rank."""
    from neuroimaging_data_pipeline_spark.text.mixing import epoch_shuffle

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return epoch_shuffle(docs, key_col="doc_id")


T_EPOCH_SHUFFLE_SQL = epoch_shuffle_sql()



#: Merge rounds for the BPE queries — small enough to keep the
#: unrolled oracle readable, large enough to cross several merge
#: "generations" (char+char, then subword+char, then subword+subword).
BPE_N_MERGES = 8


def t_bpe_train(spark, sf_dir):
    """Distributed BPE TRAINING on the documents corpus
    (text/bpe.py): the corpus collapses to a (word, freq) vocab table
    in one pass, then each of the 8 merge rounds is an exact integer
    pair-count + argmax + one replace() apply over that table — the
    k-means/PageRank iterative shape, with one KB-sized best-pair row
    on the driver per round. Output is the learned merge table
    (rank, a, b, cnt); the oracle unrolls the identical 8 rounds in
    SQL, so TRAINING is oracle-checked round-for-round."""
    from neuroimaging_data_pipeline_spark.text.bpe import bpe_train

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    merges = bpe_train(docs, BPE_N_MERGES)
    return spark.createDataFrame(
        [(m["rank"], m["a"], m["b"], int(m["cnt"])) for m in merges],
        "rank int, a string, b string, cnt long",
    )


def t_bpe_tokens(spark, sf_dir):
    """BPE train-then-tokenize end-to-end: learn the 8 merges, then
    count subword tokens per document with the zero-shuffle
    expression-only apply pass (each merge is ONE framed-pair string
    replace — no Python in the hot path). Oracle = the train rounds'
    CTEs feeding the same replace chain per document."""
    from neuroimaging_data_pipeline_spark.text.bpe import (
        bpe_token_counts,
        bpe_train,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    merges = bpe_train(docs, BPE_N_MERGES)
    return bpe_token_counts(docs, [(m["a"], m["b"]) for m in merges])


_BPE_TOKS = (
    "list_filter(string_split(regexp_replace(lower(trim(text)),"
    " '\\s+', ' ', 'g'), ' '), t -> t <> '')"
)


def _bpe_rounds_sql(n: int) -> str:
    """WITH-clause body unrolling n BPE training rounds: vocab0 is the
    framed (word, freq) vocabulary; each round derives adjacent pairs
    by index, argmaxes with the (cnt desc, a asc, b asc) tie-break,
    and applies the winner with the same framed-pair replace the
    engine uses (left-to-right non-overlapping scan in both)."""
    parts = [f"""words AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, UNNEST({_BPE_TOKS}) AS u(tok)
  GROUP BY tok
), vocab0 AS (
  SELECT word, freq,
         array_to_string(list_transform(string_split(word, ''),
                         c -> chr(2) || c || chr(3)), '')
         || chr(2) || '</w>' || chr(3) AS enc
  FROM words
)"""]
    for i in range(n):
        parts.append(f"""syms{i} AS (
  SELECT freq, string_split(substr(enc, 2, len(enc) - 2), chr(3) || chr(2)) AS syms
  FROM vocab{i}
), pairs{i} AS (
  SELECT s.syms[i] AS a, s.syms[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM syms{i} s, UNNEST(range(1, len(s.syms))) AS t(i)
  GROUP BY s.syms[i], s.syms[i + 1]
), best{i} AS (
  SELECT a, b, cnt FROM pairs{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
), vocab{i + 1} AS (
  SELECT v.word, v.freq,
         replace(v.enc,
                 chr(2) || b.a || chr(3) || chr(2) || b.b || chr(3),
                 chr(2) || b.a || b.b || chr(3)) AS enc
  FROM vocab{i} v CROSS JOIN best{i} b
)""")
    return ",\n".join(parts)


def _bpe_train_sql(n: int = BPE_N_MERGES) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, a, b, cnt FROM best{i}" for i in range(n)
    )
    return f"""
WITH {_bpe_rounds_sql(n)}
SELECT CAST(rank AS INT) AS rank, a, b, cnt FROM ({union})
"""


def _bpe_tokens_sql(n: int = BPE_N_MERGES) -> str:
    # the apply chain: every best{i} cross-joined in as a scalar row,
    # nested replaces in rank order, token count = STX count
    rep = "e"
    for i in range(n):
        rep = (
            f"replace({rep}, chr(2) || b{i}.a || chr(3) || chr(2) || b{i}.b || chr(3),"
            f" chr(2) || b{i}.a || b{i}.b || chr(3))"
        )
    crosses = " ".join(f"CROSS JOIN best{i} b{i}" for i in range(n))
    return f"""
WITH {_bpe_rounds_sql(n)},
docs_enc AS (
  SELECT doc_id,
         list_transform({_BPE_TOKS},
           w -> array_to_string(list_transform(string_split(w, ''),
                                c -> chr(2) || c || chr(3)), '')
                || chr(2) || '</w>' || chr(3)) AS encs
  FROM documents
)
SELECT d.doc_id,
       CAST(len(d.encs) AS BIGINT) AS n_words,
       CAST(COALESCE(list_sum(list_transform(d.encs,
              e -> len({rep}) - len(replace({rep}, chr(2), '')))), 0) AS BIGINT)
         AS n_bpe_tokens
FROM docs_enc d {crosses}
"""


T_BPE_TRAIN_SQL = _bpe_train_sql()
T_BPE_TOKENS_SQL = _bpe_tokens_sql()


def t_ks_drift(spark, sf_dir):
    """Exact two-sample KS drift per source (operators/drift.py):
    each source's doc-length distribution against the rest of the
    corpus, assembled in pure integer arithmetic (only the final max
    is divided/rounded) — the distribution-free source-QA monitor.
    Window work runs on the bounded distinct-value grid, never the
    corpus rows."""
    from neuroimaging_data_pipeline_spark.operators.drift import ks_drift

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return ks_drift(docs, "n_chars", "source")


T_KS_DRIFT_SQL = ks_drift_sql("n_chars", "source")


def t_auc_drift(spark, sf_dir):
    """Mann-Whitney AUC drift per source (operators/drift.py
    auc_drift): P(source value > rest) + half-ties — the
    stochastic-dominance EFFECT SIZE next to t_ks_drift's
    max-deviation statistic (0.5 = no shift). Pure integer rank
    assembly on the bounded distinct-value grid; only the final
    division is floating point."""
    from neuroimaging_data_pipeline_spark.operators.drift import auc_drift

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return auc_drift(docs, "n_chars", "source")


T_AUC_DRIFT_SQL = auc_drift_sql("n_chars", "source")


def t_source_cap(spark, sf_dir):
    """Per-domain cap (text/mixing.py:source_cap): keep at most 10
    docs per source by deterministic md5 priority — the
    over-represented-domain limiter next to rate-based t_mix_sample.
    One row_number window on the group key; the kept subset is an
    unbiased, engine/run/partitioning-stable sample."""
    from neuroimaging_data_pipeline_spark.text.mixing import source_cap

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return source_cap(docs, cap=10)


def s_quantize_int8(spark, sf_dir):
    """Int8 scalar quantization summary (similarity/quantize.py):
    per-vector (min, max, integer code checksum, mean reconstruction
    error) — the FAISS-SQ8-style 4x compression an ANN index applies
    before sharding at 100 TB. Map-only, zero shuffle, no Python."""
    from neuroimaging_data_pipeline_spark.similarity.quantize import (
        quantize_int8_summary,
    )

    emb = read_table(spark, sf_dir, "embeddings", min_partitions="cores")
    return quantize_int8_summary(emb)


from neuroimaging_data_pipeline_spark.similarity.quantize import (  # noqa: E402
    quantize_int8_sql,
)
from neuroimaging_data_pipeline_spark.text.mixing import (  # noqa: E402
    source_cap_sql,
)

def t_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (text/mixing.py
    weighted_sample): 8 docs per source, probability proportional to
    doc length — Efraimidis-Spirakis priorities on content-addressed
    md5 uniforms, so the importance sample is deterministic across
    engines/runs/partitionings. One row_number window per group."""
    from neuroimaging_data_pipeline_spark.text.mixing import weighted_sample

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return weighted_sample(docs, k=8, weight_col="n_chars")


from neuroimaging_data_pipeline_spark.text.mixing import (  # noqa: E402
    weighted_sample_sql,
)

T_WEIGHTED_SAMPLE_SQL = weighted_sample_sql(k=8, weight_col="n_chars")


T_SOURCE_CAP_SQL = source_cap_sql(cap=10)
S_QUANTIZE_SQL = quantize_int8_sql()


#: Feature/label expressions for a_logreg_gd, form-identical in both
#: engines (intercept, scaled doc length, scaled token count; label =
#: is-English). The OPERATOR is the point — a fastText-style quality/
#: filter classifier trained in-engine; the toy feature set keeps the
#: oracle readable.
_LR_TOKN = (
    "len(list_filter(string_split(regexp_replace(lower(trim(text)),"
    " '\\s+', ' ', 'g'), ' '), t -> t <> ''))"
)
_LR_FEATS_CTE = f"""feats AS (
  SELECT 1.0 AS x0,
         n_chars / 100.0 AS x1,
         {_LR_TOKN} / 10.0 AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)"""


def a_logreg_gd(spark, sf_dir):
    """Distributed logistic regression by full-batch gradient descent
    (operators/logreg.py): 3 iterations, each ONE corpus aggregate of
    DECIMAL-summed gradient components with the weight vector as KB
    driver state — the model-based quality-filter trainer. Output is
    the weight trajectory after each iteration; the oracle unrolls
    the identical updates as chained CTEs, so the whole optimization
    path is oracle-checked."""
    from neuroimaging_data_pipeline_spark.operators.logreg import logreg_gd
    from neuroimaging_data_pipeline_spark.text.bpe import _norm_words

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    feats = docs.select(
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / F.lit(100.0)).alias("x1"),
        (F.size(_norm_words(F.col("text"))) / F.lit(10.0)).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    traj = logreg_gd(feats, ["x0", "x1", "x2"], "y", n_iters=3, lr=0.1)
    raw = spark.createDataFrame(
        [(i + 1, *w) for i, w in enumerate(traj)],
        "iter int, r0 double, r1 double, r2 double",
    )
    return raw.select(
        "iter",
        *[
            (F.round(F.col(f"r{j}"), 6) + F.lit(0.0)).alias(f"w{j}")
            for j in range(3)
        ],
    )


from neuroimaging_data_pipeline_spark.operators.logreg import (  # noqa: E402
    logreg_gd_sql,
)

A_LOGREG_SQL = logreg_gd_sql(
    _LR_FEATS_CTE, ["x0", "x1", "x2"], "y", n_iters=3, lr=0.1
)


def d_incremental_dedup(spark, sf_dir):
    """Incremental dedup of a landing batch against the existing
    corpus index (dedup/exact.py:incremental_dedup) — the production
    shape: hash-bucket 0 of documents plays the new crawl snapshot,
    buckets 1-9 the already-ingested corpus. Both sides reduce to
    (hash, id) map-side; the batch-vs-index check is a hash equi-join
    of two hash-keyed tables (neither broadcastable at corpus scale)
    and the within-batch keep decision is a min() aggregate."""
    from neuroimaging_data_pipeline_spark.dedup.exact import (
        incremental_dedup,
    )
    from neuroimaging_data_pipeline_spark.text.analysis import hash_bucket

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    b = docs.withColumn("_bkt", hash_bucket("doc_id", 10))
    batch = b.filter(F.col("_bkt") == 0).drop("_bkt")
    index = b.filter(F.col("_bkt") != 0).drop("_bkt")
    return incremental_dedup(batch, index)


D_INCR_DEDUP_SQL = """
WITH b AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 10 AS bkt
  FROM documents
), bh AS (
  SELECT doc_id,
         md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 256)) AS content_hash
  FROM b WHERE bkt = 0
), ih AS (
  SELECT DISTINCT
         md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 256)) AS content_hash
  FROM b WHERE bkt <> 0
), firsts AS (
  SELECT content_hash, MIN(doc_id) AS first_id FROM bh GROUP BY content_hash
)
SELECT bh.doc_id, bh.content_hash,
       CASE WHEN ih.content_hash IS NOT NULL THEN 'dup_of_index'
            WHEN bh.doc_id <> f.first_id THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM bh
LEFT JOIN ih ON bh.content_hash = ih.content_hash
JOIN firsts f ON bh.content_hash = f.content_hash
"""


def t_chunk(spark, sf_dir):
    """RAG-style sliding-window chunking (text/chunking.py): 32-token
    chunks at stride 24 per document, chunk identity = content md5 so
    chunk-level dedup composes with the hash families. Map-only, zero
    shuffle."""
    from neuroimaging_data_pipeline_spark.text.chunking import chunk_sliding

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return chunk_sliding(docs, chunk_size=32, stride=24)


def t_pack_blocks(spark, sf_dir):
    """Concat-and-chop context packing (text/chunking.py): per-source
    token streams (docs concatenated in id order) chopped into
    128-token blocks; each doc reports its token interval and block
    span. One window cumsum per stream — streams are the parallelism
    unit, exactly how packing shards at corpus scale."""
    from neuroimaging_data_pipeline_spark.text.chunking import pack_blocks

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return pack_blocks(docs, block_size=128)


from neuroimaging_data_pipeline_spark.text.chunking import (  # noqa: E402
    chunk_sliding_sql,
    pack_blocks_sql,
)

T_CHUNK_SQL = chunk_sliding_sql(chunk_size=32, stride=24)
T_PACK_SQL = pack_blocks_sql(block_size=128)


def e5_shard_pipeline(spark, sf_dir):
    """E5: training-SHARD assembly composed end-to-end as ONE lazy
    plan — the corpus-composition counterpart to e2's quality flow:

      documents
        -> mixture-weighted sampling (domain reweighting, md5 rates)
        -> per-domain cap (at most 15 sampled docs per source)
        -> exact dedup, keep the min-id representative
        -> sliding-window chunking (32/24)
        -> per-source shard stats (docs, chunks, chunk tokens,
           distinct chunk hashes)

    Every stage is the operator its standalone query exercises
    (text/mixing.py, dedup/exact.py, text/chunking.py), so the oracle
    chains their proven SQL forms CTE-by-CTE and the final aggregate
    seals the whole flow under one hash check. Plan: map-only sample
    -> one cap window -> one dedup hash-agg -> map-only chunk ->
    small per-source aggregates."""
    from neuroimaging_data_pipeline_spark.dedup.exact import exact_dedup
    from neuroimaging_data_pipeline_spark.text.chunking import chunk_sliding
    from neuroimaging_data_pipeline_spark.text.mixing import (
        mixture_sample,
        source_cap,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="auto")
    sampled = mixture_sample(docs, MIX_THRESHOLDS)
    capped = sampled.join(
        source_cap(sampled, 15).select("doc_id"), "doc_id", "left_semi"
    )
    kept = exact_dedup(capped)
    # source is carried through chunking map-side — joining chunks
    # back to kept to recover it would be a fact-to-fact shuffle
    chunks = chunk_sliding(kept, chunk_size=32, stride=24, carry_cols=["source"])
    doc_stats = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    chunk_stats = (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_chunk_tokens"),
            F.countDistinct("chunk_md5").alias("n_uniq_chunks"),
        )
    )
    return (
        doc_stats.join(F.broadcast(chunk_stats), "source", "left")
        .na.fill({"n_chunks": 0, "n_chunk_tokens": 0, "n_uniq_chunks": 0})
    )


def _e5_sql() -> str:
    values = ", ".join(
        f"('{g}', {int(t)})" for g, t in sorted(MIX_THRESHOLDS.items())
    )
    return f"""
WITH mix(source, thresh) AS (VALUES {values}),
b AS (
  SELECT t.*,
         CAST(('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000 AS bucket
  FROM documents t
), sampled AS (
  SELECT b.* FROM b LEFT JOIN mix USING (source)
  WHERE bucket < COALESCE(thresh, 0)
), capped AS (
  SELECT * FROM (
    SELECT s.*,
           ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY md5('cap42:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
           ) AS rk
    FROM sampled s
  ) WHERE rk <= 15
), hashes AS (
  SELECT doc_id, source, text,
         md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 1000000)) AS h
  FROM capped
), keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM hashes GROUP BY h
), kept AS (
  SELECT h.doc_id, h.source, h.text FROM hashes h
  WHERE h.doc_id IN (SELECT doc_id FROM keepers)
), toks AS (
  SELECT doc_id, source,
         list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                     t -> t <> '') AS toks
  FROM kept
), chunks AS (
  SELECT doc_id, source,
         list_slice(toks, i * 24 + 1, i * 24 + 32) AS chunk
  FROM (SELECT doc_id, source, toks, len(toks) AS n FROM toks WHERE len(toks) > 0),
       UNNEST(range(0, CAST(floor((n - 1) / 24) AS BIGINT) + 1)) AS t(i)
), doc_stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM kept GROUP BY source
), chunk_stats AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(len(chunk)) AS BIGINT) AS n_chunk_tokens,
         CAST(COUNT(DISTINCT md5(array_to_string(chunk, ' '))) AS BIGINT) AS n_uniq_chunks
  FROM chunks GROUP BY source
)
SELECT d.source, d.n_docs,
       COALESCE(c.n_chunks, 0) AS n_chunks,
       COALESCE(c.n_chunk_tokens, 0) AS n_chunk_tokens,
       COALESCE(c.n_uniq_chunks, 0) AS n_uniq_chunks
FROM doc_stats d LEFT JOIN chunk_stats c USING (source)
"""


E5_SQL = _e5_sql()


def t_nb_lang(spark, sf_dir):
    """In-engine multinomial naive-Bayes language classifier
    (text/nbayes.py): trained on the labeled corpus (class = lang,
    Laplace alpha=1) and self-scored — per document the argmax class
    and its decimal-exact log-likelihood score. Training IS two
    partial-aggregable count aggregates (no iterations, no driver
    state beyond the KB model tables), the canonical closed-form
    counting model next to a_logreg_gd's gradient family; scoring
    joins token occurrences against the broadcast model per class.
    Two shuffles at any corpus size."""
    from neuroimaging_data_pipeline_spark.text.nbayes import nb_train_score

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return nb_train_score(d)


def _nb_sql() -> str:
    from neuroimaging_data_pipeline_spark.text.nbayes import nb_sql

    return nb_sql()


T_NB_SQL = _nb_sql()


def e7_classifier_filter(spark, sf_dir):
    """E7 — model-in-the-loop curation as ONE lazy plan: train the
    naive-Bayes language classifier on the labeled corpus, self-score
    every document, and keep only documents whose PREDICTED class
    agrees with their label (the classifier-agreement filter that
    catches label noise / misrouted crawl content — the same shape as
    quality-classifier filtering in GPT-3/LLaMA-style corpus prep,
    with the model trained IN the engine rather than imported). Per
    source: docs in, docs kept, docs dropped, kept token mass. The
    oracle chains the proven nb_sql as a derived table and recomputes
    the identical report."""
    from neuroimaging_data_pipeline_spark.text.nbayes import (
        _tokens,
        nb_train_score,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    nb = nb_train_score(d)
    joined = d.join(nb, "doc_id").withColumn(
        "_kept", (F.col("predicted") == F.col("lang")).cast("int")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_kept").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("_kept")).alias("n_dropped"),
            F.sum(
                F.when(
                    F.col("_kept") == 1,
                    F.size(F.filter(_tokens(F.col("text")), lambda w: w != "")),
                ).otherwise(0)
            ).alias("kept_tokens"),
        )
        .orderBy("source")
    )


def _e7_sql() -> str:
    from neuroimaging_data_pipeline_spark.text.nbayes import nb_sql

    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
WITH nbres AS (
  SELECT * FROM ({nb_sql()})
), joined AS (
  SELECT d.source,
         CASE WHEN n.predicted = d.lang THEN 1 ELSE 0 END AS _kept,
         len(list_filter(string_split({norm}, ' '), w -> w <> '')) AS _ntok
  FROM documents d JOIN nbres n USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(_kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(_kept) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN _kept = 1 THEN _ntok ELSE 0 END) AS BIGINT)
         AS kept_tokens
FROM joined
GROUP BY source
ORDER BY source
"""


E7_SQL = _e7_sql()


QUERIES = {
    "t_nb_lang": t_nb_lang,
    "e7_classifier_filter": e7_classifier_filter,
    "s_bm25_topk": s_bm25_topk,
    "e5_shard_pipeline": e5_shard_pipeline,
    "t_chunk": t_chunk,
    "t_pack_blocks": t_pack_blocks,
    "s_knn_graph": s_knn_graph,
    "d_semdedup": d_semdedup,
    "t_mix_sample": t_mix_sample,
    "t_epoch_shuffle": t_epoch_shuffle,
    "t_bpe_train": t_bpe_train,
    "t_bpe_tokens": t_bpe_tokens,
    "t_ks_drift": t_ks_drift,
    "t_auc_drift": t_auc_drift,
    "t_source_cap": t_source_cap,
    "t_weighted_sample": t_weighted_sample,
    "s_quantize_int8": s_quantize_int8,
    "a_logreg_gd": a_logreg_gd,
    "d_incremental_dedup": d_incremental_dedup,
}

ORACLE = {
    "t_nb_lang": T_NB_SQL,
    "e7_classifier_filter": E7_SQL,
    "s_bm25_topk": S_BM25_SQL,
    "e5_shard_pipeline": E5_SQL,
    "t_chunk": T_CHUNK_SQL,
    "t_pack_blocks": T_PACK_SQL,
    "s_knn_graph": S_KNN_GRAPH_SQL,
    "d_semdedup": D_SEMDEDUP_SQL,
    "t_mix_sample": T_MIX_SAMPLE_SQL,
    "t_epoch_shuffle": T_EPOCH_SHUFFLE_SQL,
    "t_bpe_train": T_BPE_TRAIN_SQL,
    "t_bpe_tokens": T_BPE_TOKENS_SQL,
    "t_ks_drift": T_KS_DRIFT_SQL,
    "t_auc_drift": T_AUC_DRIFT_SQL,
    "t_source_cap": T_SOURCE_CAP_SQL,
    "t_weighted_sample": T_WEIGHTED_SAMPLE_SQL,
    "s_quantize_int8": S_QUANTIZE_SQL,
    "a_logreg_gd": A_LOGREG_SQL,
    "d_incremental_dedup": D_INCR_DEDUP_SQL,
}
