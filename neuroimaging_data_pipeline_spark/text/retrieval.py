"""BM25 full-text retrieval over a document corpus.

The ranking half of a training-data pipeline: given a small set of
probe queries (benchmark prompts, quality exemplars, targeted-recall
audits), score every corpus document with Okapi BM25 and return the
top-k per query. The same machinery is what decontamination-by-
retrieval and quality-by-similarity selection run at corpus scale.

Scale shape: the corpus side is one tokenize + explode pass
semi-joined to the (tiny, broadcast) query-term list — documents
containing no query term are dropped before any shuffle — then a
(doc, term)-key partial aggregate for tf and a (query, doc)-key
aggregate for the final score. Document-frequency and corpus totals
are term-/scalar-sized aggregates that broadcast. Nothing pairwise,
nothing driver-side; per-query work is independent, so queries
parallelize trivially at 1000-executor scale.

Determinism discipline (matches queries/__init__.py): per-term
scores are summed through DECIMAL(28,10) so the rounded score is
summation-order-independent; ranking uses the ROUNDED score with a
doc-id tie-break so both engines rank identical keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.stats import dec_sum

#: Okapi BM25 constants (the standard Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _norm_tokens(text_col) -> F.Column:
    """lower/trim/whitespace-split, empty tokens dropped — the same
    normalization the MinHash/shingle family uses, so DuckDB twins
    recompute identical token streams."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per probe query by BM25.

    ``queries`` is a literal [(query_id, query_text)] list — by
    contract tiny (it broadcasts). Returns (query_id, doc_id, score)
    with score = ROUND(sum of per-term BM25 contributions, 6),
    ranked on the rounded score, ties broken by ascending doc id.

    Per-term contribution (k1=1.2, b=0.75 folded into literals so the
    oracle's expression tree is bit-identical):
        idf * tf * 2.2 / (tf + 0.3 + 0.9 * (dl / avgdl))
    with idf = ln(1 + (N - df + 0.5) / (df + 0.5)).
    """
    spark = docs.sparkSession
    qrows = []
    for qid, qtext in queries:
        seen = set()
        for term in qtext.lower().split():
            if term and term not in seen:
                seen.add(term)
                qrows.append((int(qid), term))
    qdf = F.broadcast(
        spark.createDataFrame(qrows, "query_id int, term string")
    )
    qterms = F.broadcast(qdf.select("term").distinct())

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _norm_tokens(F.col(text_col)).alias("toks"),
    ).withColumn("dl", F.size("toks"))
    # Corpus totals: one scalar row, broadcast into the scoring plan
    # (kept lazy — no driver round-trip, one logical plan end-to-end).
    totals = F.broadcast(
        base.agg(
            F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
        )
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(qterms, "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    term_score = (
        idf
        * F.col("tf")
        * F.lit(2.2)
        / (F.col("tf") + F.lit(0.3) + F.lit(0.9) * (F.col("dl") / avgdl))
    )
    scored = (
        tf.join(qdf, "term")
        .join(dfreq, "term")
        .join(totals)
        .groupBy("query_id", "doc_id")
        .agg((F.round(dec_sum(term_score), 6) + F.lit(0.0)).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def bm25_topk_sql(
    queries: list[tuple[int, str]], k: int = 5, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical tokenization,
    identical literal-folded score expression, identical DECIMAL sum
    and rounded-rank discipline."""
    qrows = []
    for qid, qtext in queries:
        seen = set()
        for term in qtext.lower().split():
            if term and term not in seen:
                seen.add(term)
                qrows.append(f"({int(qid)}, '{term}')")
    qvalues = ", ".join(qrows)
    return f"""
WITH q(query_id, term) AS (VALUES {qvalues}),
base AS (
  SELECT doc_id,
         list_filter(
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '') AS toks
  FROM {table}
), dls AS (
  SELECT doc_id, len(toks) AS dl FROM base
), totals AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dls
), tf AS (
  SELECT b.doc_id, d.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM base b
  JOIN dls d USING (doc_id),
  UNNEST(b.toks) AS u(term)
  JOIN (SELECT DISTINCT term FROM q) t ON u.term = t.term
  GROUP BY b.doc_id, d.dl, t.term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT q.query_id, tf.doc_id,
         (ROUND(CAST(SUM(CAST(
            ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            * tf * 2.2
            / (tf + 0.3 + 0.9 * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
          AS DECIMAL(28,10))) AS DOUBLE), 6) + 0.0) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dfreq USING (term)
  CROSS JOIN totals
  GROUP BY q.query_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT query_id, doc_id, score FROM ranked WHERE rn <= {k}
"""
