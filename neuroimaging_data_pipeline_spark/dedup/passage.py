"""Passage-level (sub-document) deduplication — the CCNet/RefinedWeb
fine-grained dedup shape: boilerplate that repeats ACROSS documents
(headers, footers, license blurbs) is removed span-by-span while the
unique remainder of each document survives. Whole-document dedup
(``dedup/exact.py``) cannot do this; it keeps or drops documents
atomically.

Unit of dedup: consecutive K-word passages (CCNet uses paragraphs;
this corpus is single-line, so the fixed-width word window is the
deterministic equivalent — and what you'd use anyway on minified or
OCR'd text with no layout breaks).

Scale design (the part that must survive 100 TB):
- documents explode to (passage_hash, doc_id, passage_idx) — the
  shuffle carries md5 hashes + two longs, never passage text;
- first-occurrence choice is a min(struct(doc_id, idx)) AGGREGATE on
  the hash, not a window over the corpus — map-side partial
  aggregation halves the shuffle before it happens;
- the keep/drop verdict returns to each passage via an equi-join on
  the hash (AQE handles skew on a hot boilerplate hash);
- per-document stats re-aggregate on doc_id. Three shuffles total,
  all on compact keys, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PASSAGE_WORDS = 10


def passages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = PASSAGE_WORDS,
) -> DataFrame:
    """Explode each document into consecutive k-word passages:
    (doc_id, passage_idx, passage_hash, n_words). The trailing
    passage may be short; empty documents produce no rows (callers
    re-attach them with a left join).

    Pure column expressions — split / sequence / slice / md5 — so the
    explode happens JVM-side inside whole-stage codegen."""
    words = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                     lambda w: w != "")
    idx = F.sequence(
        F.lit(0), F.ceil(F.col("_n") / F.lit(k)).cast("int") - 1
    )
    return (
        docs.select(F.col(id_col), words.alias("_w"), F.size(words).alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            F.explode(F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("passage_idx"),
                    F.concat_ws(
                        " ", F.slice(F.col("_w"), i * k + 1, k)
                    ).alias("passage"),
                ),
            )).alias("p"),
        )
        .select(
            id_col,
            F.col("p.passage_idx").alias("passage_idx"),
            F.md5(F.col("p.passage")).alias("passage_hash"),
            F.size(F.split(F.col("p.passage"), " ")).alias("n_words"),
        )
    )


def passage_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = PASSAGE_WORDS,
) -> DataFrame:
    """Corpus-wide passage dedup, first occurrence wins (order by
    (doc_id, passage_idx) — deterministic across partitionings).
    Output per document: (doc_id, n_passages, n_kept, n_words_kept)
    — n_kept < n_passages means boilerplate spans were stripped while
    the document itself survives."""
    p = passages(docs, id_col, text_col, k)
    first = p.groupBy("passage_hash").agg(
        F.min(F.struct(id_col, "passage_idx")).alias("first_occ")
    )
    verdict = p.join(first, "passage_hash").select(
        id_col,
        "passage_idx",
        "n_words",
        (
            (F.col(id_col) == F.col("first_occ." + id_col))
            & (F.col("passage_idx") == F.col("first_occ.passage_idx"))
        ).alias("kept"),
    )
    stats = verdict.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_words")).otherwise(0)).alias(
            "n_words_kept"
        ),
    )
    # empty documents have zero passages but must not vanish
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_passages", F.lit(0)).alias("n_passages"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_words_kept", F.lit(0)).alias("n_words_kept"),
        )
    )
