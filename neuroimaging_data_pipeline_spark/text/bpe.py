"""Distributed BPE (byte-pair-encoding) tokenizer: train + apply.

The subword-tokenization step of a training-data pipeline (Sennrich
et al. 2016, the GPT-2/Llama vocabulary-construction algorithm),
re-expressed as Spark dataflow:

- TRAIN iterates over the (word, freq) VOCABULARY table — corpus-scale
  text collapses to a vocab-sized table in one groupBy pass, so every
  merge round costs two small jobs (an adjacent-pair count + a
  map-only merge apply), never a corpus rescan. Driver state per round
  is ONE best-pair row (KB-scale at any corpus size — the same
  iterative-algorithm shape as k-means / PageRank here); the vocab
  table is localCheckpoint-ed per round so round i's plan never nests
  inside round i+1's.
- APPLY is pure string expressions (no Python in the hot path): each
  word is encoded as STX-sym-ETX frames and each merge is ONE
  left-to-right non-overlapping string replace of the framed pair —
  which is exactly the greedy single-pass merge semantics BPE training
  applies. Tokenizing a corpus is therefore a zero-shuffle map pass
  whose cost is n_merges replaces per word.

Determinism: pair counts are exact integer sums; the per-round argmax
tie-breaks on (count desc, left asc, right asc). Both facts are
mirrored in the DuckDB oracle (queries/retrieval.py) which unrolls
the SAME rounds in SQL — training is oracle-checked round-for-round.

Declared apply semantics: merges are applied once each in rank order,
each as one greedy left-to-right pass. For merge lists PRODUCED by
BPE training this coincides with the iterative lowest-rank-first
encoder (a later rule's operand symbols only exist after its
operands' earlier merges have run); the equivalence is pinned in
tests/test_bpe.py against an independent pure-Python reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Symbol framing characters (STX/ETX). A framed symbol stream is
#: "\x02sym\x03\x02sym\x03..."; replace() of a framed pair cannot
#: match across symbol boundaries, and counting tokens is counting
#: STX bytes. The corpus contract is printable text (control chars
#: never appear in tokens).
STX = "\x02"
ETX = "\x03"

#: End-of-word marker symbol (Sennrich-style): distinguishes
#: word-final subwords so detokenization stays invertible.
END_WORD = "</w>"


def _norm_words(text_col) -> F.Column:
    """lower/trim/whitespace-split, empties dropped — the corpus
    tokenization every text operator in this engine shares."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )


def encode_word(word_col) -> F.Column:
    """Frame a word's characters + END_WORD into the STX/ETX stream."""
    per_char = F.transform(
        F.split(word_col, ""),
        lambda c: F.concat(F.lit(STX), c, F.lit(ETX)),
    )
    return F.concat(
        F.array_join(per_char, ""), F.lit(STX + END_WORD + ETX)
    )


def _merge_pat(a: str, b: str) -> tuple[str, str]:
    return STX + a + ETX + STX + b + ETX, STX + a + b + ETX


def apply_merges(enc_col, merges: list[tuple[str, str]]) -> F.Column:
    """Chain of framed-pair replaces in rank order (one greedy
    left-to-right pass per merge — replace()'s scan order)."""
    out = enc_col
    for a, b in merges:
        pat, rep = _merge_pat(a, b)
        out = F.replace(out, F.lit(pat), F.lit(rep))
    return out


def token_count_of(enc_col) -> F.Column:
    """Number of symbols in a framed stream = number of STX bytes."""
    return (
        F.length(enc_col) - F.length(F.replace(enc_col, F.lit(STX), F.lit("")))
    ).cast("long")


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary table — the one corpus-scale pass."""
    return (
        docs.select(F.explode(_norm_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(vocab_enc: DataFrame) -> DataFrame:
    """(a, b, cnt) frequency-weighted adjacent-symbol pair counts."""
    syms = F.split(
        F.expr("substring(enc, 2, length(enc) - 2)"), ETX + STX
    )
    d = vocab_enc.select("freq", syms.alias("syms"))
    idx = F.when(
        F.size("syms") > 1, F.sequence(F.lit(1), F.size("syms") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("freq", F.col("syms"), F.explode(idx).alias("i"))
        .select(
            "freq",
            F.element_at("syms", F.col("i")).alias("a"),
            F.element_at("syms", F.col("i") + 1).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[dict]:
    """Learn ``n_merges`` merges; returns [{rank, a, b, cnt}, ...].

    Each round: exact integer pair count over the vocab table, argmax
    with (cnt desc, a asc, b asc) tie-break, one replace() merge
    apply. Stops early if no adjacent pair remains."""
    vocab = word_vocab(docs, text_col).select(
        "word", "freq", encode_word(F.col("word")).alias("enc")
    )
    vocab = vocab.localCheckpoint()
    merges: list[dict] = []
    for rank in range(n_merges):
        best = (
            _adjacent_pairs(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .first()
        )
        if best is None:
            break
        merges.append(
            {"rank": rank, "a": best["a"], "b": best["b"], "cnt": best["cnt"]}
        )
        pat, rep = _merge_pat(best["a"], best["b"])
        vocab = vocab.withColumn(
            "enc", F.replace("enc", F.lit(pat), F.lit(rep))
        ).localCheckpoint()
    return merges


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document — the zero-shuffle
    map-only apply pass (all string expressions, no Python)."""
    words = _norm_words(F.col(text_col))
    counts = F.transform(
        words,
        lambda w: token_count_of(apply_merges(encode_word(w), merges)),
    )
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            counts, F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("n_bpe_tokens"),
    )
