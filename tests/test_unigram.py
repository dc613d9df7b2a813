"""Unigram-LM tokenizer (text/unigram.py): Viterbi semantics, the
longer-piece tie-break, coverage invariants, and train/apply parity
with an independent pure-Python EM reference."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from neuroimaging_data_pipeline_spark.text.unigram import (
    EM_ROUNDS,
    MAX_PIECE_LEN,
    TOP_K,
    viterbi_segment,
)


def test_viterbi_picks_max_total_logprob():
    # 'abc' as one piece (ilp -1) beats 'a'+'bc' (-2-1) and chars (-6)
    ilp = {"a": -2, "b": -2, "c": -2, "bc": -1, "abc": -1}
    pieces, n, score = viterbi_segment("abc", ilp)
    assert (pieces, n, score) == (["abc"], 1, -1)


def test_viterbi_tie_prefers_longer_piece():
    # 'ab' (-4) ties 'a'+'b' (-2-2): the longer piece must win
    ilp = {"a": -2, "b": -2, "ab": -4}
    pieces, n, score = viterbi_segment("ab", ilp)
    assert (pieces, n, score) == (["ab"], 1, -4)


def test_viterbi_uncoverable_returns_none():
    assert viterbi_segment("axe", {"a": -1, "e": -1}) is None


def test_viterbi_scores_are_exact_ints():
    ilp = {"a": -3_000_000_001, "aa": -5_999_999_999}
    pieces, n, score = viterbi_segment("aaa", ilp)
    assert isinstance(score, int)
    assert score == -5_999_999_999 - 3_000_000_001
    # 'aa'+'a' ties 'a'+'aa': the LONGER FINAL piece wins the tie
    assert pieces == ["a", "aa"]


def _reference_em(texts: list[str]) -> dict[str, int]:
    """Independent pure-Python mirror of seed + EM_ROUNDS hard-EM."""
    words = Counter()
    for t in texts:
        words.update(w for w in t.lower().strip().split() if w)
    subs = Counter()
    for w, fq in words.items():
        for p in range(len(w)):
            for ln in range(1, min(MAX_PIECE_LEN, len(w) - p) + 1):
                subs[w[p : p + ln]] += fq
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    vocab = dict(top)
    vocab.update({p: c for p, c in subs.items() if len(p) == 1})
    for _ in range(EM_ROUNDS):
        total = float(sum(vocab.values()))
        ilp = {
            p: int(_round_half_up(math.log(c / total) * 1e9))
            for p, c in vocab.items()
        }
        nxt: Counter = Counter()
        for w, fq in words.items():
            pieces, _, _ = viterbi_segment(w, ilp)
            for p in pieces:
                nxt[p] += fq
        vocab = dict(nxt)
    return vocab


def _round_half_up(x: float) -> float:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_spark_train_matches_reference(spark):
    from neuroimaging_data_pipeline_spark.text.unigram import unigram_train

    texts = [
        "the cat sat on the mat",
        "the mat was flat",
        "a cat and a rat",
        "rats sat on flat mats",
    ] * 3
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(texts)), dtype="int64"),
                "text": texts,
            }
        )
    )
    got = {r["piece"]: r["cnt"] for r in unigram_train(docs).collect()}
    assert got == _reference_em(texts)


def test_spark_tokens_consistent_with_train(spark):
    from neuroimaging_data_pipeline_spark.text.unigram import (
        unigram_token_counts,
    )

    texts = ["aa ab ba", "abba baab", "aa aa"]
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series(range(3), dtype="int64"),
                "text": texts,
            }
        )
    )
    rows = {r["doc_id"]: r for r in unigram_token_counts(docs).collect()}
    assert set(rows) == {0, 1, 2}
    # coverage invariant: every doc tokenizes (no raise), scores < 0
    for r in rows.values():
        assert r["n_tokens"] >= 1 and r["score"] < 0


def test_round_over_round_coverage_invariant(spark):
    """Pieces surviving round 1 must still cover every word (a word's
    round-1 segmentation uses only pieces that got counts)."""
    from neuroimaging_data_pipeline_spark.text.unigram import (
        _ilp_rows,
        seed_vocab,
        viterbi_segment,
        word_freqs,
    )

    texts = ["zebra quartz jazz fizz", "quiz buzz jazzy", "zebra buzz"]
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series(range(3), dtype="int64"),
                "text": texts,
            }
        )
    )
    words = word_freqs(docs)
    ilp = dict(_ilp_rows(seed_vocab(words)))
    survivors: Counter = Counter()
    wlist = [(r["word"], r["freq"]) for r in words.collect()]
    for w, fq in wlist:
        for p in viterbi_segment(w, ilp)[0]:
            survivors[p] += fq
    total = float(sum(survivors.values()))
    ilp2 = {
        p: int(_round_half_up(math.log(c / total) * 1e9))
        for p, c in survivors.items()
    }
    for w, _ in wlist:
        assert viterbi_segment(w, ilp2) is not None
