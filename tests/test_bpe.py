"""BPE train/apply semantics (text/bpe.py) against an INDEPENDENT
pure-Python reference implementation of Sennrich-style BPE (dict
based, no Spark, no string framing — a genuinely different
mechanism), plus the declared rank-order-apply == iterative
lowest-rank-first encoder equivalence."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.text.bpe import (
    END_WORD,
    apply_merges,
    bpe_token_counts,
    bpe_train,
    encode_word,
    token_count_of,
)


# --- reference implementation (Sennrich 2016, learn_bpe shape) -----

def ref_train(word_freqs: dict[str, int], n_merges: int):
    vocab = {
        tuple(list(w) + [END_WORD]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # (cnt desc, a asc, b asc)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges


def ref_encode_rank_iterative(word: str, merges: list[tuple[str, str]]):
    """GPT-2-style encoder: repeatedly merge the LOWEST-RANK adjacent
    pair present (all its occurrences, left-to-right)."""
    rank = {m: i for i, m in enumerate(merges)}
    syms = list(word) + [END_WORD]
    while True:
        present = {
            (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
        } & rank.keys()
        if not present:
            return syms
        a, b = min(present, key=lambda p: rank[p])
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


CORPUS = [
    "low lower lowest low low",
    "newer newest new new newer",
    "wider wide widest lower",
    "low new wide wider newer",
]


def _word_freqs(corpus):
    c = collections.Counter()
    for line in corpus:
        c.update(line.lower().split())
    return dict(c)


def test_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = bpe_train(docs, 10)
    want = ref_train(_word_freqs(CORPUS), 10)
    assert [(m["a"], m["b"], m["cnt"]) for m in got] == want


def test_apply_matches_iterative_encoder(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = [(m["a"], m["b"]) for m in bpe_train(docs, 10)]
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_counts(docs, merges).collect()
    }
    for i, line in enumerate(CORPUS):
        words = line.lower().split()
        want = sum(
            len(ref_encode_rank_iterative(w, merges)) for w in words
        )
        assert got[i] == (len(words), want), (i, got[i], want)


def test_apply_segments_exact_tokens(spark):
    # check actual segmentation, not just counts, for one word
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = [(m["a"], m["b"]) for m in bpe_train(docs, 10)]
    enc = (
        spark.range(1)
        .select(apply_merges(encode_word(F.lit("lowest")), merges).alias("e"))
        .first()["e"]
    )
    toks = enc[1:-1].split("\x03\x02")
    assert toks == ref_encode_rank_iterative("lowest", merges)


def test_zero_merges_is_char_tokenizer(spark):
    docs = spark.createDataFrame([(0, "ab cde")], "doc_id long, text string")
    out = bpe_token_counts(docs, []).first()
    # chars + one END_WORD per word: (2+1) + (3+1)
    assert out.n_words == 2 and out.n_bpe_tokens == 7


def test_token_count_of_counts_frames(spark):
    row = (
        spark.range(1)
        .select(token_count_of(encode_word(F.lit("abc"))).alias("n"))
        .first()
    )
    assert row.n == 4  # a, b, c, </w>
