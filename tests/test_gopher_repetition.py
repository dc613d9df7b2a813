"""Gopher repetition signals (queries/textops.t_gopher_repetition):
fractions pinned on hand-computed fixtures, the max-count +
lexicographically-last tie-break, and the single-word edge case."""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def sf_dir(spark):
    """A tiny documents.parquet the query can read via read_table."""
    root = os.path.join(tempfile.gettempdir(), "ndp_spark_fixtures",
                        "gopher_docs")
    docs = spark.createDataFrame(
        [
            # 6 words: 'a' x3, 'b' x2, 'c' -> top a 0.5, dup 1-3/6
            (0, "a b a c a b", "en", "web", 11),
            # tie: 'x' x2, 'y' x2, 'z' -> lexicographically last wins (y)
            (1, "x y z x y", "en", "web", 9),
            (2, "solo", "en", "web", 4),
            # bigram repeat: 'p q p q p' -> bigrams p q, q p, p q, q p
            (3, "p q p q p", "en", "web", 9),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return root


def _rows(spark, sf_dir):
    from neuroimaging_data_pipeline_spark.queries.textops import (
        t_gopher_repetition,
    )

    return {
        r["doc_id"]: r.asDict()
        for r in t_gopher_repetition(spark, sf_dir).collect()
    }


def test_fractions_and_tiebreaks(spark, sf_dir):
    got = _rows(spark, sf_dir)
    d0 = got[0]
    assert d0["n_words"] == 6
    assert d0["top_word"] == "a" and d0["top_word_frac"] == 0.5
    assert d0["dup_word_frac"] == 0.5  # 1 - 3/6
    d1 = got[1]
    assert d1["top_word"] == "y"  # tie between x and y -> last wins
    assert d1["top_word_frac"] == 0.4
    d3 = got[3]
    # bigrams: p q, q p, p q, q p -> tie at 2, last lexicographically
    assert d3["top_bigram"] == "q p" and d3["top_bigram_frac"] == 0.5


def test_single_word_doc_has_no_bigrams(spark, sf_dir):
    d2 = _rows(spark, sf_dir)[2]
    assert d2["n_words"] == 1
    assert d2["top_word"] == "solo" and d2["top_word_frac"] == 1.0
    assert d2["dup_word_frac"] == 0.0
    assert d2["top_bigram"] is None and d2["top_bigram_frac"] == 0.0
