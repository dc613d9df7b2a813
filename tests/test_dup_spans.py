"""Cross-document duplicated-substring spans (d_dup_spans internals):
planted shared passages are recovered at exact offsets; short overlap
and within-doc-only repetition are excluded."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.queries.textops import (
    DUP_SPAN_K,
    DUP_SPAN_MIN,
)


def _spans(spark, docs):
    """Run the d_dup_spans pipeline over an in-memory documents table
    by reusing the query function against a temp parquet dir."""
    import tempfile

    from neuroimaging_data_pipeline_spark.queries.textops import d_dup_spans

    tmp = tempfile.mkdtemp(prefix="dupspan_")
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": "en",
            "source": "s0",
            "n_chars": [len(t) for _, t in docs],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        tmp + "/documents.parquet"
    )
    return {
        (r.doc_id, r.span_start, r.span_len)
        for r in d_dup_spans(spark, tmp).collect()
    }


def test_planted_shared_passage_exact_offsets(spark):
    shared = "the quick brown fox jumps over the lazy dog near a river"
    shared += "x" * (60 - len(shared))
    assert len(shared) == 60
    a = "A" * 30 + shared + "B" * 25
    b = "C" * 10 + shared + "D" * 45
    got = _spans(spark, [(1, a), (2, b)])
    assert (1, 31, 60) in got and (2, 11, 60) in got
    assert len(got) == 2


def test_short_overlap_and_self_repeat_excluded(spark):
    # 30-char shared passage: >= K grams match but the merged span is
    # 30 < DUP_SPAN_MIN -> excluded
    assert DUP_SPAN_K <= 30 < DUP_SPAN_MIN
    short = "shared-fragment-of-30-chars!!!"
    assert len(short) == 30
    a = "A" * 40 + short + "B" * 40
    b = "C" * 40 + short + "D" * 40
    # doc 3 repeats ITS OWN passage twice; no other doc shares it
    selfrep = ("E" * 5 + "unique self repeated block of text 42ch!" * 2
               + "F" * 5)
    got = _spans(spark, [(1, a), (2, b), (3, selfrep)])
    assert got == set()


def test_full_duplicate_doc_is_one_span(spark):
    t = "".join(chr(97 + (i * 7) % 26) for i in range(120))
    got = _spans(spark, [(1, t), (2, t)])
    assert got == {(1, 1, 120), (2, 1, 120)}
