"""TF-IDF semantics (queries/textops.py t_tfidf): hand-computed
scores on a tiny corpus, deterministic rarity tie-break."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.queries.textops import t_tfidf


def test_tfidf_hand_computed(spark, tmp_path):
    # 4 docs; "common" in all, "rare" in one, "mid" in two
    rows = [
        (0, "common rare rare mid"),
        (1, "common mid"),
        (2, "common common"),
        (3, "common"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumns(
        {"lang": F.lit("en"), "source": F.lit("s"), "n_chars": F.lit(1)}
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))

    out = t_tfidf(spark, str(sf)).toPandas()
    n = 4

    def idf(df_t):
        return math.log((n + 1.0) / (df_t + 1.0)) + 1.0

    # doc 0: rare tf=2 df=1 -> top; mid tf=1 df=2 beats common tf=1 df=4
    d0 = out[out.doc_id == 0].sort_values("rank")
    assert list(d0.term) == ["rare", "mid", "common"]
    np.testing.assert_allclose(
        d0.score.tolist(),
        [round(2 * idf(1), 6), round(idf(2), 6), round(idf(4), 6)],
        rtol=1e-9,
    )
    # doc 3 has a single term; no rank-2/3 rows fabricated
    assert len(out[out.doc_id == 3]) == 1
    # every doc's ranks are 1..k contiguous
    for d in range(4):
        sub = out[out.doc_id == d].sort_values("rank")
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
