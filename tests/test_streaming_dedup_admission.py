"""Streaming corpus admission: the production dedup flow — documents
arrive in micro-batches, each batch is checked against the
accumulated corpus index (dedup/exact.py incremental_dedup) inside
foreachBatch, and only 'new' docs extend the index. Pins that the
cross-batch state (the index) carries correctly: a doc that is new in
batch 1 makes its duplicate in batch 2 a dup_of_index, while
within-batch repeats are dup_in_batch — end state identical to a
one-shot batch dedup over the concatenated corpus."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.dedup.exact import (
    exact_dedup_keys,
    incremental_dedup,
)
from neuroimaging_data_pipeline_spark.streaming.events import (
    foreach_batch_pipeline,
)

BATCH1 = [
    (0, "alpha beta gamma"),
    (1, "delta epsilon"),
    (2, "alpha beta gamma"),  # within-batch repeat of 0
]
BATCH2 = [
    (10, "delta epsilon"),  # dup of index (doc 1)
    (11, "zeta eta"),
    (12, "zeta eta"),  # within-batch repeat of 11
    (13, "alpha beta gamma"),  # dup of index (doc 0)
]


def test_incremental_admission_across_microbatches(spark, tmp_path):
    # landing dir with two parquet files -> two micro-batches via
    # maxFilesPerTrigger=1
    d1, d2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
    spark.createDataFrame(BATCH1, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d1)
    spark.createDataFrame(BATCH2, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d2)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "*.parquet"))
    )

    state = {"index": spark.createDataFrame([], "doc_id long, text string")}
    statuses: list[pd.DataFrame] = []

    def admit(batch_df, batch_id):
        res = incremental_dedup(batch_df, state["index"]).toPandas()
        statuses.append(res)
        new_ids = res[res["status"] == "new"]["doc_id"].tolist()
        admitted = batch_df.filter(F.col("doc_id").isin(new_ids))
        state["index"] = state["index"].unionByName(admitted).localCheckpoint()

    q = (
        foreach_batch_pipeline(stream, admit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    allres = pd.concat(statuses).set_index("doc_id")["status"].to_dict()
    # batch order by file name is b1 then b2
    assert allres == {
        0: "new",
        1: "new",
        2: "dup_in_batch",
        10: "dup_of_index",
        11: "new",
        12: "dup_in_batch",
        13: "dup_of_index",
    }
    # end state == one-shot dedup over the concatenated corpus
    idx_ids = sorted(r["doc_id"] for r in state["index"].collect())
    both = spark.createDataFrame(
        BATCH1 + BATCH2, "doc_id long, text string"
    )
    oneshot = sorted(
        r["keep_id"] for r in exact_dedup_keys(both).collect()
    )
    assert idx_ids == oneshot == [0, 1, 11]
