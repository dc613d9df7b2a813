"""Exactly-once streaming sink (sources/versioned.py append_txn):
foreachBatch delivers micro-batches at-least-once on recovery; the
txn-tagged manifest commit turns that into exactly-once table state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.sources.versioned import (
    append_txn,
    read_all_appends,
    table_versions,
)


def test_replayed_batch_is_dropped(spark, tmp_path):
    root = str(tmp_path / "tbl")
    b1 = spark.range(10).select(F.col("id").alias("k"))
    b2 = spark.range(10, 25).select(F.col("id").alias("k"))
    assert append_txn(b1, root, "q1-batch-0") == 0
    assert append_txn(b2, root, "q1-batch-1") == 1
    # at-least-once delivery: batch 0 replays after a (simulated)
    # recovery — the manifest check drops it before any write commits
    assert append_txn(b1, root, "q1-batch-0") is None
    assert append_txn(b2, root, "q1-batch-1") is None
    assert table_versions(root) == [0, 1]
    got = sorted(r.k for r in read_all_appends(spark, root).collect())
    assert got == list(range(25))  # every row exactly once


def test_foreachbatch_end_to_end_with_replay(spark, tmp_path):
    """Live run: a multi-micro-batch stream lands through
    foreachBatch + append_txn; manually re-running the sink function
    on a stale batch (the recovery shape) changes nothing."""
    landing = tmp_path / "landing"
    src = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "event_id long, shard int"
    )
    for s in range(3):
        src.filter(F.col("shard") == s).select("event_id").coalesce(
            1
        ).write.mode("append").parquet(str(landing))
    root = str(tmp_path / "tbl")

    captured = []

    def sink(batch_df, batch_id):
        captured.append((batch_id, batch_df.count()))
        append_txn(batch_df, root, f"q-{batch_id}")

    q = (
        spark.readStream.schema("event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(captured) == 3
    got = sorted(
        r.event_id for r in read_all_appends(spark, root).collect()
    )
    assert got == list(range(30))
    # recovery replay of the first batch: same txn id -> no-op
    replay = spark.read.parquet(str(landing)).limit(5)
    assert append_txn(replay, root, "q-0") is None
    got2 = sorted(
        r.event_id for r in read_all_appends(spark, root).collect()
    )
    assert got2 == got
