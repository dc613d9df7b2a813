"""Streaming trending-key detection (streaming/stateful.py
streaming_trending): CMS sketch state carried across micro-batches,
champion tracking, and counter parity with the batch CMS operator."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.sketches import CMS_D, CMS_W
from neuroimaging_data_pipeline_spark.streaming.stateful import (
    streaming_trending,
)


def _positions(u: int) -> list[int]:
    h = hashlib.md5(f"cms:{u}".encode()).hexdigest()
    return [int(h[4 * d : 4 * d + 4], 16) % CMS_W for d in range(CMS_D)]


def test_streaming_trending_multi_batch(spark, tmp_path):
    """User 7 dominates type 'a' across three micro-batches; the
    final champion must be user 7 with an estimate >= its true count
    (counters accumulate across batches — state carry), and the
    emitted estimates are nondecreasing per key."""
    rows = []
    eid = 0
    # three shards; user 7 appears 20x per shard in type a,
    # users 100..119 once each per shard; type b: user 9 dominates
    for shard in range(3):
        for _ in range(20):
            rows.append((eid, shard, "a", 7)); eid += 1
        for u in range(100, 120):
            rows.append((eid, shard, "a", u)); eid += 1
        for _ in range(5):
            rows.append((eid, shard, "b", 9)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, shard int, event_type string, user_id long"
    )
    landing = tmp_path / "landing"
    for shard in range(3):
        df.filter(F.col("shard") == shard).select(
            "event_id", "event_type", "user_id"
        ).coalesce(1).write.mode("append").parquet(str(landing))

    stream = (
        spark.readStream.schema("event_id long, event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        streaming_trending(stream)
        .writeStream.format("memory")
        .queryName("trend")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("trend").toPandas()

    a = out[out.event_type == "a"].sort_values("n_seen")
    assert len(a) == 3  # one champion row per micro-batch
    assert a.best_user.iloc[-1] == 7
    assert a.best_est.iloc[-1] >= 60  # true count, over-estimate only
    assert list(a.best_est) == sorted(a.best_est)  # monotone growth
    b = out[out.event_type == "b"].sort_values("n_seen")
    assert b.best_user.iloc[-1] == 9 and b.best_est.iloc[-1] >= 15

    # counter parity with the batch CMS geometry: replay all type-a
    # rows through numpy and confirm the final estimate matches
    counts = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for _, _, t, u in rows:
        if t == "a":
            for d, p in enumerate(_positions(u)):
                counts[d, p] += 1
    est7 = min(counts[d, p] for d, p in enumerate(_positions(7)))
    assert a.best_est.iloc[-1] == est7
