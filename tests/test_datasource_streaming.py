"""Custom Python STREAMING data source (sources/datasource.py
TarShardStreamReader): readStream over the registered format tails a
shard landing directory with offset checkpointing — the second half
of the Spark 4 DataSource surface next to the batch reader."""

from __future__ import annotations

import shutil

from neuroimaging_data_pipeline_spark.multimodal.tar import encode_shard
from neuroimaging_data_pipeline_spark.sources.datasource import register


def _land(dirpath, ids):
    dirpath.mkdir(parents=True, exist_ok=True)
    for i in ids:
        ext = "tar.gz" if i % 2 == 1 else "tar"
        with open(dirpath / f"shard-{i:05d}.{ext}", "wb") as fh:
            fh.write(encode_shard(i))


def test_streaming_tarshard_incremental_offsets(spark, tmp_path):
    """Two triggered runs against one checkpoint: the first drains the
    initial shards, the second consumes ONLY the newly landed ones
    (offset = shard high-water mark persisted in the checkpoint)."""
    landing = tmp_path / "landing"
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        # memory sink cannot recover from a checkpoint; foreachBatch
        # can — collect each micro-batch driver-side
        register(spark)
        got = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                got[(r.shard, r.member)] = (r.size, r.payload_sum)

        q = (
            spark.readStream.format("ndp_tarshard")
            .option("path", str(landing))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    _land(landing, range(4))
    first = run_once()
    shards_first = {s for s, _ in first}
    assert len(shards_first) == 4
    _land(landing, range(4, 7))
    second = run_once()
    shards_second = {s for s, _ in second}
    # the checkpointed offset skips the already-consumed shards:
    # only the NEW ones appear in the second run
    assert all(s.startswith(("shard-00004", "shard-00005", "shard-00006"))
               for s in shards_second), shards_second
    assert len(shards_second) == 3
    # rows match the batch reader for the same shards
    batch = {
        (r.shard, r.member): (r.size, r.payload_sum)
        for r in spark.read.format("ndp_tarshard")
        .option("path", str(landing))
        .load()
        .collect()
    }
    for k, v in {**first, **second}.items():
        assert batch[k] == v
    shutil.rmtree(ckpt, ignore_errors=True)
