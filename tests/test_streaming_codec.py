"""Streaming x multimodal composition: the REAL codecs running inside
a live Structured Streaming pipeline — readStream over a landing
directory of parquet files carrying binary media columns, decode in
Arrow-batched mapInPandas, results identical to the batch path.

This is the shape a continuously-ingesting media corpus actually
runs: new shards land, the same narrow decode plan picks them up, and
nothing about the codec boundary changes between batch and stream."""

from __future__ import annotations

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
    synthesize_wav_clips,
    wav_features,
)
from neuroimaging_data_pipeline_spark.multimodal.mp4 import (
    mp4_meta_features,
    synthesize_mp4_clips,
)

MEDIA_SCHEMA = "media_id long, content binary"


@pytest.fixture()
def media_landing(spark, tmp_path):
    """Two parquet shards of real WAV clips landing in a directory —
    written via the batch encoder so stream and batch read the exact
    same bytes."""
    docs = spark.createDataFrame(
        [(i, f"streaming clip {i}") for i in range(20)],
        "doc_id long, text string",
    )
    media = synthesize_wav_clips(docs)
    landing = tmp_path / "landing"
    media.filter("media_id < 10").coalesce(1).write.mode("append").parquet(
        str(landing)
    )
    media.filter("media_id >= 10").coalesce(1).write.mode("append").parquet(
        str(landing)
    )
    return landing, media


def test_stream_wav_decode_matches_batch(spark, media_landing):
    """Live readStream -> real WAV decode -> memory sink equals the
    batch decode of the same shards, row for row."""
    landing, media = media_landing
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # forces multi-microbatch
        .parquet(str(landing))
    )
    q = (
        wav_features(stream)
        .writeStream.format("memory")
        .queryName("wav_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("wav_stream")
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    want = (
        wav_features(media)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(got) == 20
    assert got.equals(want)


def test_stream_mp4_container_parse(spark, tmp_path):
    """The MP4 container parser runs unchanged under readStream: a
    landing dir of real ISO-BMFF payloads streams through
    mp4_meta_features and every parsed field matches batch."""
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    media = synthesize_mp4_clips(docs)
    landing = tmp_path / "mp4land"
    media.coalesce(1).write.parquet(str(landing))
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(landing))
    q = (
        mp4_meta_features(stream)
        .writeStream.format("memory")
        .queryName("mp4_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("mp4_stream")
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    want = (
        mp4_meta_features(media)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(got) == 8
    assert got.equals(want)
    assert (got["payload_sum"] > 0).all()


def test_stream_gif_decode_matches_batch(spark, tmp_path):
    """The animated-GIF/LZW decoder runs unchanged under readStream:
    real GIF payloads stream through gif_frame_stats and every frame
    row (delays, pixel sums through the LZW decode and palette map)
    matches the batch decode."""
    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        gif_frame_stats,
        synthesize_gifs,
    )

    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    media = synthesize_gifs(docs)
    landing = tmp_path / "gifland"
    media.coalesce(3).write.parquet(str(landing))
    stream = (
        spark.readStream.schema("media_id long, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        gif_frame_stats(stream)
        .writeStream.format("memory")
        .queryName("gif_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("gif_stream")
        .toPandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    want = (
        gif_frame_stats(media)
        .toPandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert len(got) >= 18  # 9 clips x 2-4 frames
    assert got.equals(want)
