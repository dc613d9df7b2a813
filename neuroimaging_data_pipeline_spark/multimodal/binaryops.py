"""Multimodal (image/audio/video) column plumbing (SURVEY-mandated
engine addition).

Design: media are opaque ``binary`` columns + typed metadata, exactly
how a 100 TB training corpus stores them (parquet binary pages,
metadata pushdown-filterable). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` — one Python worker
per partition, batches sized by spark.sql.execution.arrow.
maxRecordsPerBatch, no per-row overhead.

The actual codec step is STUBBED (image/audio libraries are not in
this container): ``decoder='fake'`` is a deterministic stand-in that
derives "pixels" from the payload hash, so the Spark-side plumbing —
schema, batch shape, partition behavior — is real and tested;
``decoder='pil'``/'ffmpeg' raise NotImplementedError until the
libraries are provisioned.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, out_pixels: int) -> np.ndarray:
    """Deterministic fake decoder: sha256-seeded pseudo-pixels.
    Stable across processes/partitions (no Python hash randomization)."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.random(out_pixels)


def decode_features(
    media: DataFrame,
    decoder: str = "fake",
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """binary content -> fixed-dim feature vector per media row:
    (media_id, modality, features array<double>).

    Real plan shape: narrow mapInPandas over the scan — at scale the
    parquet reader streams binary pages straight into Arrow batches;
    nothing shuffles.
    """
    if decoder not in ("fake",):
        raise NotImplementedError(
            f"decoder '{decoder}' requires media libraries not present in "
            "this environment; only the deterministic 'fake' decoder is "
            "available (plumbing is identical)"
        )

    out_schema = "media_id long, modality string, features array<double>"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(payload, feature_dim).tolist()
                for payload in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return media.mapInPandas(decode_batches, out_schema)


def resize_plan(
    media: DataFrame,
    target_w: int,
    target_h: int,
) -> DataFrame:
    """Resize metadata planning (pure column math — the real resample
    happens in the decode UDF at materialization): scale factors +
    output dims, preserving aspect by letterboxing."""
    scale = F.least(
        F.lit(target_w) / F.col("width"), F.lit(target_h) / F.col("height")
    )
    return media.withColumn("scale", (F.round(scale, 6) + F.lit(0.0))).withColumn(
        "out_w", (F.round(F.col("width") * scale) + F.lit(0.0)).cast("int")
    ).withColumn("out_h", (F.round(F.col("height") * scale) + F.lit(0.0)).cast("int"))


def frame_sample_plan(
    media: DataFrame,
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling plumbing: explode sampled frame indices
    (media_id, frame_idx) — the decode of each sampled frame is the
    same mapInPandas boundary as decode_features."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )
