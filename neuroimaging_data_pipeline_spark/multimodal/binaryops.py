"""Multimodal (image/audio/video) column plumbing (SURVEY-mandated
engine addition).

Design: media are opaque ``binary`` columns + typed metadata, exactly
how a 100 TB training corpus stores them (parquet binary pages,
metadata pushdown-filterable). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` — one Python worker
per partition, batches sized by spark.sql.execution.arrow.
maxRecordsPerBatch, no per-row overhead.

Codec status: AUDIO AND IMAGE ARE REAL — WAV (RIFF/PCM16) encode +
decode via the stdlib ``wave`` module (``encode_wav_pcm16`` /
``decode_wav`` / ``wav_features``) and PPM/P6 images via pure
header+raw-bytes parsing (``encode_ppm`` / ``decode_ppm`` /
``ppm_features``), both end-to-end through real binary
parquet-shaped columns and Arrow batches. Compressed-format decode
(JPEG/PNG/MP4) remains stubbed (``decoder='fake'`` is a
deterministic stand-in; ``decoder='pil'``/'ffmpeg' raise
NotImplementedError until the libraries are provisioned) — the
Spark-side plumbing (schema, batch shape, partition behavior) is
identical and tested either way.
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


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Real WAV (RIFF) container: mono PCM16 little-endian via the
    stdlib ``wave`` module — no external media libraries needed."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Real WAV decode (stdlib ``wave``): (sample_rate, int16 samples)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    return sr, np.frombuffer(raw, dtype="<i2")


def synthesize_wav_clips(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic audio fixture: one real WAV clip per document,
    32 PCM16 samples derived from the nibbles of md5(text)
    (sample j = nibble_j * 4096 - 32768). The derivation is pure SQL
    math, so an oracle can recompute the decoded features without any
    codec — while the clip itself is a genuine RIFF container the real
    decoder must parse. (media_id, content binary)."""
    import hashlib as _hl

    out_schema = "media_id long, content binary"

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                hexd = _hl.md5((text or "").encode("utf-8")).hexdigest()
                samples = np.array(
                    [int(c, 16) * 4096 - 32768 for c in hexd], dtype=np.int16
                )
                payloads.append(encode_wav_pcm16(samples, sample_rate))
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "content": payloads}
            )

    return docs.select(id_col, text_col).mapInPandas(encode_batches, out_schema)


def wav_features(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode WAV binary columns with the REAL stdlib codec and emit
    per-clip audio features: (media_id, sample_rate, n_samples, rms).
    Same Arrow-batched mapInPandas boundary as decode_features — narrow
    over the scan, nothing shuffles."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_samples int, rms double"
    )

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, ns, rms = [], [], []
            for payload in pdf[content_col]:
                sr, samples = decode_wav(bytes(payload))
                srs.append(sr)
                ns.append(len(samples))
                x = samples.astype(np.float64)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": srs,
                    "n_samples": ns,
                    "rms": rms,
                }
            )

    return media.mapInPandas(feat_batches, out_schema)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Real PPM (P6) image container: ASCII header + raw RGB bytes —
    decodable by any image tool, no external libraries needed.
    ``pixels`` is (H, W, 3) uint8."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real PPM (P6) decode: parse the header, return (H, W, 3) uint8."""
    magic, dims, maxval, raw = bytes(payload).split(b"\n", 3)
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM payload: {magic!r}")
    w, h = map(int, dims.split())
    if int(maxval) != 255:
        raise ValueError("only maxval=255 PPM supported")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def synthesize_ppm_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 6,
) -> DataFrame:
    """Deterministic image fixture: one real PPM per document with
    pixel (y, x, c) = (id*7 + y*131 + x*17 + c*59) % 256 — a pure
    integer formula an oracle can recompute without any codec, while
    the image itself is a genuine P6 container the real decoder must
    parse. (media_id, content binary)."""
    out_schema = "media_id long, content binary"
    ys = np.arange(height)[:, None, None]
    xs = np.arange(width)[None, :, None]
    cs = np.arange(3)[None, None, :]
    base = ys * 131 + xs * 17 + cs * 59

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_ppm(((int(i) * 7 + base) % 256).astype(np.uint8))
                for i in pdf[id_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "content": payloads})

    return docs.select(id_col).mapInPandas(encode_batches, out_schema)


def ppm_features(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode PPM binaries with the REAL stdlib-only codec and emit
    per-image features: (media_id, width, height, mean_r, mean_g,
    mean_b). Same narrow Arrow-batched mapInPandas boundary as
    wav_features."""
    out_schema = (
        f"{id_col} long, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, mr, mg, mb = [], [], [], [], []
            for payload in pdf[content_col]:
                arr = decode_ppm(payload)
                h, w, _ = arr.shape
                ws.append(w)
                hs.append(h)
                means = arr.reshape(-1, 3).astype(np.float64).mean(axis=0)
                mr.append(float(means[0]))
                mg.append(float(means[1]))
                mb.append(float(means[2]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": ws,
                    "height": hs,
                    "mean_r": mr,
                    "mean_g": mg,
                    "mean_b": mb,
                }
            )

    return media.mapInPandas(feat_batches, out_schema)


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
