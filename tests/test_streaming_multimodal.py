"""M6: Structured Streaming surface (real readStream -> windowed aggs
-> memory sink, compared against the batch twin) + multimodal
mapInPandas plumbing."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
    decode_features,
    frame_sample_plan,
    resize_plan,
)
from neuroimaging_data_pipeline_spark.streaming.events import (
    foreach_batch_pipeline,
    session_counts,
    stream_parquet_dir,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def landing_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events-000.parquet")
    return str(d)


def _run_to_memory(spark, sdf, name, output_mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_tumbling_matches_batch(spark, landing_dir):
    stream = stream_parquet_dir(spark, landing_dir)
    assert stream.isStreaming
    # complete mode: append would hold back windows inside the watermark
    # horizon at end-of-stream (by design) — complete emits all state.
    got = _run_to_memory(
        spark, tumbling_counts(stream), "t_tumble", output_mode="complete"
    ).toPandas()
    # batch twin on the same file
    from neuroimaging_data_pipeline_spark.queries.neuro import st_tumbling_window

    expect = st_tumbling_window(spark, SF_DIR).toPandas()
    got_s = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    exp_s = expect.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s[["window_start", "event_type", "n", "sum_value"]],
        exp_s[["window_start", "event_type", "n", "sum_value"]],
        check_dtype=False,
    )


def test_stream_sliding_matches_batch(spark, landing_dir):
    """Sliding (hopping) windows under a LIVE readStream equal the
    batch twin: every event in exactly four overlapping 1h/15min
    windows, stream and batch bit-equal after rounding."""
    stream = stream_parquet_dir(spark, landing_dir)
    windowed = (
        stream.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
        )
    )
    got = _run_to_memory(
        spark, windowed, "t_slide", output_mode="complete"
    ).toPandas()
    from neuroimaging_data_pipeline_spark.queries.neuro import (
        st_sliding_window,
    )

    expect = st_sliding_window(spark, SF_DIR).toPandas()
    got_s = got.sort_values(["window_start", "event_type"]).reset_index(
        drop=True
    )
    exp_s = expect.sort_values(["window_start", "event_type"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got_s[["window_start", "event_type", "n"]],
        exp_s[["window_start", "event_type", "n"]],
        check_dtype=False,
    )
    # each event contributes to exactly 4 windows
    assert got["n"].sum() == 4000


def test_stream_session_window(spark, landing_dir):
    stream = stream_parquet_dir(spark, landing_dir)
    got = _run_to_memory(
        spark, session_counts(stream), "t_sess", output_mode="complete"
    ).toPandas()
    assert len(got) > 0
    # each session's event count positive; totals match raw row count
    assert (got["n_events"] > 0).all()
    assert got["n_events"].sum() == 1000


def test_foreach_batch_runs_pipeline(spark, landing_dir, tmp_path):
    stream = stream_parquet_dir(spark, landing_dir)
    out_dir = str(tmp_path / "out")
    seen = []

    def process(batch_df, batch_id):
        n = batch_df.count()
        seen.append((batch_id, n))
        batch_df.groupBy("event_type").count().write.mode("overwrite").parquet(
            out_dir
        )

    q = (
        foreach_batch_pipeline(stream, process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == 1000
    back = spark.read.parquet(out_dir)
    assert back.agg(F.sum("count")).first()[0] == 1000


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image" if i % 3 else "video", bytes([i % 256]) * 64,
         640 + i, 480, 100 + i, 0)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, modality string, content binary, "
        "width int, height int, n_frames int, sample_rate int",
    )


def test_decode_features_deterministic(spark, media):
    f1 = decode_features(media).toPandas().set_index("media_id")
    f2 = decode_features(media.repartition(7)).toPandas().set_index("media_id")
    assert len(f1) == 20
    for mid in f1.index:
        np.testing.assert_allclose(f1.loc[mid, "features"], f2.loc[mid, "features"])
    assert all(len(v) == 16 for v in f1["features"])


def test_wav_codec_roundtrip_local():
    """The REAL stdlib WAV codec: arbitrary int16 samples survive an
    encode->decode round trip bit-exactly, including the header fields."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_wav,
        encode_wav_pcm16,
    )

    samples = np.array([0, 1, -1, 32767, -32768, 1234, -4321], dtype=np.int16)
    payload = encode_wav_pcm16(samples, sample_rate=16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    sr, decoded = decode_wav(payload)
    assert sr == 16000
    np.testing.assert_array_equal(decoded, samples)


def test_wav_features_spark_roundtrip(spark):
    """synthesize_wav_clips -> wav_features through Spark: the decoded
    RMS matches a local recomputation from the same md5-nibble sample
    definition, for every row and across repartitioning."""
    import hashlib

    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        synthesize_wav_clips,
        wav_features,
    )

    rows = [(i, f"document number {i} body text") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        wav_features(synthesize_wav_clips(docs.repartition(3)))
        .toPandas()
        .set_index("media_id")
    )
    assert len(out) == 10
    for i, text in rows:
        hexd = hashlib.md5(text.encode()).hexdigest()
        s = np.array([int(c, 16) * 4096 - 32768 for c in hexd], dtype=np.float64)
        assert out.loc[i, "sample_rate"] == 8000
        assert out.loc[i, "n_samples"] == 32
        np.testing.assert_allclose(
            out.loc[i, "rms"], float(np.sqrt(np.mean(s * s))), rtol=1e-12
        )


def test_ppm_codec_roundtrip_local():
    """The REAL stdlib-only PPM codec: arbitrary RGB pixels survive an
    encode->decode round trip bit-exactly, including header parsing."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(9)
    pixels = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    payload = encode_ppm(pixels)
    assert payload.startswith(b"P6\n7 5\n255\n")
    np.testing.assert_array_equal(decode_ppm(payload), pixels)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_ppm_features_spark_roundtrip(spark):
    """synthesize_ppm_images -> ppm_features through Spark: decoded
    channel means match the pixel formula exactly, across partitions."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        ppm_features,
        synthesize_ppm_images,
    )

    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    out = (
        ppm_features(synthesize_ppm_images(docs.repartition(4)))
        .toPandas()
        .set_index("media_id")
    )
    assert len(out) == 9
    ys = np.arange(6)[:, None, None]
    xs = np.arange(8)[None, :, None]
    cs = np.arange(3)[None, None, :]
    for i in range(9):
        px = (i * 7 + ys * 131 + xs * 17 + cs * 59) % 256
        means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
        assert out.loc[i, "width"] == 8 and out.loc[i, "height"] == 6
        np.testing.assert_allclose(
            [out.loc[i, "mean_r"], out.loc[i, "mean_g"], out.loc[i, "mean_b"]],
            means,
            rtol=0,
            atol=0,
        )


def test_png_codec_roundtrip_local():
    """The REAL stdlib-only PNG codec: arbitrary RGB pixels survive an
    encode->decode round trip bit-exactly across shapes that exercise
    every scanline filter type (the writer cycles filters 0..4 by
    row), chunk CRCs are verified, and corruption/unsupported formats
    raise."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(17)
    for h, w in [(1, 1), (2, 3), (5, 7), (10, 8), (16, 16)]:
        pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = encode_png(pixels)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        np.testing.assert_array_equal(decode_png(payload), pixels)
    # gradient rows make Sub/Average/Paeth filters non-trivial
    grad = (
        np.arange(10)[:, None, None] * 11
        + np.arange(8)[None, :, None] * 3
        + np.arange(3)[None, None, :]
    ).astype(np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(grad)), grad)
    payload = encode_png(grad)
    corrupted = bytearray(payload)
    corrupted[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\n\x00\x00\x00")


def test_png_features_spark_roundtrip(spark):
    """synthesize_png_images -> png_features through Spark: decoded
    channel means and the total-pixel checksum match the pixel formula
    exactly, across partitions — the DEFLATE + all-five-filters path
    runs for real inside Arrow-batched mapInPandas."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        png_features,
        synthesize_png_images,
    )

    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    out = (
        png_features(synthesize_png_images(docs.repartition(4)))
        .toPandas()
        .set_index("media_id")
    )
    assert len(out) == 9
    ys = np.arange(10)[:, None, None]
    xs = np.arange(8)[None, :, None]
    cs = np.arange(3)[None, None, :]
    for i in range(9):
        px = (i * 11 + ys * 37 + xs * 23 + cs * 71) % 256
        means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
        assert out.loc[i, "width"] == 8 and out.loc[i, "height"] == 10
        assert out.loc[i, "sum_px"] == int(px.sum())
        np.testing.assert_allclose(
            [out.loc[i, "mean_r"], out.loc[i, "mean_g"], out.loc[i, "mean_b"]],
            means,
            rtol=0,
            atol=0,
        )


def test_png_adam7_interlaced():
    """ADAM7: interlaced encodes round-trip bit-exactly across shapes
    where passes are uneven or EMPTY (1x1 has six empty passes), the
    IHDR interlace byte is really set, and trailing-byte corruption
    in the pass stream raises."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(59)
    for shape in [(1, 1, 3), (2, 3, 3), (7, 5, 3), (9, 12, 3), (33, 47, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        payload = encode_png(img, interlace=True)
        assert payload[16:29][-1] == 1  # IHDR interlace byte
        np.testing.assert_array_equal(decode_png(payload), img)
        # and the sequential mode still round-trips the same pixels
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_jpeg_codec_local():
    """The REAL stdlib-only baseline JPEG codec (multimodal/jpeg.py):
    (a) block-constant images round-trip BIT-EXACTLY (DC-only blocks,
    unit quant table — the engineered-lossless profile the oracle
    fixture uses); (b) arbitrary images round-trip within a measured
    error bound (DCT float rounding only at q=1); (c) non-multiple-
    of-8 dims pad+crop correctly; (d) coarse quant tables decode
    (lossy, as JPEG should be); (e) malformed/unsupported input
    raises instead of returning wrong pixels."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    for _ in range(3):
        blocks = rng.integers(0, 256, (3, 2), dtype=np.uint8)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        payload = encode_jpeg_gray(img)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        np.testing.assert_array_equal(decode_jpeg_gray(payload), img)

    img = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    img = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == (10, 13)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    coarse = decode_jpeg_gray(
        encode_jpeg_gray(img, qtable=np.full((8, 8), 16))
    )
    assert coarse.shape == (10, 13)

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")
    truncated = encode_jpeg_gray(img)[:40]
    with pytest.raises(ValueError):
        decode_jpeg_gray(truncated)


def test_jpeg_features_spark_roundtrip(spark):
    """synthesize_jpeg_images -> jpeg_features through Spark: decoded
    mean/sum match the block formula exactly, across partitions — the
    full Huffman + IDCT path runs inside Arrow-batched mapInPandas."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        jpeg_features,
        synthesize_jpeg_images,
    )

    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    out = (
        jpeg_features(synthesize_jpeg_images(docs.repartition(4)))
        .toPandas()
        .set_index("media_id")
    )
    assert len(out) == 9
    bys = np.arange(3)[:, None]
    bxs = np.arange(2)[None, :]
    for i in range(9):
        blocks = (i * 13 + bys * 41 + bxs * 29) % 256
        assert out.loc[i, "width"] == 16 and out.loc[i, "height"] == 24
        assert out.loc[i, "sum_px"] == int(blocks.sum()) * 64
        np.testing.assert_allclose(
            out.loc[i, "mean_gray"], blocks.astype(np.float64).mean(),
            rtol=0, atol=0,
        )


def test_jpeg_color_codec_local():
    """The 3-component baseline JPEG path: gray-valued RGB round-trips
    BIT-EXACTLY (YCbCr of gray is exact + DC-only blocks), arbitrary
    color within a measured bound (YCbCr + DCT rounding), odd dims
    pad+crop, and the gray/color wrappers reject cross-type input."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(23)
    blocks = rng.integers(0, 256, (3, 2), dtype=np.uint8)
    gray = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    rgb = np.stack([gray, gray, gray], axis=-1)
    np.testing.assert_array_equal(
        decode_jpeg_color(encode_jpeg_color(rgb)), rgb
    )

    arb = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    out = decode_jpeg_color(encode_jpeg_color(arb))
    assert np.abs(out.astype(int) - arb.astype(int)).max() <= 3

    odd = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    assert decode_jpeg_color(encode_jpeg_color(odd)).shape == (11, 9, 3)

    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="expected color"):
        decode_jpeg_color(encode_jpeg_gray(g))
    with pytest.raises(ValueError, match="expected grayscale"):
        decode_jpeg_gray(encode_jpeg_color(odd))


def test_jpeg_progressive_codec_local():
    """Progressive (SOF2, spectral selection): decode of a
    progressive encoding is BIT-IDENTICAL to the baseline decode of
    the same image — the same quantized coefficients travel in a
    different scan order — for arbitrary gray, arbitrary 4:4:4
    color, long EOBn runs, and several band layouts (successive
    approximation has its own test below)."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg,
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(47)
    arb = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    baseline = decode_jpeg_gray(encode_jpeg_gray(arb))
    payload = encode_jpeg_progressive(arb)
    assert b"\xff\xc2" in payload  # really SOF2
    assert payload.count(b"\xff\xda") >= 3  # really multi-scan
    np.testing.assert_array_equal(decode_jpeg(payload), baseline)

    arbc = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(arbc)),
        decode_jpeg_color(encode_jpeg_color(arbc)),
    )

    # one busy block in a flat field -> EOBn runs spanning many blocks
    flat = np.full((64, 64), 200, dtype=np.uint8)
    flat[24:32, 40:48] = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(flat)),
        decode_jpeg_gray(encode_jpeg_gray(flat)),
    )

    for bands in (((1, 63),), ((1, 2), (3, 10), (11, 63))):
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg_progressive(arb, bands=bands)), baseline
        )


def test_jpeg_successive_approximation():
    """Successive approximation (the profile libjpeg's default
    progressive emits): SA-scripted encodes decode BIT-IDENTICAL to
    baseline — all coefficient bits eventually arrive — for gray,
    color, sparse long-EOB-run content, deep 3-bit refinement
    ladders, and randomized spectral/SA scripts."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg,
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        sa_script,
    )

    rng = np.random.default_rng(53)
    arb = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    baseline = decode_jpeg_gray(encode_jpeg_gray(arb))
    payload = encode_jpeg_progressive(arb, script=sa_script(1))
    assert payload.count(b"\xff\xda") == 6  # really multi-scan SA
    np.testing.assert_array_equal(decode_jpeg(payload), baseline)

    arbc = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(arbc, script=sa_script(3))),
        decode_jpeg_color(encode_jpeg_color(arbc)),
    )

    # sparse detail in a flat field: EOBn runs with pending
    # correction bits crossing many blocks
    flat = np.full((80, 80), 3, dtype=np.uint8)
    flat[64:72, 8:16] = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    flat[0:8, 72:80] = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, script=sa_script(1))),
        decode_jpeg_gray(encode_jpeg_gray(flat)),
    )

    # deep refinement ladder: 3 bits held back, refined one at a time
    deep = [
        ([0], 0, 0, 0, 3), ([0], 1, 63, 0, 3),
        ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
        ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
    ]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(arb, script=deep)), baseline
    )

    # SUBSAMPLED progressive: 4:2:0 + SA is the exact shape libjpeg's
    # default progressive emits — must equal the baseline 4:2:0
    # decode bit-for-bit, including odd/non-MCU-multiple dims where
    # the padded MCU grid exceeds the per-component scan grids
    for shape in ((16, 24, 3), (17, 23, 3), (24, 40, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        b420 = decode_jpeg_color(encode_jpeg_color(img, subsampling="420"))
        np.testing.assert_array_equal(
            decode_jpeg(
                encode_jpeg_progressive(
                    img, subsampling="420", script=sa_script(3)
                )
            ),
            b420,
            err_msg=f"shape={shape}",
        )
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg_progressive(img, subsampling="420")),
            b420,
            err_msg=f"shape={shape} (spectral)",
        )

    # coarse quantization tables produce LONG zero-history runs, so
    # the AC-refinement ZRL + buffered-correction-bit interplay (the
    # subtlest part of G.1.2.3) is genuinely exercised — rare at unit
    # quant where blocks are dense
    for q in (16, 80):
        qt = np.full((8, 8), q, dtype=np.int64)
        img = rng.integers(0, 256, (40, 24), dtype=np.uint8)
        base_q = decode_jpeg_gray(encode_jpeg_gray(img, qtable=qt))
        for script in (None, sa_script(1)):
            np.testing.assert_array_equal(
                decode_jpeg(
                    encode_jpeg_progressive(img, qtable=qt, script=script)
                ),
                base_q,
                err_msg=f"q={q} script={'sa' if script else 'spectral'}",
            )

    # randomized scripts: random band splits, random Al depth
    for seed in range(6):
        r = np.random.default_rng(seed)
        img = r.integers(0, 256, (r.integers(9, 40), r.integers(9, 40)),
                         dtype=np.uint8)
        al = int(r.integers(0, 3))
        split = int(r.integers(2, 62))
        script = [([0], 0, 0, 0, al)]
        script += [([0], 1, split, 0, al), ([0], split + 1, 63, 0, al)]
        for a in range(al, 0, -1):
            script.append(([0], 0, 0, a, a - 1))
            script.append(([0], 1, 63, a, a - 1))
        got = decode_jpeg(encode_jpeg_progressive(img, script=script))
        want = decode_jpeg_gray(encode_jpeg_gray(img))
        np.testing.assert_array_equal(got, want, err_msg=f"seed={seed}")


def test_jpeg_restart_markers():
    """DRI/RSTn: restart intervals round-trip bit-exactly on constant
    blocks (gray, 4:4:4 color AND 4:2:0), RST counters wrap mod 8
    past 8 restarts, and an out-of-sequence marker raises instead of
    silently desyncing."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(41)
    gray = np.kron(
        rng.integers(0, 256, (4, 3), dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    for ri in (1, 2, 5):
        payload = encode_jpeg_gray(gray, restart_interval=ri)
        assert b"\xff\xdd" in payload  # DRI present
        np.testing.assert_array_equal(decode_jpeg_gray(payload), gray)

    g2 = np.kron(
        rng.integers(0, 256, (2, 2), dtype=np.uint8),
        np.ones((16, 16), dtype=np.uint8),
    )
    rgb = np.stack([g2] * 3, axis=-1)
    for sub in ("444", "420"):
        payload = encode_jpeg_color(rgb, subsampling=sub, restart_interval=1)
        np.testing.assert_array_equal(decode_jpeg_color(payload), rgb)

    # 24 MCUs at interval 1 -> RST counter wraps 0..7 repeatedly
    tall = np.kron(
        rng.integers(0, 256, (12, 2), dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    payload = encode_jpeg_gray(tall, restart_interval=1)
    np.testing.assert_array_equal(decode_jpeg_gray(payload), tall)

    corrupted = bytearray(payload)
    i = corrupted.index(b"\xff\xd0")
    corrupted[i + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_gray(bytes(corrupted))


def test_wav_frame_features(spark):
    """Frame-level audio features: boundaries split exactly at
    frame_len, zero-crossings count only WITHIN a frame (a sign flip
    across the frame boundary is not counted), trailing short frame
    keeps its true length."""
    import io
    import wave

    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        encode_wav_pcm16,
        wav_frame_features,
    )

    # 10 samples, frame_len=4 -> frames of 4, 4, 2.
    # frame 0: + + - -  -> 1 crossing
    # frame 1: - + - +  -> 3 crossings (the -)(- boundary flip from
    #          frame 0's last '-' to frame 1's '-' is no flip; but
    #          frame 1 starts '-' after frame 0 ends '-')
    # frame 2: + +      -> 0 crossings; boundary flip (+ after +) none
    samples = np.array(
        [100, 200, -100, -200, -50, 60, -70, 80, 90, 10], dtype=np.int16
    )
    payload = encode_wav_pcm16(samples, sample_rate=8000)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, content binary"
    )
    out = (
        wav_frame_features(media, frame_len=4)
        .toPandas()
        .sort_values("frame_idx")
        .reset_index(drop=True)
    )
    assert list(out["n_in_frame"]) == [4, 4, 2]
    assert list(out["n_zero_cross"]) == [1, 3, 0]
    expected_rms = [
        float(np.sqrt(np.mean(samples[i : i + 4].astype(float) ** 2)))
        for i in (0, 4, 8)
    ]
    np.testing.assert_allclose(out["rms"].tolist(), expected_rms, rtol=1e-12)


def test_jpeg_420_codec_local():
    """The 4:2:0-subsampled path (generalized sampling factors):
    constant-16x16-macroblock gray RGB round-trips BIT-EXACTLY
    through the 4-Y+Cb+Cr interleaved MCU layout; luma survives
    nearly exactly on arbitrary color (chroma carries the
    subsampling loss); odd/non-MCU-multiple dims pad+crop; and the
    SOF sampling bytes really say 2x2."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(31)
    macros = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    gray = np.kron(macros, np.ones((16, 16), dtype=np.uint8))
    rgb = np.stack([gray, gray, gray], axis=-1)
    payload = encode_jpeg_color(rgb, subsampling="420")
    # SOF0 component spec: Y sampling byte must be 0x22
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11] == 0x22 and payload[sof + 14] == 0x11
    # smaller than the 4:4:4 encoding of the same image (that's the point)
    assert len(payload) < len(encode_jpeg_color(rgb, subsampling="444"))
    np.testing.assert_array_equal(decode_jpeg_color(payload), rgb)

    # arbitrary SMOOTH color: chroma varies slowly, so subsampling
    # loss stays small end-to-end
    yy, xx = np.mgrid[0:32, 0:48]
    smooth = np.stack(
        [(yy * 2) % 256, (xx * 2) % 256, ((yy + xx)) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg_color(encode_jpeg_color(smooth, subsampling="420"))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8

    odd = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    assert decode_jpeg_color(
        encode_jpeg_color(odd, subsampling="420")
    ).shape == (19, 21, 3)


def test_gzip_text_roundtrip(spark):
    """gzip shard round trip through Spark: decompressed text digests
    match local recomputation; payloads are genuine gzip members and
    actually compress repetitive text."""
    import gzip
    import hashlib

    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        gzip_text_features,
        synthesize_gzip_docs,
    )

    rows = [(i, ("token%d " % (i % 3)) * 50) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = synthesize_gzip_docs(docs.repartition(3))
    payloads = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for i, text in rows:
        assert payloads[i][:2] == b"\x1f\x8b"  # gzip magic
        assert len(payloads[i]) < len(text)     # really compressed
        assert gzip.decompress(payloads[i]).decode() == text
    out = gzip_text_features(media).toPandas().set_index("media_id")
    for i, text in rows:
        assert out.loc[i, "n_chars"] == len(text)
        assert out.loc[i, "digest"] == hashlib.md5(text.encode()).hexdigest()


def test_decode_unavailable_decoder_raises(spark, media):
    with pytest.raises(NotImplementedError):
        decode_features(media, decoder="pil")


def test_resize_and_frame_sample_plans(spark, media):
    r = resize_plan(media, 320, 240).toPandas().set_index("media_id")
    assert (r["out_w"] <= 320).all() and (r["out_h"] <= 240).all()
    fs = frame_sample_plan(media, every_n=25).toPandas()
    vid = fs[fs.media_id == 3]
    assert list(vid["frame_idx"]) == [0, 25, 50, 75, 100]


@pytest.fixture()
def two_batch_landing(tmp_path, spark):
    """Two parquet files + maxFilesPerTrigger=1 -> two micro-batches,
    so cross-batch state carry is actually exercised."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a, b = df.filter("event_id % 2 = 0"), df.filter("event_id % 2 = 1")
    a.coalesce(1).write.parquet(str(tmp_path / "a"))
    b.coalesce(1).write.parquet(str(tmp_path / "b"))
    d = tmp_path / "landing"
    d.mkdir()
    import glob
    import shutil as sh

    for i, src in enumerate(
        sorted(glob.glob(str(tmp_path / "*" / "part-*.parquet")))
    ):
        sh.copy(src, d / f"events-{i:03d}.parquet")
    return str(d)


def test_stateful_user_stats_carries_state(spark, two_batch_landing):
    from neuroimaging_data_pipeline_spark.streaming.events import (
        stateful_user_stats,
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_landing)
    )
    sdf = stateful_user_stats(stream)
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_stateful").toPandas()
    # at least one user appears in >1 micro-batch with growing totals
    multi = got.groupby("user_id").size()
    assert (multi > 1).any()
    # final cumulative totals per user match the batch ground truth
    final = got.sort_values("n_total").groupby("user_id").last()
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.max("value").alias("mx"),
        )
        .toPandas()
        .set_index("user_id")
    )
    for uid, row in final.iterrows():
        assert row["n_total"] == batch.loc[uid, "n"]
        assert abs(row["sum_total"] - batch.loc[uid, "s"]) < 1e-6
        assert abs(row["max_value"] - batch.loc[uid, "mx"]) < 1e-12


def test_jpeg_422_codec():
    """4:2:2 (horizontal-only chroma halving, the broadcast layout):
    SOF says 2x1, constant 8x16 blocks round-trip bit-exactly through
    baseline AND progressive+SA, smooth color stays bounded."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg,
        decode_jpeg_color,
        encode_jpeg_color,
        encode_jpeg_progressive,
        sa_script,
    )

    rng = np.random.default_rng(61)
    gray = np.kron(
        rng.integers(0, 256, (3, 2), dtype=np.uint8),
        np.ones((8, 16), dtype=np.uint8),
    )
    rgb = np.stack([gray] * 3, axis=-1)
    payload = encode_jpeg_color(rgb, subsampling="422")
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11] == 0x21  # Y sampling 2x1
    np.testing.assert_array_equal(decode_jpeg_color(payload), rgb)

    yy, xx = np.mgrid[0:24, 0:32]
    smooth = np.stack(
        [(yy * 3) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg_color(encode_jpeg_color(smooth, subsampling="422"))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8

    for shape in ((16, 24, 3), (17, 23, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(
                encode_jpeg_progressive(
                    img, subsampling="422", script=sa_script(3)
                )
            ),
            decode_jpeg_color(encode_jpeg_color(img, subsampling="422")),
            err_msg=f"shape={shape}",
        )


def test_stream_stream_enrich_join_matches_batch(spark, landing_dir):
    """LIVE stream-stream inner join (streaming/dedup.py
    enrich_stream): two readStream sources over the landing dir —
    the full event stream and its signup-filtered metadata stream —
    joined with the [event - 1h, event] time bound. Inner
    stream-stream joins emit matches eagerly (the watermark bounds
    STATE, not output), so append mode must reproduce the batch join
    exactly, row for row."""
    from neuroimaging_data_pipeline_spark.sources.tables import read_table
    from neuroimaging_data_pipeline_spark.streaming.dedup import enrich_stream
    from neuroimaging_data_pipeline_spark.streaming.events import (
        stream_parquet_dir,
    )

    ev = stream_parquet_dir(spark, landing_dir).select(
        "event_id", "user_id", "ts"
    )
    meta = (
        stream_parquet_dir(spark, landing_dir)
        .filter(F.col("event_type") == "signup")
        .select("user_id", F.col("ts").alias("mts"))
    )
    joined = enrich_stream(ev, meta)
    assert joined.isStreaming
    got = _run_to_memory(
        spark, joined, "t_enrich_live", output_mode="append"
    ).toPandas()

    b = read_table(spark, SF_DIR, "events")
    base = b.select("event_id", "user_id", "ts")
    m = b.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("mu"), F.col("ts").alias("mts")
    )
    expect = (
        base.join(
            m,
            (base.user_id == m.mu)
            & (F.col("mts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("mts") <= F.col("ts")),
        )
        .select("event_id", "mts")
        .toPandas()
    )
    assert len(got) == len(expect) > 0
    got_pairs = sorted(zip(got["event_id"], got["mts"]))
    exp_pairs = sorted(zip(expect["event_id"], expect["mts"]))
    assert got_pairs == exp_pairs
