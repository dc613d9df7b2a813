"""Property tests (SURVEY.md §5.2#4): algebraic invariants of the
time-series operators, hypothesis-generated inputs vs numpy oracles.

Example counts are small: each example runs real Spark jobs; the
invariants are linear-algebraic, so a handful of random draws plus the
adversarial shrink phase covers the edge geometry (constant series,
near-zero variance, single-spike series)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.convolve import fir_convolve
from neuroimaging_data_pipeline_spark.functions.timeseries import diff, zscore

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

series = arrays(
    np.float64,
    st.integers(min_value=4, max_value=24),
    elements=st.floats(
        min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
    ),
)


def _to_df(spark, xs: dict[str, np.ndarray]):
    n = len(next(iter(xs.values())))
    pdf = pd.DataFrame({"subject": "s", "run": 1, "t": np.arange(n)} | xs)
    return spark.createDataFrame(pdf)


@given(x=series)
@settings(**_SETTINGS)
def test_zscore_mean_zero_sd_one(spark, x):
    df = zscore(_to_df(spark, {"x": x}), ["x"], ddof=1, suffix="_z")
    got = df.toPandas().sort_values("t")["x_z"].to_numpy()
    if np.std(x, ddof=1) < 1e-12:
        # Constant or numerically-constant series. numpy's two-pass std
        # can be ~1e-17 where Spark's Welford stddev is exactly 0 (round-1
        # hypothesis catch); the engine nulls zscores only in the exact-0
        # case, and the strict moment asserts are meaningless either way.
        assert np.isnan(got).all() or np.isfinite(got).all()
    else:
        assert abs(np.nanmean(got)) < 1e-8
        assert abs(np.nanstd(got, ddof=1) - 1.0) < 1e-8


@given(x=series, data=st.data())
@settings(**_SETTINGS)
def test_convolution_linearity(spark, x, data):
    y = data.draw(
        arrays(
            np.float64,
            len(x),
            elements=st.floats(
                min_value=-1e3,
                max_value=1e3,
                allow_nan=False,
                allow_infinity=False,
            ),
        )
    )
    a, b = 2.0, -0.5
    kernel = [0.5, 0.3, 0.2]
    df = _to_df(spark, {"x": x, "y": y, "z": a * x + b * y})
    out = (
        fir_convolve(df, ["x", "y", "z"], kernel)
        .toPandas()
        .sort_values("t")
    )
    np.testing.assert_allclose(
        out["z_c0"],
        a * out["x_c0"] + b * out["y_c0"],
        rtol=1e-9,
        atol=1e-6,
    )


@given(x=series)
@settings(**_SETTINGS)
def test_diff_cumsum_identity(spark, x):
    """cumsum(diff(x, fill=0)) + x_0 == x (W2 + P9 round-trip)."""
    df = diff(_to_df(spark, {"x": x}), ["x"], fill=0.0)
    out = df.toPandas().sort_values("t")
    rebuilt = out["x_d"].cumsum().to_numpy() + x[0]
    np.testing.assert_allclose(rebuilt, x, rtol=1e-9, atol=1e-9)


@given(x=series)
@settings(**_SETTINGS)
def test_convolution_matches_numpy(spark, x):
    kernel = [1.0, -0.25, 0.125, 0.0625]
    df = _to_df(spark, {"x": x})
    got = (
        fir_convolve(df, ["x"], kernel).toPandas().sort_values("t")["x_c0"]
    )
    expect = np.convolve(x, kernel, mode="full")[: len(x)]
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-6)


# --- codec round-trip properties (no Spark: pure codec kernels, so
# hypothesis can afford many examples and a real shrink phase) -------

rgb_images = st.integers(min_value=1, max_value=12).flatmap(
    lambda h: st.integers(min_value=1, max_value=12).map(lambda w: (h, w))
).flatmap(
    lambda hw: arrays(
        np.uint8, (hw[0], hw[1], 3),
        elements=st.integers(min_value=0, max_value=255),
    )
)


@settings(max_examples=50, deadline=None)
@given(px=rgb_images)
def test_png_roundtrip_property(px):
    """ANY uint8 RGB image survives PNG encode->decode bit-exactly
    (the writer cycles all five filter types by row)."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_png,
        encode_png,
    )

    np.testing.assert_array_equal(decode_png(encode_png(px)), px)


gray_images = st.integers(min_value=1, max_value=20).flatmap(
    lambda h: st.integers(min_value=1, max_value=20).map(lambda w: (h, w))
).flatmap(
    lambda hw: arrays(
        np.uint8, hw,
        elements=st.integers(min_value=0, max_value=255),
    )
)


@settings(max_examples=30, deadline=None)
@given(img=gray_images)
def test_jpeg_roundtrip_property(img):
    """ANY uint8 grayscale image survives baseline-JPEG encode->decode
    within a small bound at unit quantization (DCT float rounding
    only), including non-multiple-of-8 dims (pad + crop). Bound is 2,
    not 1: per-pixel reconstruction error is a weighted sum of 64
    coefficient roundings (std ~0.29), so an occasional |err|=2 pixel
    is expected across fresh random examples — a 1-bound would flake."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


@settings(max_examples=50, deadline=None)
@given(text=st.text(max_size=2000))
def test_gzip_text_roundtrip_property(text):
    """ANY unicode text survives the gzip shard round trip exactly."""
    import gzip

    payload = gzip.compress(text.encode("utf-8"), compresslevel=6, mtime=0)
    assert gzip.decompress(payload).decode("utf-8") == text


@settings(max_examples=30, deadline=None)
@given(
    samples=arrays(
        np.int16,
        st.integers(min_value=1, max_value=200),
        elements=st.integers(min_value=-32768, max_value=32767),
    ),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, sr):
    """ANY int16 sample vector survives the WAV round trip exactly at
    any standard rate."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_wav,
        encode_wav_pcm16,
    )

    got_sr, got = decode_wav(encode_wav_pcm16(samples, sample_rate=sr))
    assert got_sr == sr
    np.testing.assert_array_equal(got, samples)


@settings(max_examples=40, deadline=None)
@given(px=rgb_images)
def test_png_adam7_roundtrip_property(px):
    """ANY uint8 RGB image survives the ADAM7-interlaced PNG round
    trip bit-exactly — small shapes here mean many examples have
    EMPTY or single-pixel passes, the geometry worth fuzzing."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        decode_png,
        encode_png,
    )

    np.testing.assert_array_equal(
        decode_png(encode_png(px, interlace=True)), px
    )


@settings(max_examples=15, deadline=None)
@given(img=gray_images, data=st.data())
def test_jpeg_progressive_equals_baseline_property(img, data):
    """For ANY grayscale image and a RANDOM valid scan script
    (random band split, random successive-approximation depth),
    progressive decode is BIT-IDENTICAL to baseline decode — the
    strongest statement of the multi-scan entropy coder's
    correctness, because every coefficient bit must arrive exactly
    once through EOBn runs, ZRL spans and refinement correction
    bits."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    al = data.draw(st.integers(min_value=0, max_value=3))
    split = data.draw(st.integers(min_value=1, max_value=62))
    script = [([0], 0, 0, 0, al)]
    script += [([0], 1, split, 0, al), ([0], split + 1, 63, 0, al)]
    for a in range(al, 0, -1):
        script.append(([0], 0, 0, a, a - 1))
        script.append(([0], 1, 63, a, a - 1))
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(img, script=script)),
        decode_jpeg_gray(encode_jpeg_gray(img)),
    )


@settings(max_examples=60, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=10**12))
def test_mp4_roundtrip_property(doc_id):
    """ANY doc id's MP4 fixture parses back to exactly the generating
    sample plan — durations, sizes, chunk-resolved byte ranges — so
    the box writer and the stts/stsc/stsz/stco walker agree across
    the whole id space (1- and 2-chunk layouts, all run-length
    shapes)."""
    from neuroimaging_data_pipeline_spark.multimodal.mp4 import (
        _sample_payload,
        _sample_plan,
        decode_mp4_meta,
        encode_mp4,
    )

    payload = encode_mp4(doc_id)
    m = decode_mp4_meta(payload)
    durs, sizes = _sample_plan(doc_id)
    assert m["duration"] == sum(durs) == m["media_duration"]
    assert m["n_samples"] == len(durs)
    assert m["total_sample_bytes"] == sum(sizes)
    for i, (off, size) in enumerate(m["sample_ranges"]):
        assert payload[off : off + size] == _sample_payload(doc_id, i, size)


# --- sixth-pass operators: BPE / chunking / packing invariants ------

words_corpus = st.lists(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=5), min_size=1, max_size=8
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(corpus=words_corpus, n_merges=st.integers(min_value=0, max_value=6))
@settings(**_SETTINGS)
def test_bpe_train_matches_pure_python_reference(spark, corpus, n_merges):
    """Distributed BPE training == the dict-based Sennrich reference
    on arbitrary corpora (tie-heavy by construction: 4-letter
    alphabet forces frequent equal pair counts, exercising the
    (cnt desc, a asc, b asc) tie-break)."""
    from neuroimaging_data_pipeline_spark.text.bpe import bpe_train
    from tests.test_bpe import _word_freqs, ref_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges)
    want = ref_train(_word_freqs(corpus), n_merges)
    assert [(m["a"], m["b"], m["cnt"]) for m in got] == want


@given(corpus=words_corpus)
@settings(**_SETTINGS)
def test_chunking_covers_every_token_exactly_under_stride(spark, corpus):
    """With stride == chunk_size (no overlap) chunks PARTITION the
    token stream: chunk sizes sum to the doc's token count."""
    from neuroimaging_data_pipeline_spark.text.chunking import chunk_sliding

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    out = chunk_sliding(docs, chunk_size=4, stride=4).toPandas()
    for i, t in enumerate(corpus):
        n = len(t.split())
        chunks = out[out.doc_id == i]
        assert chunks.n_tokens.sum() == n
        assert (chunks.n_tokens <= 4).all()


@given(corpus=words_corpus)
@settings(**_SETTINGS)
def test_pack_blocks_intervals_tile_the_stream(spark, corpus):
    """Packing invariants per stream: intervals are contiguous
    (start_i+1 = start_i + n_i in id order), total equals the token
    sum, and block spans are consistent with the intervals."""
    from neuroimaging_data_pipeline_spark.text.chunking import pack_blocks

    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(corpus)],
        "doc_id long, source string, text string",
    )
    out = (
        pack_blocks(docs, block_size=5)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect_start = 0
    for _, r in out.iterrows():
        assert r.start_tok == expect_start
        assert r.first_block == r.start_tok // 5
        last = r.start_tok + max(r.n_tokens, 1) - 1
        assert r.last_block == last // 5
        expect_start += r.n_tokens
