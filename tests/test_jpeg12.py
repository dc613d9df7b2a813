"""12-bit extended-sequential JPEG (SOF1) codec tests — the encoder
in multimodal/jpeg12.py plus the decoder paths added to jpeg.py
(SOF1 marker, Pq=1 16-bit DQT, 12-bit level shift / clamp / uint16
output). The oracle seal lives in m18_jpeg12_stats; these pin the
lossy bound, the optimal-Huffman builder's spec invariants, and the
error paths."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from neuroimaging_data_pipeline_spark.multimodal.jpeg12 import (
    build_huffman_table,
    encode_jpeg_gray12,
)


def test_constant_blocks_bit_exact_and_uint16():
    base = np.arange(3)[:, None] * 67 + np.arange(2)[None, :] * 61
    for i in (0, 7, 123, 499):
        blocks = ((i * 29 + base) % 4096).astype(np.uint16)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint16))
        dec = decode_jpeg_gray(encode_jpeg_gray12(img))
        assert dec.dtype == np.uint16
        assert np.array_equal(dec, img)
        # the fixture exercises true 12-bit dynamic range
        if img.max() > 255:
            assert dec.max() > 255


def test_random_content_error_bound_unit_quant():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 4096, size=(40, 56)).astype(np.uint16)
    dec = decode_jpeg_gray(encode_jpeg_gray12(img))
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    # unit quantization: only float-DCT rounding remains
    assert err <= 2


def test_16bit_dqt_entries_round_trip():
    # entries > 255 force the Pq=1 parse; values chosen so DC stays
    # exactly representable: samples are 2048 + 128k, q[0,0]=1024
    q = np.full((8, 8), 1024, dtype=np.int64)
    q[0, 0] = 1024
    blocks = (2048 + 128 * np.arange(6).reshape(3, 2)) % 4096
    img = np.kron(blocks, np.ones((8, 8))).astype(np.uint16)
    dec = decode_jpeg_gray(encode_jpeg_gray12(img, qtable=q))
    assert np.array_equal(dec, img)


def test_optimal_huffman_spec_invariants():
    # 226-symbol AC-like alphabet with skewed frequencies
    freqs = {s: (s * 7) % 31 + 1 for s in range(226)}
    bits, vals = build_huffman_table(freqs)
    assert len(bits) == 16 and sum(bits) == len(vals) == 226
    # Kraft strictly < 1: the all-ones codeword is reserved/unused
    kraft = sum(n * 2.0 ** -ln for ln, n in zip(range(1, 17), bits))
    assert kraft < 1.0
    # more frequent symbols never get longer codes
    lengths = {}
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lengths[vals[k]] = ln
            k += 1
    top = max(freqs, key=freqs.get)
    assert lengths[top] == min(lengths.values())


def test_huffman_length_limit_16_on_pathological_skew():
    # fibonacci-ish frequencies force unlimited Huffman beyond 16
    # levels; the K.3 adjustment must fold them down
    f = [1, 1]
    while len(f) < 40:
        f.append(f[-1] + f[-2])
    freqs = {s: f[s] for s in range(40)}
    bits, vals = build_huffman_table(freqs)
    assert sum(bits) == 40
    assert all(b >= 0 for b in bits)
    kraft = sum(n * 2.0 ** -ln for ln, n in zip(range(1, 17), bits))
    assert kraft <= 1.0


def test_optimal_tables_beat_or_match_fixed_on_8bit_path():
    # the builder is profile-independent: a 12-bit stream of an
    # 8-bit-valued image must not be larger than the fixed-table
    # 8-bit encoding by more than the header delta
    rng = np.random.RandomState(7)
    img8 = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    fixed = encode_jpeg_gray(img8)
    opt12 = encode_jpeg_gray12(img8.astype(np.uint16))
    # scan payloads dominate; optimal tables recoup the 64-byte DQT
    # growth on any non-trivial image
    assert len(opt12) <= len(fixed) + 128


@settings(max_examples=15, deadline=None)
@given(
    arrays(
        np.uint16,
        st.tuples(
            st.integers(min_value=8, max_value=24),
            st.integers(min_value=8, max_value=24),
        ),
        elements=st.integers(min_value=0, max_value=4095),
    )
)
def test_jpeg12_roundtrip_property(img):
    dec = decode_jpeg_gray(encode_jpeg_gray12(img))
    assert dec.shape == img.shape and dec.dtype == np.uint16
    assert np.abs(dec.astype(np.int64) - img.astype(np.int64)).max() <= 2


def test_error_paths():
    with pytest.raises(ValueError, match="12-bit"):
        encode_jpeg_gray12(np.full((8, 8), 5000, dtype=np.uint16))
    with pytest.raises(ValueError):
        encode_jpeg_gray12(np.zeros((8, 8, 3), dtype=np.uint16))
    # decoder: 12-bit under baseline SOF0 is spec-illegal -> raise
    payload = bytearray(
        encode_jpeg_gray12(np.zeros((8, 8), dtype=np.uint16))
    )
    i = payload.index(b"\xff\xc1")
    payload[i + 1] = 0xC0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg_gray(bytes(payload))
