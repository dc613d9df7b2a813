"""Arithmetic-coded JPEG (SOF9) codec tests — multimodal/
jpeg_arith.py. The oracle seal lives in m19_jpeg_arith; these pin the
coder's round-trip at both precisions, the adaptive-compression win
over the Huffman coder, marker/stuffing invariants, and error
paths."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
    encode_jpeg_gray,
)
from neuroimaging_data_pipeline_spark.multimodal.jpeg_arith import (
    _ArithDecoder,
    _ArithEncoder,
    decode_jpeg_arith,
    encode_jpeg_arith,
)


def test_constant_blocks_bit_exact_12bit():
    base = np.arange(3)[:, None] * 71 + np.arange(2)[None, :] * 73
    for i in (0, 9, 321, 499):
        blocks = ((i * 31 + base) % 4096).astype(np.uint16)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint16))
        dec = decode_jpeg_arith(encode_jpeg_arith(img, precision=12))
        assert dec.dtype == np.uint16
        assert np.array_equal(dec, img)


def test_random_roundtrip_both_precisions():
    rng = np.random.RandomState(3)
    img8 = rng.randint(0, 256, size=(48, 40)).astype(np.uint8)
    dec8 = decode_jpeg_arith(encode_jpeg_arith(img8, precision=8))
    assert dec8.dtype == np.uint8
    assert np.abs(dec8.astype(np.int64) - img8.astype(np.int64)).max() <= 2
    img12 = rng.randint(0, 4096, size=(24, 32)).astype(np.uint16)
    dec12 = decode_jpeg_arith(encode_jpeg_arith(img12, precision=12))
    assert dec12.dtype == np.uint16
    assert np.abs(dec12.astype(np.int64) - img12.astype(np.int64)).max() <= 2


def test_adaptive_coder_beats_huffman_on_natural_content():
    # smooth gradients + mild noise — the shape real photos have;
    # the context-adaptive coder should land clearly under the
    # fixed-Annex-K-table Huffman coder
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:64, 0:64]
    nat = np.clip(
        128 + 60 * np.sin(yy / 9.0) + 40 * np.cos(xx / 7.0)
        + rng.randint(-6, 7, (64, 64)),
        0,
        255,
    ).astype(np.uint8)
    q = np.full((8, 8), 16, dtype=np.int64)
    a = len(encode_jpeg_arith(nat, qtable=q))
    hf = len(encode_jpeg_gray(nat, qtable=q))
    assert a < hf * 0.9


def test_raw_coder_bitstream_roundtrip_with_stuffing():
    # drive the raw coder with a skewed bit pattern long enough to
    # force renormalizations, carries and 0xFF stuffing
    rng = np.random.RandomState(5)
    bits = [(("c", i % 7), int(rng.rand() < 0.95)) for i in range(5000)]
    enc = _ArithEncoder()
    for key, b in bits:
        enc.bit(key, b)
    payload = enc.flush()
    # heavily-skewed input compresses far below 1 bit/symbol
    assert len(payload) < 5000 / 8
    dec = _ArithDecoder(payload)
    for key, b in bits:
        assert dec.bit(key) == b


def test_marker_walk_and_dac_segment():
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = encode_jpeg_arith(img, kx=9)
    # SOF9 and DAC markers present; Kx conveyed and honored on decode
    assert b"\xff\xc9" in payload and b"\xff\xcc" in payload
    i = payload.index(b"\xff\xcc")
    assert payload[i + 6] == 0x10 and payload[i + 7] == 9
    assert np.array_equal(decode_jpeg_arith(payload), img)


@settings(max_examples=10, deadline=None)
@given(
    arrays(
        np.uint16,
        st.tuples(
            st.integers(min_value=8, max_value=17),
            st.integers(min_value=8, max_value=17),
        ),
        elements=st.integers(min_value=0, max_value=4095),
    )
)
def test_arith_roundtrip_property(img):
    dec = decode_jpeg_arith(encode_jpeg_arith(img, precision=12))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(np.int64) - img.astype(np.int64)).max() <= 2


def test_error_paths():
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_arith(np.zeros((8, 8), dtype=np.uint8), precision=10)
    with pytest.raises(ValueError, match="8-bit"):
        encode_jpeg_arith(np.full((8, 8), 300, dtype=np.uint16), precision=8)
    with pytest.raises(ValueError, match="Kx"):
        encode_jpeg_arith(np.zeros((8, 8), dtype=np.uint8), kx=64)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_arith(b"\x00\x01")
    # Huffman decoder must refuse SOF9 streams, not misparse them
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="0xFFC9"):
        decode_jpeg(encode_jpeg_arith(np.zeros((8, 8), dtype=np.uint8)))
