"""JPEG hierarchical (T.81 Annex J): J.1.1.2 expansion filter pins,
exact constant pyramids, decoder-mirror contract on random pyramids,
marker structure, gates."""

from __future__ import annotations

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.jpeg_hier import (
    decode_jpeg_hierarchical,
    encode_jpeg_hierarchical,
    expand_reference,
)


def test_expand_filter_matches_scalar_formula():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 256, (6, 9)).astype(np.int64)
    e = expand_reference(p, 1, 0)
    assert e.shape == (6, 18)
    for y in range(6):
        for x in range(9):
            assert e[y, 2 * x] == p[y, x]
            nb = p[y, min(x + 1, 8)]
            assert e[y, 2 * x + 1] == (p[y, x] + nb + 1) >> 1
    ev = expand_reference(p, 0, 1)
    assert ev.shape == (12, 9)
    for y in range(6):
        nbrow = p[min(y + 1, 5)]
        np.testing.assert_array_equal(ev[2 * y], p[y])
        np.testing.assert_array_equal(ev[2 * y + 1], (p[y] + nbrow + 1) >> 1)
    # 2x2 expansion = horizontal then vertical
    np.testing.assert_array_equal(
        expand_reference(p, 1, 1),
        expand_reference(expand_reference(p, 1, 0), 0, 1),
    )


def test_exact_constant_pyramid_roundtrip():
    for i in (0, 3, 11):
        c0 = 16 + (i * 29) % 224
        c1 = 16 + (i * 57) % 224
        by, bx = np.mgrid[0:4, 0:4]
        t = (16 + (i * 13 + by * 37 + bx * 53) % 224).repeat(8, 0).repeat(
            8, 1
        ).astype(np.uint8)
        levels = [np.full((8, 8), c0, np.uint8),
                  np.full((16, 16), c1, np.uint8), t]
        blob, recons = encode_jpeg_hierarchical(levels)
        dec = decode_jpeg_hierarchical(blob)
        assert len(dec) == 3
        for lv, d, r in zip(levels, dec, recons):
            np.testing.assert_array_equal(d, lv)
            np.testing.assert_array_equal(r, lv)


def test_random_pyramid_decoder_mirrors_encoder():
    """Lossy content: the decoder must still reproduce the encoder's
    own recon bit-exactly at every level, and the final level must be
    close to the source at unit quantization."""
    rng = np.random.default_rng(7)
    lv0 = rng.integers(0, 256, (16, 24), np.uint8)
    lv1 = rng.integers(0, 256, (32, 48), np.uint8)
    lv2 = rng.integers(0, 256, (64, 96), np.uint8)
    blob, recons = encode_jpeg_hierarchical([lv0, lv1, lv2])
    dec = decode_jpeg_hierarchical(blob)
    assert len(dec) == 3
    for r, d in zip(recons, dec):
        np.testing.assert_array_equal(r, d)
    assert np.abs(dec[2].astype(int) - lv2.astype(int)).max() <= 2


def test_marker_structure():
    levels = [np.full((8, 8), 100, np.uint8),
              np.full((16, 16), 120, np.uint8)]
    blob, _ = encode_jpeg_hierarchical(levels)
    assert blob.count(b"\xff\xde") == 1  # one DHP
    assert blob.count(b"\xff\xdf") == 1  # one EXP per differential frame
    assert b"\xff\xc0" in blob  # non-differential base
    assert b"\xff\xc5" in blob  # differential sequential frame
    # DHP carries the FULL dims (16x16)
    i = blob.index(b"\xff\xde")
    import struct as st
    _, h, w, _ = st.unpack(">BHHB", blob[i + 4 : i + 10])
    assert (h, w) == (16, 16)


def test_gates_and_validation():
    with pytest.raises(ValueError, match="double"):
        encode_jpeg_hierarchical(
            [np.zeros((8, 8), np.uint8), np.zeros((24, 24), np.uint8)]
        )
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg_hierarchical([np.zeros((12, 12), np.uint8)])
    # a differential-progressive frame must raise, not silently decode
    levels = [np.full((8, 8), 90, np.uint8),
              np.full((16, 16), 110, np.uint8)]
    blob, _ = encode_jpeg_hierarchical(levels)
    bad = blob.replace(b"\xff\xc5", b"\xff\xc6")
    with pytest.raises(NotImplementedError, match="differential"):
        decode_jpeg_hierarchical(bad)


def test_single_level_pyramid_is_plain_baseline():
    """A 1-level 'pyramid' must decode exactly like the baseline
    writer at unit quantization on constant blocks."""
    by, bx = np.mgrid[0:2, 0:2]
    t = (40 + by * 50 + bx * 30).repeat(8, 0).repeat(8, 1).astype(np.uint8)
    blob, recons = encode_jpeg_hierarchical([t])
    dec = decode_jpeg_hierarchical(blob)
    np.testing.assert_array_equal(dec[0], t)
    np.testing.assert_array_equal(recons[0], t)
