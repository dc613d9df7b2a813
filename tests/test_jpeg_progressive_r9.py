"""r9 JPEG remnants: restart markers inside progressive scans and
12-bit progressive (grayscale + color)."""

from __future__ import annotations

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
    encode_jpeg_progressive,
    sa_script,
)


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_progressive_restart_gray_matches_baseline(ri):
    """Restart markers change the framing, never the coefficients:
    progressive-with-restarts must decode bit-identically to the
    baseline encode of the same image."""
    img = np.random.default_rng(5 + ri).integers(0, 256, (40, 56), np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(img, restart_interval=ri))
    base = decode_jpeg(encode_jpeg_gray(img))
    np.testing.assert_array_equal(got, base)


@pytest.mark.parametrize("ri", [2, 5])
def test_progressive_restart_color_420_sa(ri):
    """The full web profile + restarts: 4:2:0, successive
    approximation, DRI/RSTn inside every scan."""
    img = np.random.default_rng(9 + ri).integers(0, 256, (40, 56, 3), np.uint8)
    got = decode_jpeg(
        encode_jpeg_progressive(
            img, script=sa_script(3), subsampling="420", restart_interval=ri
        )
    )
    base = decode_jpeg(encode_jpeg_color(img, subsampling="420"))
    np.testing.assert_array_equal(got, base)


def test_progressive_restart_out_of_sequence_raises():
    img = np.random.default_rng(3).integers(0, 256, (24, 24), np.uint8)
    blob = bytearray(encode_jpeg_progressive(img, restart_interval=1))
    # find the first RSTn in scan data and break its counter
    for i in range(2, len(blob) - 1):
        if blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7:
            blob[i + 1] = 0xD0 + ((blob[i + 1] - 0xD0 + 3) % 8)
            break
    else:
        pytest.fail("no restart marker found")
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(blob))


def test_12bit_progressive_gray_exact_on_constant_blocks():
    rng = np.random.default_rng(17)
    blocks = rng.integers(0, 4096, (5, 7))
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint16)
    got = decode_jpeg(encode_jpeg_progressive(img, precision=12))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img)
    assert int(img.max()) > 255  # the deep range actually flowed


def test_12bit_progressive_gray_random_error_bound():
    img = np.random.default_rng(23).integers(0, 4096, (24, 32)).astype(
        np.uint16
    )
    got = decode_jpeg(encode_jpeg_progressive(img, precision=12))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 1


def test_12bit_progressive_color_with_restarts():
    """12-bit + color + SA + restarts composed: within the color
    conversion rounding bound (the conversion itself is lossy)."""
    rng = np.random.default_rng(31)
    img = np.repeat(
        np.repeat(rng.integers(0, 4096, (3, 4, 3)), 8, axis=0), 8, axis=1
    ).astype(np.uint16)
    got = decode_jpeg(
        encode_jpeg_progressive(
            img, precision=12, script=sa_script(3), restart_interval=2
        )
    )
    assert got.dtype == np.uint16
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_12bit_under_sof0_still_raises():
    img = np.zeros((16, 16), np.uint16)
    blob = bytearray(encode_jpeg_progressive(img, precision=12))
    idx = blob.find(b"\xff\xc2")
    blob[idx + 1] = 0xC0  # relabel SOF2 -> SOF0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(blob))
