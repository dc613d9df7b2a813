"""Animated-GIF codec (multimodal/gif.py): LZW round-trips including
variable-width growth, 4096-entry dictionary resets and the KwKwK
case; container round-trips for multi-frame GIFs with delays."""

from __future__ import annotations

import random

import numpy as np

from neuroimaging_data_pipeline_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
    encode_gif_fixture,
    gif_frame_index,
    gif_palette,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_random_streams():
    rng = random.Random(7)
    for _ in range(25):
        nbits = rng.choice([2, 3, 4, 8])
        n = rng.randint(0, 30000)  # large enough to force dict resets
        data = bytes(rng.randrange(1 << nbits) for _ in range(n))
        assert lzw_decode(lzw_encode(data, max(2, nbits)), max(2, nbits)) == data


def test_lzw_kwkwk_case():
    """'ababab...' streams hit the code-equals-next-entry (KwKwK)
    branch immediately."""
    data = b"\x00\x01" * 500 + b"\x00\x00\x00" * 300
    assert lzw_decode(lzw_encode(data, 2), 2) == data


def test_lzw_empty_and_single():
    assert lzw_decode(lzw_encode(b"", 2), 2) == b""
    assert lzw_decode(lzw_encode(b"\x03", 2), 2) == b"\x03"


def test_gif_multiframe_roundtrip():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 8, (9, 13)).astype(np.uint8) for _ in range(4)]
    g = decode_gif(encode_gif(frames, gif_palette(), [5, 10, 15, 20]))
    assert (g["width"], g["height"]) == (13, 9)
    assert g["palette"] == gif_palette()
    assert [d for d, _ in g["frames"]] == [5, 10, 15, 20]
    for a, (_, b) in zip(frames, g["frames"]):
        assert (a == b).all()


def test_gif_fixture_formulas():
    for d in (0, 1, 2, 42, 499):
        g = decode_gif(encode_gif_fixture(d))
        assert len(g["frames"]) == 2 + d % 3
        for i, (delay, px) in enumerate(g["frames"]):
            assert delay == 10 * (i + 1)
            assert px.shape == (12, 16)
            assert (px == gif_frame_index(d, i)).all()


def test_gif_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)


def test_gif_local_color_table_resolution():
    """A frame carrying its own LOCAL color table must be mapped
    through it, not the global palette — the indices decode the same,
    but the colors differ (GIF89a section 21)."""
    import numpy as np

    frames = [
        np.full((4, 4), 2, dtype=np.uint8),
        np.full((4, 4), 2, dtype=np.uint8),
    ]
    glob = gif_palette()
    # local table: reversed global -> index 2 maps to a different color
    local = list(reversed(glob))
    g = decode_gif(
        encode_gif(frames, glob, [10, 10], local_palettes=[None, local])
    )
    assert g["frame_palettes"][0] == glob
    assert g["frame_palettes"][1] == local
    assert g["frame_palettes"][0][2] != g["frame_palettes"][1][2]
    for _, px in g["frames"]:
        assert (px == 2).all()  # indices identical either way


def test_gif_interlaced_roundtrip():
    """Interlaced frames transmit rows in the 4-pass GIF89a schedule;
    the decoder de-interlaces back to display order — round-trip
    exact across odd/even/small heights."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        _interlace_rows,
    )

    rng = np.random.default_rng(21)
    for h in (1, 2, 3, 5, 8, 12, 17):
        order = _interlace_rows(h)
        assert sorted(order) == list(range(h))  # permutation
        frames = [rng.integers(0, 8, (h, 6)).astype(np.uint8)
                  for _ in range(2)]
        g = decode_gif(
            encode_gif(frames, gif_palette(), [10, 10], interlaced=True)
        )
        for a, (_, b) in zip(frames, g["frames"]):
            assert (a == b).all(), h
    # a non-interlaced stream of the same frames decodes identically
    frames = [rng.integers(0, 8, (12, 6)).astype(np.uint8)]
    plain = decode_gif(encode_gif(frames, gif_palette()))
    inter = decode_gif(encode_gif(frames, gif_palette(), interlaced=True))
    assert (plain["frames"][0][1] == inter["frames"][0][1]).all()


def test_lzw_malformed_streams_raise():
    import pytest

    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        lzw_decode,
        lzw_encode,
    )

    good = lzw_encode(b"\x00\x01\x02" * 50, 2)
    with pytest.raises(ValueError):
        lzw_decode(good[: len(good) // 2], 2)  # truncated mid-stream
    # a code far beyond the dictionary is rejected, not mis-decoded
    with pytest.raises(ValueError):
        # craft: width-3 bits, first code = 7 (beyond clear+1+0 entries)
        lzw_decode(bytes([0b00111111]), 2)
