"""G.711 mu-law codec (multimodal/mulaw.py): numpy encode vs the
scalar standard over the FULL 14-bit input range, decoded values as
codebook fixed points, container roundtrip, and format guards."""

from __future__ import annotations

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.mulaw import (
    mulaw_decode,
    mulaw_encode,
    read_wav_mulaw,
    write_wav_mulaw,
)


def _scalar_encode(x: int) -> int:
    sign = 0x80 if x < 0 else 0
    m = min(abs(x) + 33, 0x1FFF)
    exp = m.bit_length() - 6
    mant = (m >> (exp + 1)) & 0x0F
    return (sign | (exp << 4) | mant) ^ 0xFF


def test_vectorized_encode_matches_standard_over_full_range():
    xs = np.arange(-8159, 8160, dtype=np.int64)
    got = mulaw_encode(xs)
    want = np.array([_scalar_encode(int(x)) for x in xs], np.uint8)
    assert (got == want).all()


def test_decoded_values_are_codebook_fixed_points():
    xs = np.arange(-8159, 8160, dtype=np.int64)
    d = mulaw_decode(mulaw_encode(xs))
    assert (mulaw_decode(mulaw_encode(d)) == d).all()
    assert len(np.unique(d)) == 255  # two codes decode to 0
    assert d.max() == 8031 and d.min() == -8031
    # companding error bound: half the largest segment step (+bias slop)
    assert int(np.abs(d - xs).max()) <= 128


def test_clipping_beyond_14bit():
    d = mulaw_decode(mulaw_encode(np.array([30000, -30000])))
    assert list(d) == [8031, -8031]


def test_container_roundtrip_and_oddbyte_padding():
    x = np.array([0, 1, -1, 8159, -8159, 500, -42], np.int64)  # 7 bytes
    buf = write_wav_mulaw(x, sample_rate=8000)
    assert len(buf) % 2 == 0  # RIFF chunks pad to even
    d, rate = read_wav_mulaw(buf)
    assert rate == 8000
    assert (d == mulaw_decode(mulaw_encode(x))).all()


def test_format_guards():
    with pytest.raises(ValueError, match="RIFF"):
        read_wav_mulaw(b"nope")
    import struct

    # PCM (tag 1) must be rejected toward the PCM path
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="not mu-law"):
        read_wav_mulaw(buf)
