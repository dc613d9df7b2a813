"""Property fuzz for the r12 batched bit-I/O rewrites: every fast
path (batched reads, zero-scan Exp-Golomb, accumulator writers,
find()-driven emulation prevention, int-keyed VLC walks) is compared
against a transcribed per-bit reference model on random inputs.

The vectorized codec pass is only safe because outputs are
bit-identical — these pins make that property survive future edits
without needing the full oracle battery to catch a drift.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neuroimaging_data_pipeline_spark.multimodal.h264 import (
    _BitR,
    _BitW,
    _ep_insert,
    _ep_remove,
)


# --- reference models (the pre-r12 per-bit forms, transcribed) -------------


def _ref_read_bits(data: bytes, reads: list[int]) -> list[int] | None:
    """Per-bit reader; None = ran dry (the fast reader must raise)."""
    out = []
    pos = 0
    for n in reads:
        v = 0
        for _ in range(n):
            if (pos >> 3) >= len(data):
                return None
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        out.append(v)
    return out


def _ref_write_bits(writes: list[tuple[int, int]]) -> bytes:
    bits: list[int] = []
    for v, n in writes:
        for k in range(n - 1, -1, -1):
            bits.append((v >> k) & 1)
    bits += [0] * (-len(bits) % 8)
    return bytes(
        int("".join(map(str, bits[i : i + 8])), 2)
        for i in range(0, len(bits), 8)
    )


def _ref_ep_insert(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ref_ep_remove(nal: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3 and (i + 1 >= len(nal) or nal[i + 1] <= 3):
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# --- properties ------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=64),
    widths=st.lists(st.integers(0, 33), min_size=0, max_size=40),
)
def test_bitr_matches_per_bit_reference(data, widths):
    want = _ref_read_bits(data, widths)
    r = _BitR(data)
    if want is None:
        with pytest.raises(ValueError):
            for n in widths:
                r.u(n)
        return
    got = [r.u(n) for n in widths]
    assert got == want
    assert r.pos == sum(widths)


@settings(max_examples=300, deadline=None)
@given(
    writes=st.lists(
        st.tuples(st.integers(0, (1 << 33) - 1), st.integers(1, 33)),
        min_size=0, max_size=40,
    )
)
def test_bitw_matches_per_bit_reference(writes):
    w = _BitW()
    for v, n in writes:
        w.u(v, n)
    w.align_zero()
    assert w.bytes_() == _ref_write_bits(writes)


@settings(max_examples=300, deadline=None)
@given(vals=st.lists(st.integers(0, 100_000), min_size=1, max_size=30))
def test_expgolomb_roundtrip(vals):
    w = _BitW()
    for v in vals:
        w.ue(v)
    w.trailing()
    r = _BitR(w.bytes_())
    assert [r.ue() for _ in vals] == vals
    # signed twin
    w2 = _BitW()
    signed = [v - 50_000 for v in vals]
    for v in signed:
        w2.se(v)
    w2.trailing()
    r2 = _BitR(w2.bytes_())
    assert [r2.se() for _ in signed] == signed


@settings(max_examples=400, deadline=None)
@given(data=st.binary(min_size=0, max_size=96))
def test_ep_insert_matches_reference_and_roundtrips(data):
    ins = _ep_insert(data)
    assert ins == _ref_ep_insert(data)
    assert _ep_remove(ins) == data


@settings(max_examples=400, deadline=None)
@given(data=st.binary(min_size=0, max_size=96))
def test_ep_remove_matches_reference(data):
    assert _ep_remove(data) == _ref_ep_remove(data)


@settings(max_examples=200, deadline=None)
@given(data=st.binary(min_size=0, max_size=64), seed=st.integers(0, 2**31))
def test_ep_zero_run_stress(data, seed):
    """Zero-run-heavy payloads (the emulation-prevention hot case)."""
    rng = np.random.default_rng(seed)
    buf = bytearray(data)
    for _ in range(min(8, len(buf))):
        i = int(rng.integers(0, max(1, len(buf))))
        buf[i : i + 1] = b"\x00" * int(rng.integers(1, 4))
    payload = bytes(buf)
    ins = _ep_insert(payload)
    assert ins == _ref_ep_insert(payload)
    assert _ep_remove(ins) == payload


def test_mp3_bitio_matches_reference():
    """MP3's _BW/_BR pair: random field sequences round-trip and the
    writer's bytes match the bit-list reference; extend() preserves
    exact bit concatenation."""
    from neuroimaging_data_pipeline_spark.multimodal.mp3l3 import _BR, _BW

    rng = np.random.default_rng(7)
    for _ in range(200):
        writes = [
            (int(rng.integers(0, 1 << int(n))), int(n))
            for n in rng.integers(1, 25, size=int(rng.integers(1, 30)))
        ]
        w = _BW()
        for v, n in writes:
            w.u(v, n)
        assert w.nbits() == sum(n for _, n in writes)
        assert w.bytes_() == _ref_write_bits(writes)
        r = _BR(w.bytes_())
        assert [r.u(n) for _, n in writes] == [
            v & ((1 << n) - 1) for v, n in writes
        ]
        # split at a random point and re-join via extend()
        cut = int(rng.integers(0, len(writes) + 1))
        wa, wb = _BW(), _BW()
        for v, n in writes[:cut]:
            wa.u(v, n)
        for v, n in writes[cut:]:
            wb.u(v, n)
        wa.extend(wb)
        assert wa.bytes_() == w.bytes_() and wa.nbits() == w.nbits()


def test_mp3_walk_code_matches_string_walk():
    """_walk_code on the shipped tables equals the r11 string walk."""
    from neuroimaging_data_pipeline_spark.multimodal.mp3l3 import (
        _BW,
        _BR,
        _DEC_BIG,
        _HUFF_BIG,
        _walk_code,
    )

    rng = np.random.default_rng(11)
    for t, (nx, lens, cods) in _HUFF_BIG.items():
        dmap = _DEC_BIG[t][1]
        idxs = rng.integers(0, len(lens), size=40)
        w = _BW()
        for i in idxs:
            w.u(int(cods[int(i)]), int(lens[int(i)]))
        w.u(0, 7)  # slack so the walk never runs dry mid-code
        r = _BR(w.bytes_())
        for i in idxs:
            assert _walk_code(r, dmap, 19, "t") == int(i)
