"""LZMA decoder (sources/lzma_alone.py): stdlib liblzma is the
reference writer — bit-exact reproduction across presets, custom
lc/lp/pb, known-size headers, long-match/rep-cache textures; loud
failure on header and stream corruption."""

from __future__ import annotations

import lzma
import random

import pytest

from neuroimaging_data_pipeline_spark.sources.lzma_alone import (
    lzma_decode_raw,
    parse_lzma_alone,
)


def test_stdlib_alone_members_decode_bit_exactly():
    for data in (b"", b"a", b"hello world " * 100, bytes(range(256)) * 30):
        d = parse_lzma_alone(lzma.compress(data, format=lzma.FORMAT_ALONE))
        assert d["content"] == data
        assert (d["lc"], d["lp"], d["pb"]) == (3, 0, 2)  # preset default
        assert not d["size_known"]  # liblzma ALONE writes unknown size


def test_custom_lclppb_filters():
    data = b"custom literal contexts " * 50
    for lc, lp, pb in [(0, 2, 1), (1, 1, 0), (4, 0, 2), (0, 0, 0)]:
        blob = lzma.compress(
            data, format=lzma.FORMAT_ALONE,
            filters=[{"id": lzma.FILTER_LZMA1, "preset": 6,
                      "lc": lc, "lp": lp, "pb": pb}],
        )
        d = parse_lzma_alone(blob)
        assert d["content"] == data
        assert (d["lc"], d["lp"], d["pb"]) == (lc, lp, pb)


def test_known_size_header_path():
    # hand-build an ALONE header with the TRUE size over a raw stream
    data = b"known size body " * 40
    raw = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA1, "preset": 6}],
    )
    props = (2 * 5 + 0) * 9 + 3  # lc=3 lp=0 pb=2
    hdr = bytes([props]) + (1 << 23).to_bytes(4, "little") + len(
        data
    ).to_bytes(8, "little")
    d = parse_lzma_alone(hdr + raw)
    assert d["content"] == data and d["size_known"]


def test_rep_distance_cache_and_long_matches():
    # alternating near-periodic text cycles all four rep slots
    unit = b"abcabcabdabcabe"
    data = unit * 400 + b"tail" + unit * 100
    d = parse_lzma_alone(
        lzma.compress(data, format=lzma.FORMAT_ALONE,
                      filters=[{"id": lzma.FILTER_LZMA1, "preset": 9}])
    )
    assert d["content"] == data


def test_fuzz_vs_liblzma_reference_writer():
    rng = random.Random(20260815)
    for t in range(150):
        n = rng.randrange(0, 5000)
        kind = t % 4
        if kind == 0:
            data = rng.randbytes(n)
        elif kind == 1:
            data = bytes(rng.choice(b"abcdef ") for _ in range(n))
        elif kind == 2:
            data = (b"pattern!" * 700)[:n]
        else:
            data = (f"text {t} ").encode() * (n // 8 + 1)
        preset = [0, 1, 6, 9 | lzma.PRESET_EXTREME][t % 4]
        blob = lzma.compress(
            data, format=lzma.FORMAT_ALONE,
            filters=[{"id": lzma.FILTER_LZMA1, "preset": preset}],
        )
        assert parse_lzma_alone(blob)["content"] == data, (t, n, preset)


def test_corruption_fails_loudly():
    blob = bytearray(
        lzma.compress(b"corrupt me " * 80, format=lzma.FORMAT_ALONE)
    )
    with pytest.raises(ValueError, match="props"):
        parse_lzma_alone(bytes([0xFF]) + bytes(blob[1:]))
    with pytest.raises(ValueError, match="zero byte"):
        # the first stream byte after the 13-byte header must be 0
        parse_lzma_alone(bytes(blob[:13]) + b"\x01" + bytes(blob[14:]))
    with pytest.raises(ValueError):
        parse_lzma_alone(bytes(blob[:-6]))  # truncation
    bad = bytearray(blob)
    bad[20] ^= 0x40  # flip a range-coded byte: decodes garbage ->
    # either a window/distance error or (rarely) an EOS inconsistency
    with pytest.raises(ValueError):
        parse_lzma_alone(bytes(bad))
