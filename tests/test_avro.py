"""Avro Object Container codec (sources/avro.py): round trips over
both codecs, multi-block framing, and corruption detection."""

from __future__ import annotations

import pytest

from neuroimaging_data_pipeline_spark.sources.avro import (
    _fixture_records,
    read_avro,
    write_avro,
)

RECS = [(1, "alpha", 2.5), (2, "beta", -7.0), (300, "alpha", 1e9), (-4, "", 0.0)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_both_codecs(codec):
    assert read_avro(write_avro(RECS, codec=codec)) == RECS


def test_multiblock_framing():
    recs = _fixture_records(12)  # 8 records, block_size 4 -> 2 blocks
    buf = write_avro(recs, block_size=3)  # 3 blocks (3+3+2)
    assert read_avro(buf) == recs
    # negative longs zigzag correctly
    neg = [(-(10**12), "n", -1.5)]
    assert read_avro(write_avro(neg)) == neg


def test_corruption_raises():
    buf = bytearray(write_avro(RECS))
    buf[-3] ^= 0x55  # inside the final sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_avro(bytes(buf))
    with pytest.raises(ValueError, match="magic"):
        read_avro(b"NOPE" + bytes(buf[4:]))


def test_deflate_actually_compresses():
    recs = [(i, "same-tag-repeated" * 4, 1.0) for i in range(50)]
    a = write_avro(recs, codec="null", block_size=50)
    b = write_avro(recs, codec="deflate", block_size=50)
    assert len(b) < len(a) * 0.5
    assert read_avro(a) == read_avro(b) == recs
