"""Ogg container (sources/ogg.py): page grammar, lacing edge cases,
cross-page packet reassembly, flag/sequence consistency, and the
non-reflected CRC-32 flavor (pinned apart from zlib/Castagnoli and
against an independent bit-by-bit implementation)."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from neuroimaging_data_pipeline_spark.sources.ogg import (
    _MAX_SEGS,
    _lacing,
    ogg_crc,
    parse_ogg_stream,
    write_ogg_stream,
)
from neuroimaging_data_pipeline_spark.sources.snappy import crc32c


def _crc_bitwise(data: bytes) -> int:
    """Independent bit-by-bit CRC (poly 0x04C11DB7, init 0, no
    reflection, no xorout) to pin the table-driven one."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def test_ogg_crc_flavor():
    for data in (b"", b"a", b"123456789", bytes(range(256))):
        assert ogg_crc(data) == _crc_bitwise(data)
    # genuinely a different flavor from the other two CRC-32s here
    assert ogg_crc(b"123456789") not in (
        zlib.crc32(b"123456789"), crc32c(b"123456789")
    )


def test_lacing_values():
    assert _lacing(b"") == [0]
    assert _lacing(b"x" * 254) == [254]
    assert _lacing(b"x" * 255) == [255, 0]   # exact multiple: 0 term
    assert _lacing(b"x" * 256) == [255, 1]
    assert _lacing(b"x" * 510) == [255, 255, 0]


def test_single_page_round_trip_and_flags():
    pkts = [b"header", b"payload body", b""]
    blob = write_ogg_stream(pkts, serial=0xABCD1234)
    d = parse_ogg_stream(blob)
    assert d["packets"] == pkts
    assert d["n_pages"] == 1 and d["n_spanning"] == 0
    assert d["serial"] == 0xABCD1234
    # BOS and EOS both set on the single page
    assert blob[5] & 0x02 and blob[5] & 0x04


def test_cross_page_packet_reassembly():
    big = bytes(range(256)) * ((255 * (_MAX_SEGS + 5)) // 256)
    d = parse_ogg_stream(write_ogg_stream([b"hdr", big, b"tail"]))
    assert d["packets"] == [b"hdr", big, b"tail"]
    assert d["n_pages"] >= 2
    assert d["n_spanning"] >= 1


def test_exact_255_multiple_packet_round_trip():
    # packet of exactly 2*255 bytes: lacing [255,255,0]; the 0 must
    # terminate it on the SAME page, not leak a continuation
    p = b"z" * 510
    d = parse_ogg_stream(write_ogg_stream([p, b"after"]))
    assert d["packets"] == [p, b"after"]
    assert d["n_spanning"] == 0 or d["n_pages"] > 1


def test_fuzz_packet_shapes():
    rng = random.Random(20260815)
    for t in range(150):
        pkts = [
            rng.randbytes(rng.choice(
                [0, 1, 254, 255, 256, 510, 255 * 7,
                 rng.randrange(0, 255 * (_MAX_SEGS + 3))]
            ))
            for _ in range(rng.randrange(1, 6))
        ]
        got = parse_ogg_stream(write_ogg_stream(pkts))
        assert got["packets"] == pkts, t


def test_corruption_and_grammar_violations_loud():
    blob = bytearray(write_ogg_stream([b"hello world " * 30]))
    bad = bytearray(blob)
    bad[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_stream(bytes(bad))
    with pytest.raises(ValueError, match="capture"):
        parse_ogg_stream(b"NotO" + bytes(blob[4:]))
    # strip BOS from page 0: flag inconsistency must be loud
    bad = bytearray(blob)
    bad[5] &= ~0x02
    bad[22:26] = b"\x00\x00\x00\x00"
    page = bytes(bad)
    bad[22:26] = struct.pack("<I", ogg_crc(page))
    with pytest.raises(ValueError, match="BOS"):
        parse_ogg_stream(bytes(bad))
    # two streams concatenated: data after EOS is loud
    with pytest.raises(ValueError, match="after the EOS"):
        parse_ogg_stream(bytes(blob) + bytes(blob))


def test_sequence_gap_detected():
    two_pages = write_ogg_stream([b"x" * (255 * (_MAX_SEGS + 2))])
    # find the second page and bump its sequence number, re-seal CRC
    second = two_pages.index(b"OggS", 4)
    bad = bytearray(two_pages)
    (seq,) = struct.unpack_from("<I", bad, second + 18)
    struct.pack_into("<I", bad, second + 18, seq + 1)
    bad[second + 22 : second + 26] = b"\x00\x00\x00\x00"
    nsegs = bad[second + 26]
    body_len = sum(bad[second + 27 : second + 27 + nsegs])
    end = second + 27 + nsegs + body_len
    crc = ogg_crc(bytes(bad[second:end]))
    struct.pack_into("<I", bad, second + 22, crc)
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_stream(bytes(bad))
