""".xz container + LZMA2 (sources/xz.py): CRC-64 check value, stdlib
liblzma as reference writer across checks/presets, multi-chunk LZMA2
(compressed and uncompressed chunks over one persistent window), and
loud failure on every container guard."""

from __future__ import annotations

import lzma
import random

import pytest

from neuroimaging_data_pipeline_spark.sources.xz import (
    crc64,
    lzma2_decode,
    parse_xz,
)


def test_crc64_xz_check_value():
    assert crc64(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64(b"") == 0


def test_all_four_integrity_checks():
    data = b"integrity checked body " * 40
    for check, name in [(lzma.CHECK_NONE, "none"),
                        (lzma.CHECK_CRC32, "crc32"),
                        (lzma.CHECK_CRC64, "crc64"),
                        (lzma.CHECK_SHA256, "sha256")]:
        blob = lzma.compress(data, format=lzma.FORMAT_XZ, check=check)
        d = parse_xz(blob)
        assert d["content"] == data and d["check"] == name
        assert d["end"] == len(blob)


def test_fuzz_vs_liblzma():
    rng = random.Random(20260815)
    for t in range(80):
        n = rng.randrange(0, 5000)
        data = (rng.randbytes(n) if t % 3 == 0
                else (f"line {t} of the dump\n" * (n // 16 + 1)).encode())
        blob = lzma.compress(
            data, format=lzma.FORMAT_XZ,
            check=[0, 1, 4, 10][t % 4], preset=[0, 1, 6, 9][t % 4],
        )
        assert parse_xz(blob)["content"] == data, (t, n)


def test_multi_chunk_lzma2_persistent_window():
    rng = random.Random(4)
    # > 2 MiB forces multiple LZMA2 chunks; incompressible data also
    # forces UNCOMPRESSED chunks mixed in — matches across chunk
    # boundaries must resolve against the shared window
    noisy = rng.randbytes(3_000_000)
    assert parse_xz(lzma.compress(noisy, format=lzma.FORMAT_XZ,
                                  preset=0))["content"] == noisy
    smooth = b"compressible pattern " * 200_000
    assert parse_xz(lzma.compress(smooth, format=lzma.FORMAT_XZ,
                                  preset=6))["content"] == smooth


def test_lzma2_grammar_guards():
    # first chunk must reset the dict: control 0x02 (no reset) first
    with pytest.raises(ValueError, match="reset the dict"):
        lzma2_decode(bytes([0x02, 0x00, 0x00, 0x41, 0x00]), 0)
    with pytest.raises(ValueError, match="reserved LZMA2 control"):
        lzma2_decode(bytes([0x03]), 0)
    with pytest.raises(ValueError, match="truncated before end"):
        lzma2_decode(bytes([0x01, 0x00, 0x00, 0x41]), 0)
    # a lone uncompressed chunk then end decodes fine
    out, end = lzma2_decode(bytes([0x01, 0x00, 0x01, 0x41, 0x42, 0x00]), 0)
    assert out == b"AB" and end == 6


def test_container_guards_fail_loudly():
    data = b"guard me " * 50
    blob = bytearray(lzma.compress(data, format=lzma.FORMAT_XZ,
                                   check=lzma.CHECK_CRC64))
    with pytest.raises(ValueError, match="magic"):
        parse_xz(b"\xfd7zXY\x00" + bytes(blob[6:]))
    bad = bytearray(blob)
    bad[8] ^= 0x01  # stream header CRC
    with pytest.raises(ValueError, match="stream header CRC"):
        parse_xz(bytes(bad))
    bad = bytearray(blob)
    bad[13] ^= 0x40  # block flags: sets a reserved bit, CRC catches 1st
    with pytest.raises(ValueError, match="CRC|reserved"):
        parse_xz(bytes(bad))
    bad = bytearray(blob)
    bad[-3] ^= 0x01  # footer stream-flag copy
    with pytest.raises(ValueError, match="footer"):
        parse_xz(bytes(bad))
    # flip one payload byte: LZMA2 framing or the CRC64 check catches
    bad = bytearray(blob)
    bad[30] ^= 0x10
    with pytest.raises(ValueError):
        parse_xz(bytes(bad))
    with pytest.raises(ValueError):
        parse_xz(bytes(blob[:-8]))  # truncated footer
