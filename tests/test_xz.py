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


def test_filtered_chains_decode_vs_liblzma():
    """r8: Delta and x86 BCJ non-last filters (singly and stacked)
    decode bit-exactly against liblzma-written members; the payload
    carries real 0xE8/0xE9 patterns so BCJ genuinely rewrites."""
    from neuroimaging_data_pipeline_spark.sources.xz import _fake_x86_tail

    rng = random.Random(17)
    for trial in range(24):
        data = _fake_x86_tail(trial) + b"text " * rng.randrange(0, 60) \
            + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 99)))
        pre = [
            [{"id": lzma.FILTER_DELTA, "dist": 1 + rng.randrange(16)}],
            [{"id": lzma.FILTER_X86}],
            [{"id": lzma.FILTER_DELTA, "dist": 1 + rng.randrange(4)},
             {"id": lzma.FILTER_X86}],
            [{"id": lzma.FILTER_X86},
             {"id": lzma.FILTER_DELTA, "dist": 1}],
        ][trial % 4]
        blob = lzma.compress(
            data, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64,
            filters=pre + [{"id": lzma.FILTER_LZMA2, "preset": 4,
                            "dict_size": 1 << 16}])
        assert parse_xz(blob)["content"] == data, trial


def test_delta_decode_inverts_encoder():
    from neuroimaging_data_pipeline_spark.sources.xz import delta_decode

    rng = random.Random(3)
    for dist in (1, 2, 3, 16, 255, 256):
        data = bytes(rng.randrange(256) for _ in range(500))
        enc = bytearray(data)
        for i in range(len(enc) - 1, dist - 1, -1):
            enc[i] = (enc[i] - data[i - dist]) & 0xFF
        assert delta_decode(bytes(enc), dist) == data
    with pytest.raises(ValueError, match="range"):
        delta_decode(b"x", 0)


def test_bcj_x86_plain_text_is_noop():
    # no 0xE8/0xE9 bytes -> the scan rewrites nothing
    from neuroimaging_data_pipeline_spark.sources.xz import bcj_x86_decode

    data = b"plain ascii text has no call opcodes " * 40
    assert bcj_x86_decode(data) == data
    assert bcj_x86_decode(b"abc") == b"abc"  # <= 4 bytes passthrough


def test_unsupported_branch_filters_still_gate():
    data = b"arm gate " * 30
    blob = lzma.compress(
        data, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC32,
        filters=[{"id": lzma.FILTER_ARM},
                 {"id": lzma.FILTER_LZMA2, "preset": 1,
                  "dict_size": 1 << 16}])
    with pytest.raises(NotImplementedError, match="LZMA2/delta/x86"):
        parse_xz(blob)
