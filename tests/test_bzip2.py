"""bzip2 decoder (sources/bzip2.py): stdlib libbzip2 and the bzip2
CLI as conformance writers across levels/textures, the unreflected
CRC-32 flavor, multi-block and multi-stream composition, and loud
failure on corruption."""

from __future__ import annotations

import bz2
import random
import shutil
import subprocess

import pytest

from neuroimaging_data_pipeline_spark.sources.bzip2 import (
    bz2_crc,
    parse_bzip2,
)


def _textures() -> dict[str, bytes]:
    rng = random.Random(1)
    return {
        "empty": b"",
        "one": b"a",
        "banana": b"banana" * 3,
        "text": b"hello world, hello bzip2 " * 200,
        "alphabet": bytes(range(256)) * 50,
        "incompressible": bytes(rng.randrange(256) for _ in range(30000)),
        "rle_runs": b"zzzz" * 5000 + b"tail",
        "jsonl": b"\n".join(b'{"text": "json line with words"}' for _ in range(400)),
    }


def test_bz2_crc_is_the_unreflected_flavor():
    # bzip2's CRC differs from zlib's: same polynomial, UNreflected
    from neuroimaging_data_pipeline_spark.sources.inflate import crc32

    assert bz2_crc(b"123456789") != crc32(b"123456789")
    # known value: bzip2 CRC of '123456789' is 0xFC891918
    assert bz2_crc(b"123456789") == 0xFC891918


@pytest.mark.parametrize("level", [1, 5, 9])
def test_stdlib_conformance(level):
    for name, data in _textures().items():
        d = parse_bzip2(bz2.compress(data, compresslevel=level))
        assert d["content"] == data, f"{name} @ {level}"
        assert d["level"] == level and d["crc_ok"]


def test_multi_block_stream():
    data = b"multi block line\n" * 20000  # > 100k at level 1
    d = parse_bzip2(bz2.compress(data, compresslevel=1))
    assert d["n_blocks"] >= 2
    assert d["content"] == data


def test_concatenated_streams():
    blob = bz2.compress(b"one", 1) + bz2.compress(b"two " * 50, 9)
    d = parse_bzip2(blob)
    assert d["n_streams"] == 2
    assert d["content"] == b"one" + b"two " * 50
    assert bz2.decompress(blob) == d["content"]  # stdlib agrees


@pytest.mark.skipif(shutil.which("bzip2") is None, reason="no bzip2 CLI")
def test_bzip2_cli_conformance(tmp_path):
    data = (b"cli corpus line with repetition\n" * 9000) + bytes(
        random.Random(2).randrange(256) for _ in range(50000)
    )
    src = tmp_path / "c.bin"
    for lvl in ("-1", "-5", "-9"):
        src.write_bytes(data)
        subprocess.run(["bzip2", "-z", "-f", lvl, str(src)], check=True)
        d = parse_bzip2((tmp_path / "c.bin.bz2").read_bytes())
        assert d["content"] == data, lvl


def test_fuzz_vs_stdlib():
    rng = random.Random(77)
    for trial in range(25):
        parts = [
            bytes([rng.randrange(97, 123)]) * rng.randrange(1, 30)
            + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 50)))
            for _ in range(rng.randrange(1, 60))
        ]
        data = b"".join(parts) * rng.randrange(1, 6)
        lvl = rng.choice([1, 5, 9])
        d = parse_bzip2(bz2.compress(data, compresslevel=lvl))
        assert d["content"] == data, trial


def test_corruption_fails_loudly_never_silent():
    data = b"corrupt me thoroughly " * 300
    blob = bytearray(bz2.compress(data, compresslevel=5))
    rng = random.Random(3)
    for _ in range(40):
        i = rng.randrange(4, len(blob))
        old = blob[i]
        blob[i] ^= 0xFF
        try:
            got = parse_bzip2(bytes(blob))["content"]
            assert got != data
        except (ValueError, IndexError):
            pass
        blob[i] = old
    with pytest.raises(ValueError, match="magic"):
        parse_bzip2(b"BZx1234")
    with pytest.raises(ValueError, match="level"):
        parse_bzip2(b"BZh0" + bytes(10))
    with pytest.raises(ValueError):
        parse_bzip2(bytes(bz2.compress(b"abc"))[:-3])  # truncated
