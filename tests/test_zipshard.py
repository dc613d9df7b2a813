"""ZIP shard source (sources/zipshard.py): central-directory walk,
stored+deflate, CRC and cross-check guards, stdlib interop both
directions."""

from __future__ import annotations

import io
import zipfile

import pytest

from neuroimaging_data_pipeline_spark.sources.zipshard import (
    read_zip,
    write_zip,
)

MEMBERS = [
    ("0.txt", b"hello stored", 0),
    ("1.txt", b"deflate me " * 50, 8),
    ("2.txt", b"", 0),
]


def test_roundtrip_both_methods_and_empty_member():
    assert read_zip(write_zip(MEMBERS)) == MEMBERS


def test_stdlib_reads_our_archives():
    zf = zipfile.ZipFile(io.BytesIO(write_zip(MEMBERS)))
    assert zf.namelist() == ["0.txt", "1.txt", "2.txt"]
    assert zf.read("1.txt") == b"deflate me " * 50
    assert zf.testzip() is None  # stdlib CRC pass


def test_we_read_stdlib_archives():
    sink = io.BytesIO()
    with zipfile.ZipFile(sink, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", "alpha")
        z.writestr("b.txt", "beta" * 100)
    got = {n: d for n, d, _ in read_zip(sink.getvalue())}
    assert got == {"a.txt": b"alpha", "b.txt": b"beta" * 100}


def test_crc_corruption_raises():
    buf = bytearray(write_zip(MEMBERS))
    at = buf.find(b"hello stored")
    buf[at] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_zip(bytes(buf))


def test_bad_offset_and_missing_eocd_raise():
    buf = write_zip(MEMBERS)
    with pytest.raises(ValueError, match="end-of-central"):
        read_zip(buf[: buf.rfind(b"PK\x05\x06")])
    broken = bytearray(buf)
    cd_at = broken.find(b"PK\x01\x02")
    # corrupt the first central entry's local-header offset field
    off_at = cd_at + 4 + 38
    broken[off_at] = broken[off_at] + 1 & 0xFF
    with pytest.raises(ValueError, match="local-header offset|mismatch"):
        read_zip(bytes(broken))
