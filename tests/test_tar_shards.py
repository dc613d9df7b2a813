"""WebDataset TAR shard codec (multimodal/tar.py).

The independent oracle here is the stdlib ``tarfile`` module: our
writer's bytes must parse with tarfile, and tarfile's bytes must parse
with our block-walker — round-trips in BOTH directions, so neither
side can merely echo the other's bugs.
"""

from __future__ import annotations

import io
import tarfile
import zlib

import pytest

from neuroimaging_data_pipeline_spark.multimodal.tar import (
    _sample_members,
    encode_shard,
    group_samples,
    parse_tar,
    tar_block_count,
    write_tar,
)

MEMBERS = [
    ("000001.txt", b"hello shard world"),
    ("000001.cls", b"\x07"),
    ("000002.txt", b"x" * 700),  # spans two data blocks
    ("000002.bin", bytes(range(256))),
]


def test_our_writer_reads_with_stdlib_tarfile():
    buf = write_tar(MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(buf), mode="r:") as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == MEMBERS


def test_stdlib_tarfile_bytes_read_with_our_parser():
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in MEMBERS:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    assert parse_tar(bio.getvalue()) == MEMBERS


def test_header_checksum_detects_corruption():
    buf = bytearray(write_tar(MEMBERS))
    buf[40] ^= 0x5A  # flip a byte inside the first header's name area
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(buf))


def test_sample_grouping_contiguity():
    grouped = group_samples(parse_tar(write_tar(MEMBERS)))
    assert [k for k, _ in grouped] == ["000001", "000002"]
    assert set(grouped[0][1]) == {"txt", "cls"}
    assert set(grouped[1][1]) == {"txt", "bin"}
    # a key reappearing after a different key is a malformed shard
    bad = [MEMBERS[0], MEMBERS[2], ("000001.bin", b"z")]
    with pytest.raises(ValueError, match="non-contiguous"):
        group_samples(parse_tar(write_tar(bad)))


def test_gzip_framing_and_block_count():
    raw, gz = encode_shard(4), encode_shard(5)  # even: plain, odd: gzipped
    assert raw[:2] != b"\x1f\x8b" and gz[:2] == b"\x1f\x8b"
    assert parse_tar(gz) == _sample_members(5)
    assert zlib.decompress(gz, wbits=47)[: len("000005")] .startswith(b"000005")
    # block arithmetic: hdr+data per member (all payloads < 512 here) + trailer
    assert tar_block_count(raw) == 2 + 2 + 2 + 2  # txt, cls, bin, trailer
    assert tar_block_count(encode_shard(0)) == 2 + 2 + 2  # id%3==0: no bin


def test_bmp_roundtrip_both_orders_and_padding():
    """BMP codec (multimodal/bmp.py): bottom-up and top-down layouts
    decode to the same logical pixels; odd widths exercise the 4-byte
    row padding; corrupt magic raises."""
    import pytest as _pt

    from neuroimaging_data_pipeline_spark.multimodal.bmp import (
        decode_bmp,
        encode_bmp,
    )

    px = [[(x * 9 % 256, y * 31 % 256, (x + y) % 256) for x in range(5)]
          for y in range(4)]
    up = encode_bmp(px, top_down=False)
    down = encode_bmp(px, top_down=True)
    assert up != down  # genuinely different byte layouts
    assert decode_bmp(up) == decode_bmp(down) == px
    # odd width: 3*3=9-byte rows pad to 12
    px2 = [[(1, 2, 3)] * 3 for _ in range(2)]
    buf = encode_bmp(px2)
    assert (len(buf) - 54) % 4 == 0
    assert decode_bmp(buf) == px2
    with _pt.raises(ValueError, match="BM magic"):
        decode_bmp(b"XX" + up[2:])
