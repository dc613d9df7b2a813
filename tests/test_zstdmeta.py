"""zstd frame walker (sources/zstdmeta.py): XXH64 spec check values,
hand-built frame bytes, header-variant round-trips, corruption and
reserved-field failures, and the compressed-block capability gate."""

from __future__ import annotations

import pytest

from neuroimaging_data_pipeline_spark.sources.zstdmeta import (
    _try_import_zstd,
    parse_zstd,
    write_skippable_frame,
    write_zstd_frame,
    xxh64,
)


def test_xxh64_published_check_values():
    # xxHash repo's documented values, seed 0
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # >=32-byte path (stripe accumulators + merge rounds)
    assert xxh64(b"a" * 32) != xxh64(b"a" * 33)
    # seed changes the hash
    assert xxh64(b"abc", seed=1) != xxh64(b"abc")


def test_hand_built_minimal_frame_bytes():
    # magic | descriptor(FCS flag 0, single-segment, checksum off) |
    # FCS 1 byte (2) | block header (last, raw, size 2) | 'hi'
    blob = bytes(
        [0x28, 0xB5, 0x2F, 0xFD,  # magic, little-endian
         0b00100000,              # SS=1, FCS flag 0 -> 1-byte size
         2,                       # content size
         0x11, 0x00, 0x00]        # (2<<3)|(0<<1)|1 = 0x11
    ) + b"hi"
    d = parse_zstd(blob)
    (f,) = d["frames"]
    assert f["content"] == b"hi"
    assert f["single_segment"] and f["size_known"]
    assert f["content_size"] == 2 and f["n_blocks"] == 1
    assert f["window_log"] is None and not f["has_checksum"]


def test_hand_built_rle_block_and_checksum():
    # non-SS frame: window descriptor, no FCS, one RLE block of 5 '=',
    # checksum = low 32 bits of xxh64
    ck = (xxh64(b"=====") & 0xFFFFFFFF).to_bytes(4, "little")
    blob = bytes(
        [0x28, 0xB5, 0x2F, 0xFD,
         0b00000100,              # checksum on, FCS flag 0, no SS
         0x00,                    # window descriptor: exponent 0
         0x2B, 0x00, 0x00,        # (5<<3)|(1<<1)|1 = 0x2B
         0x3D]                    # the RLE byte '='
    ) + ck
    (f,) = parse_zstd(blob)["frames"]
    assert f["content"] == b"====="
    assert f["n_rle"] == 1 and not f["size_known"]
    assert f["window_log"] == 10
    assert f["checksum_ok"] is True


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 5, 6, 11, 12, 15, 30, 60])
def test_header_variant_round_trip(i):
    body = (f"doc {i} " * (i + 1)).encode()
    blob = b""
    if i % 6 == 0:
        blob += write_skippable_frame(b"metadata!", nibble=i % 16)
    run = (16 + i % 7) if i % 3 == 0 else 0
    blob += write_zstd_frame(
        body, rle_run=run, single_segment=bool(i % 2),
        fcs_present=(i % 4 != 0), dict_id=(i % 200) + 1 if i % 5 == 0 else 0,
        checksum=(i % 4 != 3),
    )
    d = parse_zstd(blob)
    (f,) = d["frames"]
    assert f["content"] == body + b"=" * run
    assert d["n_skippable"] == (1 if i % 6 == 0 else 0)
    assert f["single_segment"] == bool(i % 2)
    assert f["size_known"] == (bool(i % 2) or i % 4 != 0)
    if f["size_known"]:
        assert f["content_size"] == len(body) + run
    if i % 4 != 3:
        assert f["checksum_ok"] is True


def test_fcs_flag1_bias_on_256_byte_single_segment():
    # 256..65791 bytes in single-segment mode use the 2-byte field
    # with the spec's value-256 bias
    blob = write_zstd_frame(b"x" * 300, single_segment=True, checksum=False)
    # descriptor: FCS flag 1 (bit 6), SS bit set
    assert blob[4] == (1 << 6) | (1 << 5)
    assert int.from_bytes(blob[5:7], "little") == 300 - 256
    (f,) = parse_zstd(blob)["frames"]
    assert f["content_size"] == 300


def test_checksum_corruption_detected():
    blob = bytearray(write_zstd_frame(b"hello world" * 40, checksum=True))
    blob[20] ^= 0x40
    (f,) = parse_zstd(bytes(blob))["frames"]
    assert f["checksum_ok"] is False


def test_reserved_bits_and_types_fail_loudly():
    blob = bytearray(write_zstd_frame(b"abc", checksum=False))
    bad = bytearray(blob)
    bad[4] |= 0x08  # reserved descriptor bit
    with pytest.raises(ValueError, match="reserved descriptor"):
        parse_zstd(bytes(bad))
    # reserved block type 3: frame = magic+desc+wd+FCS4 then header
    head = blob[:10]
    bh = ((3 << 3) | (3 << 1) | 1).to_bytes(3, "little")
    with pytest.raises(ValueError, match="reserved block type"):
        parse_zstd(bytes(head) + bh + b"xyz")
    with pytest.raises(ValueError, match="magic"):
        parse_zstd(b"\x00\x00\x00\x00")


def test_content_size_mismatch_detected():
    blob = bytearray(write_zstd_frame(b"abcd", checksum=False))
    # FCS is the 4 bytes after magic+descriptor+window descriptor
    assert int.from_bytes(blob[6:10], "little") == 4
    blob[6] = 5  # lie about the size
    with pytest.raises(ValueError, match="Frame_Content_Size"):
        parse_zstd(bytes(blob))


def test_garbage_compressed_block_fails_loudly():
    # since r8 compressed blocks DECODE (zstdblock.py) — a block whose
    # type-2 body is opaque garbage must raise, not gate to None
    head = bytes([0x28, 0xB5, 0x2F, 0xFD, 0b00000000, 0x00])
    bh = ((3 << 3) | (2 << 1) | 1).to_bytes(3, "little")
    with pytest.raises(ValueError):
        parse_zstd(head + bh + b"XYZ")


def test_compressed_blocks_decode_from_scratch():
    # pyarrow's bundled libzstd is a real writer present in this
    # environment: its compressed blocks must decode bit-exactly
    pa = pytest.importorskip("pyarrow")
    data = b"spark first, decode from scratch " * 64
    blob = bytes(pa.Codec("zstd", compression_level=9).compress(data))
    (f,) = parse_zstd(blob)["frames"]
    assert f["n_compressed"] >= 1
    assert f["content"] == data


def test_real_codec_cross_check_if_available():
    # when a zstd codec module exists, OUR frames must decompress
    # through it byte-for-byte (writer interop, the s22-zipfile
    # stance); skipped in environments without one
    dec = _try_import_zstd()
    if dec is None:
        pytest.skip("no zstd codec module in this environment")
    body = b"interop" * 50
    blob = write_zstd_frame(body, rle_run=9, checksum=True)
    assert dec(blob) == body + b"=" * 9
