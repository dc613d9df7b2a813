"""LZ4 codec (sources/lz4frame.py): XXH32 spec check values,
hand-decoded block sequences, end-of-block rules, frame grammar with
all three checksum sites, corruption failures, and a reference-
implementation interop pin that activates when `lz4` is installed."""

from __future__ import annotations

import random
import shutil

import pytest

from neuroimaging_data_pipeline_spark.sources.lz4frame import (
    lz4_compress_block,
    lz4_decompress_block,
    parse_lz4_frame,
    write_lz4_frame,
    xxh32,
)


def test_xxh32_published_check_values():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"abc", seed=1) != xxh32(b"abc")
    # >=16-byte stripe path
    assert xxh32(b"0123456789abcdef" * 3) == xxh32(b"0123456789abcdef" * 3)


def test_hand_built_block_with_overlap_copy():
    # token 0x14: 1 literal, match len 4+4=8; offset 1 -> run replication
    blob = bytes([0x14]) + b"A" + bytes([0x01, 0x00]) + bytes([0x00]) + b""
    # trailing token 0x00: zero literals (end sequence)
    assert lz4_decompress_block(blob) == b"A" * 9


def test_hand_built_block_length_extension():
    # literal length 15 + ext 255 + 5 = 275 'B's, end sequence form
    lits = b"B" * 275
    blob = bytes([0xF0, 255, 5]) + lits
    assert lz4_decompress_block(blob) == lits


def test_block_end_rules_on_compressor_output():
    # spec: final sequence is literals-only; last 5 bytes literals;
    # matches never start in the final 12 bytes
    data = (b"roundtrip " * 50) + b"tail!"
    comp = lz4_compress_block(data)
    assert lz4_decompress_block(comp) == data
    # the stream must END with >= 5 literal bytes, so the last 5 input
    # bytes appear verbatim at the stream tail
    assert comp.endswith(data[-5:])


def test_block_decoder_rejects_malformed():
    with pytest.raises(ValueError, match="offset"):
        lz4_decompress_block(bytes([0x04, 0x05, 0x00, 0x00]))  # offset 5 > out
    with pytest.raises(ValueError, match="literal run"):
        lz4_decompress_block(bytes([0x50]) + b"ab")  # 5 literals, 2 present
    with pytest.raises(ValueError, match="truncated"):
        lz4_decompress_block(bytes([0x14]) + b"A" + bytes([0x01]))


def test_incompressible_block_is_stored_in_frame():
    rng = random.Random(4)
    noise = rng.randbytes(4000)
    d = parse_lz4_frame(write_lz4_frame(noise))
    assert d["content"] == noise
    assert d["n_stored"] == d["n_blocks"] == 1  # compression didn't win


def test_frame_variants_round_trip():
    for i in range(30):
        body = (f"doc {i} body " * (i + 1)).encode()
        blob = write_lz4_frame(
            body, block_checksum=(i % 2 == 0), content_size=(i % 5 != 0),
            force_stored=(i % 7 == 0),
        )
        d = parse_lz4_frame(blob)
        assert d["content"] == body
        assert d["size_known"] == (i % 5 != 0)
        assert d["has_block_checksum"] == (i % 2 == 0)
        assert d["checksum_ok"] is True
        if i % 7 == 0:
            assert d["n_stored"] == d["n_blocks"]


def test_multi_block_frame_and_block_max_codes():
    big = ("lorem ipsum dolor sit amet " * 9000).encode()
    for code, bmax in [(4, 1 << 16), (5, 1 << 18)]:
        d = parse_lz4_frame(write_lz4_frame(big, block_max_code=code))
        assert d["content"] == big
        assert d["n_blocks"] == (len(big) + bmax - 1) // bmax
        assert d["block_max"] == bmax


def test_every_checksum_site_fails_loudly():
    body = b"checksummed content " * 40
    blob = bytearray(write_lz4_frame(body, block_checksum=True))
    # header checksum byte (position 4+2+8 = after FLG/BD/content size)
    bad = bytearray(blob)
    bad[14] ^= 0xFF
    with pytest.raises(ValueError, match="header checksum"):
        parse_lz4_frame(bytes(bad))
    # flip a byte inside the first block body
    bad = bytearray(blob)
    bad[25] ^= 0x10
    with pytest.raises(ValueError, match="checksum mismatch|offset|literal"):
        parse_lz4_frame(bytes(bad))
    # content checksum (last 4 bytes) — corrupt with block sums intact
    blob2 = bytearray(write_lz4_frame(body, block_checksum=False))
    blob2[-1] ^= 0x01
    with pytest.raises(ValueError, match="content checksum"):
        parse_lz4_frame(bytes(blob2))


def test_reserved_fields_rejected():
    blob = bytearray(write_lz4_frame(b"abc"))
    bad = bytearray(blob)
    bad[4] |= 0x02  # reserved FLG bit
    with pytest.raises(ValueError, match="reserved FLG"):
        parse_lz4_frame(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        parse_lz4_frame(b"\x00" * 16)


def test_fuzz_block_and_frame_round_trip():
    rng = random.Random(20260815)
    for t in range(250):
        n = rng.randrange(0, 4000)
        if t % 3 == 0:
            data = rng.randbytes(n)  # incompressible
        elif t % 3 == 1:
            data = bytes(rng.choice(b"abc") for _ in range(n))
        else:
            unit = rng.randbytes(rng.randrange(1, 9))
            data = (unit * (n // max(1, len(unit)) + 1))[:n]
        assert lz4_decompress_block(lz4_compress_block(data)) == data, t
        assert parse_lz4_frame(write_lz4_frame(data))["content"] == data, t


def test_reference_lz4_interop_if_available():
    # when the real lz4 package exists, our frames must decompress
    # through it and theirs through us (both directions)
    try:
        import lz4.frame as ref
    except ImportError:
        pytest.skip("no lz4 package in this environment")
    body = b"interop body " * 300
    assert ref.decompress(write_lz4_frame(body)) == body
    assert parse_lz4_frame(ref.compress(body))["content"] == body


@pytest.mark.skipif(shutil.which("lz4") is None, reason="no lz4 CLI")
def test_lz4_cli_conformance_both_directions(tmp_path):
    """r8 (VERDICT r7 #8): the real lz4 CLI as conformance peer —
    its frames (levels, small blocks, block checksums, LINKED
    blocks) decode through us bit-exactly, and our frames decode
    through it."""
    import random
    import subprocess

    rng = random.Random(9)
    parts = [
        bytes([rng.randrange(97, 123)]) * rng.randrange(5, 50)
        + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        for _ in range(150)
    ]
    data = b"".join(parts) * 10  # > 64 KiB: forces multi-block at -B4
    src = tmp_path / "c.bin"
    src.write_bytes(data)
    for args in (["-1"], ["-9"], ["-1", "-B4"], ["-9", "-B4", "-BX"],
                 ["-1", "-B4", "-BD"], ["-9", "-B5", "-BD", "-BX"]):
        out = tmp_path / "c.lz4"
        subprocess.run(
            ["lz4", "-z", "-f", "-q", *args, str(src), str(out)],
            check=True,
        )
        d = parse_lz4_frame(out.read_bytes())
        assert d["content"] == data, args
        if "-B4" in args:  # multi-block: the flag is meaningful
            assert d["block_indep"] == ("-BD" not in args)
    # our encoder's frames through the reference decoder
    ours = tmp_path / "o.lz4"
    ours.write_bytes(write_lz4_frame(data, block_max_code=4,
                                     block_checksum=True))
    dec = tmp_path / "o.out"
    subprocess.run(
        ["lz4", "-d", "-f", "-q", str(ours), str(dec)], check=True
    )
    assert dec.read_bytes() == data


def test_linked_block_window_decode():
    """Block-linked frames: a match in block 2 reaching into block 1
    decodes through the window parameter (r8)."""
    from neuroimaging_data_pipeline_spark.sources.lz4frame import (
        lz4_decompress_block,
    )

    # literals 'abcd' then, in a second block, a match of offset 4
    # copying them: token lit=0 match_len=4-4... build by hand:
    # block2 = one sequence: 0 literals, offset 4, matchlen 4
    blk2 = bytes([0x00, 0x04, 0x00, 0x00])  # + literals-only end token
    got = lz4_decompress_block(blk2, window=b"abcd")
    assert got == b"abcd"
