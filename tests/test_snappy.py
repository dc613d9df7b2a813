"""Snappy codec (sources/snappy.py): CRC-32C check value + mask
function, hand-decoded tag streams, raw + framing round-trips,
corruption failures, and reference-implementation interop pins that
activate when python-snappy or cramjam is installed."""

from __future__ import annotations

import random

import pytest

from neuroimaging_data_pipeline_spark.sources.snappy import (
    _mask_crc,
    crc32c,
    parse_snappy_frame,
    snappy_compress,
    snappy_decompress,
    write_snappy_frame,
)


def test_crc32c_check_value_and_mask():
    assert crc32c(b"123456789") == 0xE3069283  # published CRC-32C value
    # mask formula from framing_format.txt
    assert _mask_crc(0) == 0xA282EAD8
    assert _mask_crc(0xE3069283) == ((0xE3069283 >> 15) | (0xE3069283 << 17)
                                     & 0xFFFFFFFF) + 0xA282EAD8 & 0xFFFFFFFF


def test_hand_built_raw_tag_stream():
    # preamble 9; literal tag len 5 ('hello'), copy-1: len 4, offset 5
    blob = bytes([9, (5 - 1) << 2]) + b"hello" + bytes(
        [0x01 | ((4 - 4) << 2) | ((5 >> 8) << 5), 5]
    )
    assert snappy_decompress(blob) == b"hellohell"


def test_hand_built_extended_literal_and_copy2():
    lits = bytes(range(256))  # 256 literals -> 60-form extension
    blob = bytearray()
    blob += bytes([0x82, 0x02])  # varint 258 (0b10_0000010)
    blob += bytes([60 << 2, 255]) + lits  # literal len 256
    blob += bytes([0x02 | ((2 - 1) << 2)]) + (256).to_bytes(2, "little")
    assert snappy_decompress(bytes(blob)) == lits + lits[:2]


def test_overlap_copy_run():
    # 'a' then copy offset 1 length 8 -> 9 a's
    blob = bytes([9, 0 << 2]) + b"a" + bytes([0x01 | ((8 - 4) << 2), 1])
    assert snappy_decompress(blob) == b"a" * 9


def test_decoder_rejects_malformed():
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([4, 0]) + b"a" + bytes([0x01, 9]))
    with pytest.raises(ValueError, match="declared length"):
        snappy_decompress(bytes([9, 0 << 2]) + b"a")
    with pytest.raises(ValueError, match="literal past"):
        snappy_decompress(bytes([9, (8 - 1) << 2]) + b"ab")


def test_raw_fuzz_round_trip():
    rng = random.Random(20260815)
    for t in range(250):
        n = rng.randrange(0, 5000)
        if t % 3 == 0:
            data = rng.randbytes(n)
        elif t % 3 == 1:
            data = bytes(rng.choice(b"snappy ") for _ in range(n))
        else:
            unit = rng.randbytes(rng.randrange(1, 7))
            data = (unit * (n // max(1, len(unit)) + 1))[:n]
        assert snappy_decompress(snappy_compress(data)) == data, t


def test_frame_variants_and_multi_chunk():
    for i in range(25):
        body = (f"sz doc {i} " * (i + 1)).encode()
        blob = write_snappy_frame(
            body, force_uncompressed=(i % 4 == 0),
            pad=(6 + i % 4) if i % 5 == 0 else 0,
        )
        d = parse_snappy_frame(blob)
        assert d["content"] == body
        assert d["n_padding"] == (1 if i % 5 == 0 else 0)
        assert d["n_stored"] == (d["n_chunks"] if i % 4 == 0 else 0)
    big = ("framing " * 20000).encode()
    d = parse_snappy_frame(write_snappy_frame(big))
    assert d["content"] == big
    assert d["n_chunks"] == (len(big) + 65535) // 65536


def test_frame_crc_and_reserved_chunks_fail_loudly():
    body = b"crc payload " * 30
    blob = bytearray(write_snappy_frame(body, force_uncompressed=True))
    # flip a data byte inside the (stored) first chunk: CRC must catch
    blob[20] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32C|identifier"):
        parse_snappy_frame(bytes(blob))
    good = write_snappy_frame(body)
    with pytest.raises(ValueError, match="identifier"):
        parse_snappy_frame(b"\xff\x06\x00\x00sNaPpX" + good[10:])
    # unskippable reserved chunk type
    bad = good + bytes([0x02, 1, 0, 0, 0])
    with pytest.raises(ValueError, match="unskippable"):
        parse_snappy_frame(bad)
    # skippable reserved chunk type is ignored
    ok = good + bytes([0x80, 1, 0, 0, 0])
    assert parse_snappy_frame(ok)["content"] == body


def test_reference_snappy_interop_if_available():
    ref = None
    try:
        import snappy as ref_mod  # python-snappy

        ref = (ref_mod.compress, ref_mod.decompress)
    except ImportError:
        try:
            import cramjam

            ref = (
                lambda b: bytes(cramjam.snappy.compress_raw(b)),
                lambda b: bytes(cramjam.snappy.decompress_raw(b)),
            )
        except ImportError:
            pytest.skip("no snappy reference implementation installed")
    comp_ref, decomp_ref = ref
    body = b"interop body " * 200
    assert decomp_ref(snappy_compress(body)) == body
    assert snappy_decompress(comp_ref(body)) == body


def test_pyarrow_snappy_conformance_both_directions():
    """r8 (VERDICT r7 #8): pyarrow's bundled real snappy as the
    conformance peer for the RAW block codec, both directions,
    fuzzed across textures."""
    pa = pytest.importorskip("pyarrow")
    import random

    codec = pa.Codec("snappy")
    rng = random.Random(11)
    samples = [
        b"",
        b"a",
        b"snappy conformance " * 500,
        bytes(range(256)) * 30,
        bytes(rng.randrange(256) for _ in range(4000)),
        (b"runrunrun" * 400) + bytes(rng.randrange(8) for _ in range(999)),
    ]
    for data in samples:
        assert snappy_decompress(bytes(codec.compress(data))) == data
        assert bytes(
            codec.decompress(snappy_compress(data), len(data))
        ) == data
