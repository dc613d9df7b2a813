"""zstd compressed-block decoder (sources/zstdblock.py): bit-exact
conformance against TWO independent real writers (pyarrow's bundled
libzstd and the zstd CLI) across levels and data textures, internal
FSE/Huffman table invariants, and loud failure on corruption."""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from neuroimaging_data_pipeline_spark.sources.zstdblock import (
    ZstdBlockState,
    _BackBits,
    _huf_decode_stream,
    build_fse_dtable,
    decode_block,
    read_huf_dtable,
    read_ncount,
)
from neuroimaging_data_pipeline_spark.sources.zstdmeta import parse_zstd


def _textures() -> dict[str, bytes]:
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    return {
        "empty": b"",
        "one": b"a",
        "short": b"hello world " * 3,
        "repetitive": b"hello hello hello world " * 100,
        "alphabet": bytes(range(256)) * 40,
        "jsonl": "\n".join(
            '{"id": %d, "text": "%s"}' % (i, " ".join(rng.choices(words, k=20)))
            for i in range(800)
        ).encode(),
        "incompressible": bytes(rng.randrange(256) for _ in range(5000)),
        "mixed": (b"abcabcabd" * 1000)
        + bytes(rng.randrange(4) for _ in range(2000)),
        "rle_like": b"x" * 200000,
        "multiblock": b"lorem ipsum dolor sit amet " * 8000,  # > 128 KB
    }


def _decode(blob: bytes) -> bytes:
    return b"".join(f["content"] for f in parse_zstd(blob)["frames"])


@pytest.mark.parametrize("level", [1, 3, 6, 9, 12, 19])
def test_pyarrow_libzstd_conformance(level):
    pa = pytest.importorskip("pyarrow")
    codec = pa.Codec("zstd", compression_level=level)
    for name, data in _textures().items():
        blob = bytes(codec.compress(data))
        assert _decode(blob) == data, f"{name} @ level {level}"


def test_pyarrow_fuzz_random_runs():
    """Random run-length structures probe repeat offsets, treeless
    blocks, and RLE/raw literal fallbacks the fixed textures miss."""
    pa = pytest.importorskip("pyarrow")
    rng = random.Random(1234)
    for trial in range(30):
        parts = []
        for _ in range(rng.randrange(1, 20)):
            run = bytes([rng.randrange(256)]) * rng.randrange(1, 200)
            word = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 30)))
            parts.append(run + word * rng.randrange(1, 10))
        data = b"".join(parts)
        level = rng.choice([1, 3, 6, 9, 15, 19])
        blob = bytes(pa.Codec("zstd", compression_level=level).compress(data))
        assert _decode(blob) == data, f"trial {trial} level {level}"


@pytest.mark.skipif(shutil.which("zstd") is None, reason="no zstd CLI")
def test_zstd_cli_conformance(tmp_path):
    for name, data in _textures().items():
        src = tmp_path / f"{name}.bin"
        src.write_bytes(data)
        for args in (["-3"], ["-19"], ["-1", "-C"], ["-9", "-C", "--long=20"]):
            out = tmp_path / f"{name}.zst"
            subprocess.run(
                ["zstd", "-q", "-f", *args, str(src), "-o", str(out)],
                check=True,
            )
            d = parse_zstd(out.read_bytes())
            assert b"".join(f["content"] for f in d["frames"]) == data
            if "-C" in args:  # CLI wrote an XXH64 checksum: must verify
                assert all(f["checksum_ok"] for f in d["frames"])


def test_multi_frame_concatenation():
    pa = pytest.importorskip("pyarrow")
    codec = pa.Codec("zstd", compression_level=3)
    a, b = b"first frame " * 50, b"second frame " * 80
    blob = bytes(codec.compress(a)) + bytes(codec.compress(b))
    d = parse_zstd(blob)
    assert len(d["frames"]) == 2
    assert b"".join(f["content"] for f in d["frames"]) == a + b


# --- internals ------------------------------------------------------------------------


def test_backward_bitstream_reads_below_sentinel():
    # bytes little-endian; last byte 0b0000_0101: sentinel at bit 2,
    # payload = bits 0-1 of byte1 ++ all 8 bits of byte0 (10 bits)
    bb = _BackBits(bytes([0b10110100, 0b00000101]))
    assert bb.pos == 10
    assert bb.read(2) == 0b01  # the two bits just below the sentinel
    assert bb.read(4) == 0b1011
    assert bb.peek(8) == 0b01000000  # only 4 real bits left, zero-pad
    assert bb.read(4) == 0b0100
    assert bb.pos == 0
    with pytest.raises(ValueError, match="underflow"):
        bb.read(1)
    with pytest.raises(ValueError, match="sentinel"):
        _BackBits(bytes([0xFF, 0x00]))


def test_fse_dtable_predefined_ll_invariants():
    from neuroimaging_data_pipeline_spark.sources.zstdblock import _LL_DEFAULT

    table = build_fse_dtable(_LL_DEFAULT, 6)
    assert len(table) == 64
    # cells per symbol == its normalized count (with -1 -> 1)
    per = {}
    for s, nb, base in table:
        per[s] = per.get(s, 0) + 1
        assert 0 <= nb <= 6
        assert 0 <= base and base + (1 << nb) <= 64
    for s, c in enumerate(_LL_DEFAULT):
        assert per.get(s, 0) == (1 if c == -1 else c)
    # "less than 1" symbols own the TOP cells (filled downward in
    # symbol order), one each, full 6 bits
    for i, s in enumerate((32, 33, 34, 35)):
        sym, nb, base = table[63 - i]
        assert (sym, nb, base) == (s, 6, 0)


def test_read_ncount_single_full_probability_symbol():
    # 0xF0: alog 5; six 1-bits read count 33 -> stored 32 = the whole
    # mass on symbol 0 (an RLE-like but legal distribution)
    alog, counts, end = read_ncount(bytes([0xF0, 0xFF]), 0, 9, 35)
    assert (alog, counts, end) == (5, [32], 2)


def test_read_ncount_rejects_too_many_symbols():
    # all-zero bits: an endless run of "less than 1" counts blows the
    # max_symbol cap long before the mass is spent
    with pytest.raises(ValueError, match="too many symbols"):
        read_ncount(bytes(8), 0, 9, 3)


def test_huffman_direct_weights_table_and_decode():
    # weights (4, 3) for symbols 0,1 -> total 12, tableLog 4,
    # implied last weight 3: cells 0-3 sym1, 4-7 sym2, 8-15 sym0
    block = bytes([127 + 2, 0x43])
    table, tlog, pos = read_huf_dtable(block, 0)
    assert (tlog, pos) == (4, 2)
    assert table[0] == (1, 2) and table[4] == (2, 2) and table[8] == (0, 1)
    # one-symbol stream: payload bit '1' + sentinel -> symbol 0
    assert _huf_decode_stream(table, tlog, b"\x03", 1) == b"\x00"
    # stream not fully consumed must raise
    with pytest.raises(ValueError, match="consumed"):
        _huf_decode_stream(table, tlog, b"\x07", 1)


def test_treeless_and_repeat_without_history_raise():
    st = ZstdBlockState()
    # literals byte: type 3 (treeless), size format 0 -> 3-byte header
    with pytest.raises(ValueError, match="previous Huffman"):
        decode_block(bytes([0x03, 0x00, 0x00, 0x00]), st, bytearray())
    # raw 0-byte literals, 1 sequence, all Repeat_Mode (0b11 fields)
    with pytest.raises(ValueError, match="previous table"):
        decode_block(bytes([0x00, 0x01, 0b11111100]), st, bytearray())


def test_reserved_sequence_mode_bits_raise():
    with pytest.raises(ValueError, match="reserved sequence-mode"):
        decode_block(bytes([0x00, 0x01, 0b00000001]), ZstdBlockState(), bytearray())


def test_truncated_compressed_block_raises_everywhere():
    pa = pytest.importorskip("pyarrow")
    data = b"truncate me " * 300
    blob = bytes(pa.Codec("zstd", compression_level=6).compress(data))
    for cut in (len(blob) // 3, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            parse_zstd(blob[:cut])


def test_corrupt_payload_raises_or_mismatches_never_hangs():
    """Flip bytes through a real compressed frame: every corruption
    either raises ValueError or yields different bytes — decode never
    hangs and never overflows into silence."""
    pa = pytest.importorskip("pyarrow")
    data = b"corruption sweep payload " * 200
    blob = bytearray(pa.Codec("zstd", compression_level=6).compress(data))
    rng = random.Random(99)
    for _ in range(60):
        i = rng.randrange(8, len(blob))  # keep the frame header intact
        old = blob[i]
        blob[i] ^= 0xFF
        try:
            got = b"".join(f["content"] for f in parse_zstd(bytes(blob))["frames"])
            assert got != data or blob[i] == old
        except (ValueError, IndexError, KeyError):
            pass
        blob[i] = old


@pytest.mark.skipif(shutil.which("zstd") is None, reason="no zstd CLI")
def test_dictionary_frames_decode(tmp_path):
    """RFC 8878 §5 dictionaries (r8): train a real dictionary with
    the zstd CLI, decode dict-compressed frames — entropy tables,
    repeat offsets and content-prefix window all live."""
    from neuroimaging_data_pipeline_spark.sources.zstdblock import (
        parse_zstd_dictionary,
    )

    rng = random.Random(4)
    words = ["alpha", "beta", "gamma", "delta", "query", "spark"]
    samples = []
    for i in range(120):
        p = tmp_path / f"s{i}.json"
        p.write_bytes(
            ('{"id": %d, "text": "%s"}\n'
             % (i, " ".join(rng.choices(words, k=40)))).encode()
        )
        samples.append(str(p))
    dpath = tmp_path / "dict.bin"
    subprocess.run(
        ["zstd", "--train", *samples, "-o", str(dpath), "-f", "-q"],
        check=True, capture_output=True,
    )
    dictbuf = dpath.read_bytes()
    parsed = parse_zstd_dictionary(dictbuf)
    assert parsed["dict_id"] != 0 and parsed["content"]
    assert parsed["state"].huf is not None
    body = ('{"id": 7, "text": "%s"}\n'
            % " ".join(words * 10)).encode()
    src = tmp_path / "t.json"
    src.write_bytes(body)
    for lvl in ("-1", "-19"):
        out = tmp_path / "t.zst"
        subprocess.run(
            ["zstd", "-f", "-q", lvl, "-D", str(dpath), str(src),
             "-o", str(out)], check=True,
        )
        d = parse_zstd(out.read_bytes(), dictionary=dictbuf)
        (f,) = d["frames"]
        assert f["content"] == body and f["dict_id"] == parsed["dict_id"]
    # a dict frame whose blocks genuinely reference the dictionary
    # must raise WITH the dictionary hint when decoded without it
    with pytest.raises(ValueError, match="declares dictionary"):
        parse_zstd(out.read_bytes())
    # RFC 8878 lets encoders SUPPRESS Dictionary_ID on dict frames
    # (zstd --no-dictID); a supplied dictionary must still apply
    # (ADVICE r8)
    out2 = tmp_path / "t2.zst"
    subprocess.run(
        ["zstd", "-f", "-q", "-19", "--no-dictID", "-D", str(dpath),
         str(src), "-o", str(out2)], check=True,
    )
    d2 = parse_zstd(out2.read_bytes(), dictionary=dictbuf)
    (f2,) = d2["frames"]
    assert f2["content"] == body and f2["dict_id"] == 0


def test_raw_content_dictionary_passthrough():
    from neuroimaging_data_pipeline_spark.sources.zstdblock import (
        parse_zstd_dictionary,
    )

    d = parse_zstd_dictionary(b"just raw prefix bytes")
    assert d["dict_id"] == 0
    assert d["content"] == b"just raw prefix bytes"
    assert d["state"].reps == [1, 4, 8]


def test_jsonl_zst_shard_round_trip(spark):
    """e11's pack/unpack pair: multi-doc .jsonl.zst shards written by
    libzstd reassemble exactly through the from-scratch decoder,
    including JSON-escaped newlines/quotes and null text."""
    import pandas as pd

    from neuroimaging_data_pipeline_spark.sources.zstdmeta import (
        synthesize_jsonl_zst_shards,
        zstd_shard_documents,
    )

    texts = ['line one\nline two', 'quote " and \\ backslash', None,
             'plain', 'unicode é中文'] * 25
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(texts)), dtype="int64"),
                "text": texts,
            }
        )
    )
    shards = synthesize_jsonl_zst_shards(docs, id_col="doc_id",
                                         text_col="text")
    back = {
        r["doc_id"]: (r["shard_id"], r["text"])
        for r in zstd_shard_documents(shards).collect()
    }
    assert len(back) == len(texts)
    for i, t in enumerate(texts):
        sid, got = back[i]
        assert sid == i // 50
        assert got == ("" if t is None else t)
