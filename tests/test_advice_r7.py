"""Round-7 ADVICE fixes pinned: zstd frame-walk truncation raises
instead of infinite-looping, LZMA known-size overshoot raises, the
TFRecord synthesizer's n_chars matches the body normalization for
null text, and the Ogg synthesizer rejects bodies too large for the
S29 oracle's fixed lacing arithmetic."""

from __future__ import annotations

import lzma

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.sources.zstdmeta import (
    parse_zstd,
    write_zstd_frame,
    xxh64,
)


def _minimal_frame() -> bytes:
    # magic | SS descriptor (FCS flag 0 -> 1-byte size) | size 2 |
    # block header (last, raw, size 2) | payload
    return bytes(
        [0x28, 0xB5, 0x2F, 0xFD, 0b00100000, 2, 0x11, 0x00, 0x00]
    ) + b"hi"


def test_zstd_truncated_block_header_raises_not_hangs():
    """ADVICE r7 #1: int.from_bytes(b'') == 0 reads as a non-last RAW
    block of size 0 — parse_zstd(frame[:6]) used to loop forever."""
    frame = _minimal_frame()
    for cut in (6, 7, 8):  # inside the 3-byte block header
        with pytest.raises(ValueError, match="truncated"):
            parse_zstd(frame[:cut])


def test_zstd_truncated_block_bodies_raise():
    frame = _minimal_frame()
    with pytest.raises(ValueError, match="truncated"):
        parse_zstd(frame[:-1])  # RAW body cut short
    # RLE frame with the repeated byte missing
    ck = (xxh64(b"=====") & 0xFFFFFFFF).to_bytes(4, "little")
    rle = bytes(
        [0x28, 0xB5, 0x2F, 0xFD, 0b00000100, 0x00, 0x2B, 0x00, 0x00, 0x3D]
    ) + ck
    assert parse_zstd(rle)["frames"][0]["content"] == b"====="
    with pytest.raises(ValueError, match="truncated"):
        parse_zstd(rle[:9])


def test_zstd_intact_frames_still_parse():
    blob = write_zstd_frame(b"unchanged behavior " * 20)
    (f,) = parse_zstd(blob)["frames"]
    assert f["content"] == b"unchanged behavior " * 20


def test_lzma_known_size_overshoot_raises():
    """ADVICE r7 #4: the known-size loop tests the target only at the
    top, so a match that lands past it used to return MORE bytes than
    the declared uncompressed size, silently."""
    from neuroimaging_data_pipeline_spark.sources.lzma_alone import (
        lzma_decode_raw,
    )

    data = b"A" * 1000  # one literal then one huge match
    blob = lzma.compress(
        data,
        format=lzma.FORMAT_ALONE,
        filters=[{"id": lzma.FILTER_LZMA1, "preset": 6}],
    )
    # correct size decodes fine (match may end exactly at target)
    out, _ = lzma_decode_raw(blob, 13, 3, 0, 2, len(data))
    assert out == data
    # a target cut mid-match must raise, not overshoot
    with pytest.raises(ValueError, match="past declared"):
        lzma_decode_raw(blob, 13, 3, 0, 2, 500)


def test_tfrecord_null_text_n_chars_is_zero(spark):
    """ADVICE r7 #3: n_chars used len(str(None)) == 4 while the text
    feature encoded b'' — the same Example carried inconsistent
    fields and the S28 oracle (which computes length of the text)
    would mismatch on any null-text row."""
    from neuroimaging_data_pipeline_spark.sources.tfrecord import (
        synthesize_tfrecord_shards,
        tfrecord_documents,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                "text": ["alpha", None, "gamma"],
                "lang": ["en", "en", "de"],
            }
        )
    )
    shards = synthesize_tfrecord_shards(docs, id_col="doc_id", text_col="text")
    got = {
        r["doc_id"]: r["n_chars"]
        for r in tfrecord_documents(shards).collect()
    }
    assert got == {0: 5, 1: 0, 2: 5}


def test_ogg_oversized_body_fails_loudly(spark):
    """ADVICE r7 #5: the S29 oracle's page/span SQL is fixture-bound —
    a body big enough to push the text packet across a page boundary
    must be rejected at synthesis, not silently diverge."""
    from neuroimaging_data_pipeline_spark.sources.ogg import (
        synthesize_ogg_docs,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series([1], dtype="int64"),
                "text": ["x" * 15000],
            }
        )
    )
    with pytest.raises(Exception, match="lacing arithmetic"):
        synthesize_ogg_docs(docs, id_col="doc_id", text_col="text").collect()


def test_ogg_normal_bodies_unaffected(spark):
    from neuroimaging_data_pipeline_spark.sources.ogg import (
        ogg_documents,
        synthesize_ogg_docs,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                "text": ["short", "y" * 2000, None],
            }
        )
    )
    media = synthesize_ogg_docs(docs, id_col="doc_id", text_col="text")
    rows = {r["doc_id"]: r for r in ogg_documents(media).collect()}
    assert rows[1]["content_len"] == 2000
    assert rows[2]["content_len"] == 0
    assert rows[0]["n_spanning"] == 1  # forced tail for id%3==0
