"""Avro OCF codec (sources/avro_ocf.py): varint/union/block framing
both ways, both codecs, writer-schema-driven decode, sync
verification, and the declared gates."""

from __future__ import annotations

import io
import json

import pytest

from neuroimaging_data_pipeline_spark.sources.avro_ocf import (
    DOC_SCHEMA,
    read_avro,
    read_long,
    write_avro,
    write_long,
)

ROWS = [
    {"doc_id": 0, "label": None, "n_chars": 5, "text": "héllo"},
    {"doc_id": 1, "label": "en", "n_chars": 0, "text": ""},
    {"doc_id": -3, "label": "de", "n_chars": 12345678901, "text": "x" * 500},
]


def test_zigzag_varint_roundtrip_extremes():
    for n in (0, -1, 1, 63, -64, 64, 2**31, -(2**31), 2**62, -(2**62)):
        out = bytearray()
        write_long(out, n)
        assert read_long(io.BytesIO(bytes(out))) == n
    # canonical zigzag bytes: 0->00, -1->01, 1->02, -2->03
    for n, want in ((0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03")):
        out = bytearray()
        write_long(out, n)
        assert bytes(out) == want


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_multiblock(codec):
    rows = ROWS * 30  # several blocks at rows_per_block=32
    buf = write_avro(rows, codec=codec)
    schema, back = read_avro(buf)
    assert back == rows
    assert schema == DOC_SCHEMA
    assert buf[:4] == b"Obj\x01"


def test_deflate_actually_compresses():
    rows = ROWS * 30
    assert len(write_avro(rows, codec="deflate")) < len(
        write_avro(rows, codec="null")
    ) / 5


def test_decode_follows_writer_schema_not_assumption():
    sch = json.loads(json.dumps(DOC_SCHEMA))
    sch["fields"] = sch["fields"][::-1]
    _, back = read_avro(write_avro(ROWS[:1], schema=sch))
    assert back == ROWS[:1]


def test_sync_marker_mismatch_raises():
    buf = bytearray(write_avro(ROWS))
    buf[-1] ^= 1
    with pytest.raises(ValueError, match="sync marker"):
        read_avro(bytes(buf))


def test_gates_and_guards():
    with pytest.raises(ValueError, match="container"):
        read_avro(b"PAR1not-avro")
    with pytest.raises(NotImplementedError, match="snappy"):
        write_avro(ROWS, codec="snappy")
    buf = write_avro(ROWS)
    # swap the declared codec to an unsupported one, fixing lengths
    bad = buf.replace(b"\x08null", b"\x08zstd")
    with pytest.raises(NotImplementedError, match="zstd"):
        read_avro(bad)
    with pytest.raises(ValueError, match="truncated"):
        read_avro(buf[:-20])
