"""TFRecord + tf.train.Example (sources/tfrecord.py): hand-built
protobuf wire bytes, negative-varint form, packed and unpacked list
encodings, unknown-field tolerance, frame CRC guards."""

from __future__ import annotations

import struct

import pytest

from neuroimaging_data_pipeline_spark.sources.snappy import _mask_crc, crc32c
from neuroimaging_data_pipeline_spark.sources.tfrecord import (
    decode_example,
    encode_example,
    read_tfrecords,
    write_tfrecords,
)


def test_hand_built_example_bytes():
    # Example { features { feature { key:"id" value { int64_list
    # { value: [7] } } } } } assembled BY HAND:
    int64_list = bytes([0x0A, 0x01, 0x07])          # field1 len1 varint 7
    feature = bytes([0x1A, len(int64_list)]) + int64_list  # field3(int64_list)
    entry = (bytes([0x0A, 0x02]) + b"id"            # key = "id"
             + bytes([0x12, len(feature)]) + feature)      # value
    feats = bytes([0x0A, len(entry)]) + entry       # Features.feature
    example = bytes([0x0A, len(feats)]) + feats     # Example.features
    assert decode_example(example) == {"id": ("int64", [7])}
    # our encoder emits exactly these bytes for the same content
    assert encode_example({"id": [7]}) == example


def test_negative_int64_rides_ten_byte_varint():
    blob = encode_example({"id": [-1]})
    # -1 as two's complement = 10 bytes of 0xFF..0x01 inside the list
    assert b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01" in blob
    assert decode_example(blob) == {"id": ("int64", [-1])}
    assert decode_example(encode_example({"id": [-(2**63)]})) == {
        "id": ("int64", [-(2**63)])
    }


def test_packed_and_unpacked_int64_decode():
    # unpacked form (one varint field per value) must decode too —
    # proto3 readers accept both encodings for repeated scalars
    unpacked_list = bytes([0x08, 0x05, 0x08, 0x06])  # field1 varint x2
    feature = bytes([0x1A, len(unpacked_list)]) + unpacked_list
    entry = (bytes([0x0A, 0x01]) + b"x"
             + bytes([0x12, len(feature)]) + feature)
    feats = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(feats)]) + feats
    assert decode_example(example) == {"x": ("int64", [5, 6])}


def test_unpacked_float_decode():
    one = struct.pack("<f", 1.5)
    unpacked = bytes([0x0D]) + one  # field1 wire5 (32-bit)
    feature = bytes([0x12, len(unpacked)]) + unpacked  # field2 float_list
    entry = (bytes([0x0A, 0x01]) + b"f"
             + bytes([0x12, len(feature)]) + feature)
    feats = bytes([0x0A, len(entry)]) + entry
    example = bytes([0x0A, len(feats)]) + feats
    assert decode_example(example) == {"f": ("float", [1.5])}


def test_unknown_fields_skipped_everywhere():
    base = encode_example({"text": b"abc", "id": [3]})
    # unknown varint field at the Example level
    assert decode_example(
        base + bytes([(9 << 3) | 0, 0x2A])
    ) == decode_example(base)
    # unknown 64-bit field
    assert decode_example(
        base + bytes([(8 << 3) | 1]) + b"\x00" * 8
    ) == decode_example(base)


def test_multi_feature_roundtrip():
    feats = {
        "text": b"the document body",
        "lang": b"de",
        "id": [42],
        "n_chars": [17],
        "score": [2.25, 0.5, -3.75],
    }
    d = decode_example(encode_example(feats))
    assert d["text"] == ("bytes", [b"the document body"])
    assert d["lang"] == ("bytes", [b"de"])
    assert d["id"] == ("int64", [42])
    assert d["score"] == ("float", [2.25, 0.5, -3.75])


def test_tfrecord_framing_and_crc_guards():
    recs = [b"alpha", b"", b"x" * 1000]
    blob = write_tfrecords(recs)
    assert read_tfrecords(blob) == recs
    # frame layout hand-check on the first record
    (ln,) = struct.unpack_from("<Q", blob, 0)
    assert ln == 5
    (lcrc,) = struct.unpack_from("<I", blob, 8)
    assert lcrc == _mask_crc(crc32c(blob[:8]))
    (dcrc,) = struct.unpack_from("<I", blob, 12 + 5)
    assert dcrc == _mask_crc(crc32c(b"alpha"))
    # corruption: data byte, length-crc byte, truncation
    bad = bytearray(blob)
    bad[12] ^= 0x01
    with pytest.raises(ValueError, match="data CRC"):
        read_tfrecords(bytes(bad))
    bad = bytearray(blob)
    bad[9] ^= 0x01
    with pytest.raises(ValueError, match="length CRC"):
        read_tfrecords(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        read_tfrecords(blob[:-2])


def test_tensorflow_interop_if_available():
    try:
        import tensorflow as tf  # noqa
    except ImportError:
        pytest.skip("tensorflow not installed here")
    import tensorflow as tf

    blob = write_tfrecords([encode_example({"id": [9], "text": b"hi"})])
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".tfrecord", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        got = list(tf.data.TFRecordDataset(path))
        ex = tf.train.Example()
        ex.ParseFromString(got[0].numpy())
        assert ex.features.feature["id"].int64_list.value[:] == [9]
    finally:
        os.unlink(path)
