"""WARC/1.0 source (sources/warc.py): record framing both ways,
the Common Crawl gzip-member-per-record layout, HTTP response
splitting, and the corruption guards (payload digest, truncation,
missing terminator)."""

from __future__ import annotations

import gzip

import pytest

from neuroimaging_data_pipeline_spark.sources.warc import (
    http_response,
    parse_http_response,
    parse_warc,
    write_warc,
    write_warc_record,
)


def _records():
    return [
        ("warcinfo", {"WARC-Record-ID": "<urn:shard:0>"}, b"software: x\r\n"),
        (
            "response",
            {
                "WARC-Record-ID": "<urn:doc:7>",
                "WARC-Target-URI": "http://corpus.example/doc/7",
            },
            http_response(b"hello warc \x00\xff body"),
        ),
        (
            "response",
            {
                "WARC-Record-ID": "<urn:doc:8>",
                "WARC-Target-URI": "http://corpus.example/doc/8",
            },
            http_response(b"", status=404),
        ),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_gzip_members(gz):
    shard = write_warc(_records(), gzip_per_record=gz)
    got = parse_warc(shard)
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "response", "response",
    ]
    status, hdrs, body = parse_http_response(got[1][1])
    assert status == 200
    assert hdrs["content-type"].startswith("text/plain")
    assert body == b"hello warc \x00\xff body"
    status, _, body = parse_http_response(got[2][1])
    assert status == 404 and body == b""


def test_gzip_layout_is_one_member_per_record():
    shard = write_warc(_records(), gzip_per_record=True)
    assert shard.count(b"\x1f\x8b\x08") == 3  # three gzip members
    # shards are byte-deterministic (mtime pinned 0)
    assert shard == write_warc(_records(), gzip_per_record=True)


def test_payload_digest_corruption_raises():
    shard = bytearray(write_warc(_records(), gzip_per_record=False))
    # flip one byte inside the second record's HTTP body
    idx = shard.find(b"hello warc")
    shard[idx] ^= 0x01
    with pytest.raises(ValueError, match="digest mismatch"):
        parse_warc(bytes(shard))


def test_truncated_and_malformed_shards_raise():
    shard = write_warc(_records(), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated|terminator|CRLF"):
        parse_warc(shard[:-10])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n")
    gz = write_warc(_records(), gzip_per_record=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(gz[: len(gz) // 2])


def test_record_has_mandatory_fields_and_exact_length():
    rec = write_warc_record("response", {"WARC-Target-URI": "u"}, b"abc")
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert head.startswith(b"WARC/1.0\r\n")
    assert b"Content-Length: 3" in head
    assert b"WARC-Payload-Digest: sha1:" in head
    assert rest == b"abc\r\n\r\n"


def test_multi_member_gunzip_handles_plain_concat_of_members():
    # two members glued by hand must parse as two records
    r = _records()[1]
    one = write_warc([r], gzip_per_record=False)
    glued = gzip.compress(one, mtime=0) + gzip.compress(one, mtime=0)
    assert len(parse_warc(glued)) == 2
