"""FLAC codec (multimodal/flac.py): CRC check values, container
round-trip, the STREAMINFO PCM-MD5 integrity hash, and loud failure
on corruption / unimplemented subframe types."""

from __future__ import annotations

import hashlib
import struct

import pytest

from neuroimaging_data_pipeline_spark.multimodal.flac import (
    _BLOCK,
    _doc_samples,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_check_values():
    # published check values for CRC-8/0x07 (SMBUS) and CRC-16/0x8005
    # init-0 no-reflect (BUYPASS) over '123456789'
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 7, 100, 12345])
def test_roundtrip_and_pcm_md5(i):
    s = _doc_samples(i)
    blob = encode_flac(s, {"TITLE": f"doc {i}"})
    d = decode_flac(blob)
    assert d["samples"] == s
    assert d["md5_ok"]
    assert d["n_frames"] == 4 + i % 5
    assert d["streaminfo"]["total_samples"] == len(s)
    assert d["comments"]["TITLE"] == f"doc {i}"
    # both subframe types present: even frames flat, odd frames ramps
    assert d["n_frames"] >= 4


def test_streaminfo_packed_field_layout():
    d = decode_flac(encode_flac([5] * _BLOCK, {}))
    si = d["streaminfo"]
    assert (si["sample_rate"], si["channels"], si["bits"]) == (44100, 1, 16)
    assert si["min_blocksize"] == si["max_blocksize"] == _BLOCK


def test_pcm_md5_is_the_format_hash():
    samples = list(range(-8, 8))
    blob = encode_flac(samples, {})
    pcm = b"".join(int(v).to_bytes(2, "little", signed=True) for v in samples)
    assert decode_flac(blob)["streaminfo"]["md5"] == hashlib.md5(pcm).digest()


def test_frame_crc16_corruption_fails_loudly():
    blob = bytearray(encode_flac(_doc_samples(5), {"TITLE": "x"}))
    # flip one bit inside the LAST frame's sample payload (3 bytes
    # before its CRC-16 tail)
    blob[-4] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(blob))


def test_header_crc8_corruption_fails_loudly():
    samples = [3] * _BLOCK
    blob = bytearray(encode_flac(samples, {}))
    # the frame starts right after the metadata blocks: find the sync
    at = blob.find(b"\xff\xf8", 4)
    assert at > 0
    blob[at + 5] ^= 0x01  # the 8-bit blocksize-1 field, CRC-8-covered
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(blob))


def test_unimplemented_subframe_type_raises_not_implemented():
    samples = [3] * _BLOCK
    blob = bytearray(encode_flac(samples, {}))
    at = blob.find(b"\xff\xf8", 4)
    # subframe header byte sits after: 4 fixed header bytes + 1-byte
    # UTF-8 frame number + 1-byte blocksize-1 + 1-byte CRC-8
    sub_at = at + 7
    blob[sub_at] = 0b001000 << 1  # FIXED order 0
    # re-seal both CRCs so the type gate (not the CRC) is what fires
    blob[at + 6] = crc8(bytes(blob[at : at + 6]))
    end = len(blob) - 2
    struct.pack_into(">H", blob, end, crc16(bytes(blob[at:end])))
    with pytest.raises(NotImplementedError, match="FIXED/LPC"):
        decode_flac(bytes(blob))


def test_lost_sync_detected():
    blob = bytearray(encode_flac([3] * _BLOCK, {}))
    at = blob.find(b"\xff\xf8", 4)
    blob[at] = 0x00
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(blob))
