"""MP3 metadata codec (multimodal/mp3.py): ID3v2.3 syncsafe framing,
Layer III frame-length arithmetic, the desync guard, and the gates."""

from __future__ import annotations

import pytest

from neuroimaging_data_pipeline_spark.multimodal.mp3 import (
    build_id3v2,
    build_mp3,
    frame_length,
    parse_id3v2,
    parse_mp3,
)


def test_id3_roundtrip_and_syncsafe():
    tags = {"TIT2": "a title", "TPE1": "someone", "TRCK": "42"}
    raw = build_id3v2(tags)
    back, ln = parse_id3v2(raw)
    assert back == tags and ln == len(raw)
    # syncsafe bytes never have bit 7 set
    assert all(b < 0x80 for b in raw[6:10])


def test_frame_lengths_match_standard_arithmetic():
    assert frame_length(9, 0, 0) == 417   # 128 kbps @ 44100
    assert frame_length(10, 0, 1) == 523  # 160 kbps padded
    assert frame_length(11, 0, 0) == 626  # 192 kbps
    assert frame_length(14, 1, 0) == 960  # 320 kbps @ 48000


def test_walk_vbr_stream():
    m = parse_mp3(build_mp3({"TIT2": "t", "TRCK": "1"},
                            [(9, 0, 0), (10, 0, 1), (11, 0, 0)]))
    assert m["n_frames"] == 3
    assert m["bitrates"] == [128, 160, 192]
    assert m["audio_bytes"] == 417 + 523 + 626
    assert m["duration_samples"] == 3 * 1152
    assert m["sample_rate"] == 44100


def test_desync_raises_loudly():
    raw = bytearray(build_mp3({"TIT2": "t", "TRCK": "1"},
                              [(9, 0, 0), (9, 0, 0)]))
    # shrink the first frame's declared bitrate so the walk lands
    # mid-payload of frame 2 (bitrate idx 9 -> 1: 32 kbps)
    tag_len = parse_id3v2(bytes(raw))[1]
    raw[tag_len + 2] = (1 << 4) | (raw[tag_len + 2] & 0x0F)
    with pytest.raises(ValueError, match="sync|truncated"):
        parse_mp3(bytes(raw))


def test_gates():
    with pytest.raises(ValueError, match="ID3"):
        parse_mp3(b"\xff\xfbrandom")
    v4 = bytearray(build_id3v2({"TIT2": "x"}))
    v4[3] = 4
    with pytest.raises(NotImplementedError, match="v2.3 only"):
        parse_id3v2(bytes(v4))
    with pytest.raises(ValueError, match="truncated final frame"):
        parse_mp3(build_mp3({"TIT2": "x"}, [(9, 0, 0)])[:-10])
