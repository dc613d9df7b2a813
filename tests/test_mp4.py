"""MP4 (ISO-BMFF) container codec tests: the REAL stdlib-only box
writer/parser in multimodal/mp4.py, locally and through Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.mp4 import (
    _box,
    _full,
    _sample_plan,
    _sample_payload,
    _walk_boxes,
    decode_mp4_meta,
    encode_mp4,
    mp4_meta_features,
    mp4_sample_frames,
    synthesize_mp4_clips,
)


def test_mp4_roundtrip_local():
    """Every metadata field and every sample byte range resolved by the
    parser matches the generating formulas, across varying sample
    counts (4..8) and the 1-vs-2-chunk layouts."""
    for doc_id in [0, 1, 2, 7, 12, 999, 12345]:
        payload = encode_mp4(doc_id)
        assert payload[4:8] == b"ftyp" and payload[8:12] == b"isom"
        m = decode_mp4_meta(payload)
        durs, sizes = _sample_plan(doc_id)
        assert m["n_tracks"] == 1
        assert m["handler"] == "vide"
        assert m["timescale"] == 1000
        assert m["duration"] == sum(durs) == m["media_duration"]
        assert m["n_samples"] == len(durs)
        assert m["total_sample_bytes"] == sum(sizes)
        # the chunk-resolved ranges must reproduce the exact payloads
        for i, (off, size) in enumerate(m["sample_ranges"]):
            assert payload[off : off + size] == _sample_payload(doc_id, i, size)


def test_mp4_stts_run_length_is_real():
    """The alternating durations force multi-entry stts runs — assert
    the writer actually run-length-encodes (not one entry per sample),
    so the parser's run expansion is genuinely exercised."""
    payload = encode_mp4(5)
    pos = payload.index(b"stts")
    (n_runs,) = struct.unpack(">I", payload[pos + 8 : pos + 12])
    durs, _ = _sample_plan(5)
    assert 1 < n_runs < len(durs)  # compressed, but not trivially


def test_walk_boxes_largesize_and_to_end():
    """64-bit largesize headers (size==1) and size==0 (extends to end)
    both resolve to correct payload bounds."""
    inner = _box(b"abcd", b"xyz")
    large = struct.pack(">I", 1) + b"wide" + struct.pack(">Q", 16 + len(inner)) + inner
    to_end = struct.pack(">I", 0) + b"tail" + b"rest-of-file"
    data = large + to_end
    boxes = list(_walk_boxes(data, 0, len(data)))
    assert [t for t, _, _ in boxes] == [b"wide", b"tail"]
    s, e = boxes[0][1], boxes[0][2]
    assert data[s:e] == inner
    s, e = boxes[1][1], boxes[1][2]
    assert data[s:e] == b"rest-of-file"


def test_decode_mvhd_version1():
    """A version-1 (64-bit) mvhd parses to the same timescale/duration:
    rebuild the fixture's moov with mvhd v1 and re-decode."""
    payload = encode_mp4(3)
    m0 = decode_mp4_meta(payload)
    # replace the v0 mvhd box with a v1 form inside moov
    mvhd_pos = payload.index(b"mvhd") - 4
    (mvhd_size,) = struct.unpack(">I", payload[mvhd_pos : mvhd_pos + 4])
    old = payload[mvhd_pos : mvhd_pos + mvhd_size]
    tail = old[8 + 4 + 16 :]  # after version/flags + IIII header fields
    new_mvhd = _full(
        b"mvhd",
        1,
        0,
        struct.pack(">QQIQ", 0, 0, m0["timescale"], m0["duration"]) + tail,
    )
    moov_pos = payload.index(b"moov") - 4
    (moov_size,) = struct.unpack(">I", payload[moov_pos : moov_pos + 4])
    new_moov_payload = (
        payload[moov_pos + 8 : mvhd_pos]
        + new_mvhd
        + payload[mvhd_pos + mvhd_size : moov_pos + moov_size]
    )
    patched = payload[:moov_pos] + _box(b"moov", new_moov_payload)
    m1 = decode_mp4_meta(patched)
    assert m1["timescale"] == m0["timescale"]
    assert m1["duration"] == m0["duration"]
    assert m1["payload_sum"] == m0["payload_sum"]


def test_decode_co64_chunk_offsets():
    """co64 (64-bit chunk offsets, the >4 GB form): rebuilding the
    fixture's stco as co64 parses to identical metadata and byte
    ranges."""
    payload = encode_mp4(7)
    m0 = decode_mp4_meta(payload)
    pos = payload.index(b"stco") - 4
    (size,) = struct.unpack(">I", payload[pos : pos + 4])
    old = payload[pos : pos + size]
    (n_chunks,) = struct.unpack(">I", old[12:16])
    offsets = struct.unpack(f">{n_chunks}I", old[16 : 16 + 4 * n_chunks])
    co64 = _full(
        b"co64",
        0,
        0,
        struct.pack(">I", n_chunks)
        + b"".join(struct.pack(">Q", o) for o in offsets),
    )
    # replace inside stbl; all ancestor box sizes must grow
    delta = len(co64) - size
    patched = bytearray(payload[:pos] + co64 + payload[pos + size :])
    for tag in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        p = bytes(patched).index(tag) - 4
        (sz,) = struct.unpack(">I", patched[p : p + 4])
        patched[p : p + 4] = struct.pack(">I", sz + delta)
    m1 = decode_mp4_meta(bytes(patched))
    assert m1["payload_sum"] == m0["payload_sum"]
    assert m1["sample_ranges"] == m0["sample_ranges"]


def test_decode_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4_meta(b"not an mp4 at all")
    payload = encode_mp4(4)
    with pytest.raises((ValueError, struct.error, KeyError, IndexError)):
        decode_mp4_meta(payload[: len(payload) // 2])


def test_decode_rejects_inconsistent_sample_tables():
    """Corrupting the stsz count so it disagrees with stts must raise,
    not silently misread."""
    payload = bytearray(encode_mp4(6))
    pos = payload.index(b"stsz")
    # stsz payload: version/flags(4) + fixed_size(4) + count(4)
    (count,) = struct.unpack(">I", payload[pos + 12 : pos + 16])
    payload[pos + 12 : pos + 16] = struct.pack(">I", count - 1)
    with pytest.raises(ValueError, match="stsz|stsc"):
        decode_mp4_meta(bytes(payload))


def test_mp4_features_spark_roundtrip(spark):
    """synthesize -> meta + frame-sample through Spark across
    repartitioning: every field matches a local recomputation."""
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    ).repartition(3)
    media = synthesize_mp4_clips(docs)
    meta = mp4_meta_features(media).toPandas().set_index("media_id")
    assert len(meta) == 12
    for i in range(12):
        durs, sizes = _sample_plan(i)
        exp_sum = sum(
            int(np.frombuffer(_sample_payload(i, k, s), np.uint8).sum())
            for k, s in enumerate(sizes)
        )
        row = meta.loc[i]
        assert row["duration"] == sum(durs)
        assert row["n_samples"] == len(durs)
        assert row["total_sample_bytes"] == sum(sizes)
        assert row["payload_sum"] == exp_sum

    frames = mp4_sample_frames(synthesize_mp4_clips(docs), every_n=2).toPandas()
    for i in range(12):
        _, sizes = _sample_plan(i)
        sub = frames[frames["media_id"] == i].set_index("frame_idx")
        assert sorted(sub.index) == list(range(0, len(sizes), 2))
        for k in sub.index:
            pay = np.frombuffer(_sample_payload(i, k, sizes[k]), np.uint8)
            assert sub.loc[k, "frame_size"] == sizes[k]
            assert sub.loc[k, "frame_sum"] == int(pay.sum())


def test_mjpeg_roundtrip_constant_frames():
    """MJPEG profile: real JPEG frames inside the real MP4 container
    decode back to exact pixels (DC-only constant blocks)."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_gray,
    )
    from neuroimaging_data_pipeline_spark.multimodal.mp4 import (
        decode_mp4_meta,
        encode_mjpeg,
        mjpeg_frame_value,
    )

    for d in (0, 3, 42, 101):
        m = decode_mp4_meta(encode_mjpeg(d))
        assert m["n_samples"] == 4 + d % 5
        for i in range(m["n_samples"]):
            off, size = m["sample_ranges"][i]
            px = decode_jpeg_gray(bytes(m["data"][off : off + size]))
            assert px.shape == (8, 8)
            assert (px == mjpeg_frame_value(d, i)).all()


def test_mjpeg_container_payload_transparency():
    """Arbitrary (non-constant) JPEG frames survive the container
    byte-for-byte: container-extracted payload decodes identically to
    direct decode of the original encoding."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )
    from neuroimaging_data_pipeline_spark.multimodal.mp4 import (
        decode_mp4_meta,
        encode_mp4,
    )

    rng = np.random.default_rng(5)
    frames = [
        encode_jpeg_gray(rng.integers(0, 256, (16, 16)).astype(np.uint8))
        for _ in range(3)
    ]
    m = decode_mp4_meta(encode_mp4(9, payloads=frames, codec=b"jpeg"))
    assert m["n_samples"] == 3
    for i, orig in enumerate(frames):
        off, size = m["sample_ranges"][i]
        extracted = bytes(m["data"][off : off + size])
        assert extracted == orig
        assert (decode_jpeg_gray(extracted) == decode_jpeg_gray(orig)).all()
