"""H.264 inter (P-slice): interpolation identities, MV prediction,
bit-exact sequence round trips, skip handling, gates, ffmpeg pin."""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.h264_inter import (
    _CBP_INTER,
    _MvState,
    decode_h264_sequence,
    encode_h264_p_sequence,
    interp_chroma,
    interp_luma,
)


def _rand_frames(seed, h, w):
    rng = np.random.default_rng(seed)
    mk = lambda hh, ww: rng.integers(0, 256, (hh, ww), np.uint8)
    return (
        (mk(h, w), mk(h // 2, w // 2), mk(h // 2, w // 2)),
        (mk(h, w), mk(h // 2, w // 2), mk(h // 2, w // 2)),
    )


def _rand_specs(rng, mbw, mbh, modes=("16x16", "16x8", "8x16")):
    specs = []
    for i in range(mbw * mbh):
        m = modes[i % len(modes)]
        n = 1 if m == "16x16" else 2
        specs.append(
            (m, [tuple(int(v) for v in rng.integers(-17, 18, 2))
                 for _ in range(n)])
        )
    return specs


def test_cbp_inter_table_is_a_permutation():
    assert sorted(_CBP_INTER) == list(range(48))


def test_interp_full_pel_is_shift():
    rng = np.random.default_rng(1)
    ref = np.pad(rng.integers(0, 256, (32, 32)).astype(np.int64), 32,
                 mode="edge")
    for dx, dy in ((0, 0), (4, -8), (-12, 16)):
        got = interp_luma(ref, 32 + 4, 32 + 4, 8, 8, dx * 4, dy * 4)
        want = ref[36 + dy : 44 + dy, 36 + dx : 44 + dx]
        np.testing.assert_array_equal(got, want)
        gotc = interp_chroma(ref, 32 + 4, 32 + 4, 8, 8, dx * 8, dy * 8)
        np.testing.assert_array_equal(gotc, want)


def test_interp_half_pel_six_tap_scalar():
    """Pin one half-pel value against the scalar 6-tap formula."""
    rng = np.random.default_rng(2)
    ref = np.pad(rng.integers(0, 256, (16, 16)).astype(np.int64), 32,
                 mode="edge")
    y, x = 36, 38
    got = interp_luma(ref, y, x, 1, 1, 2, 0)[0, 0]
    row = ref[y, x - 2 : x + 4]
    want = np.clip(
        (row[0] - 5 * row[1] + 20 * row[2] + 20 * row[3] - 5 * row[4]
         + row[5] + 16) >> 5, 0, 255,
    )
    assert got == want
    # center j: 6-tap of UN-rounded horizontal half values
    got_j = interp_luma(ref, y, x, 1, 1, 2, 2)[0, 0]
    hh = [
        int(ref[yy, x - 2] - 5 * ref[yy, x - 1] + 20 * ref[yy, x]
            + 20 * ref[yy, x + 1] - 5 * ref[yy, x + 2] + ref[yy, x + 3])
        for yy in range(y - 2, y + 4)
    ]
    want_j = np.clip(
        (hh[0] - 5 * hh[1] + 20 * hh[2] + 20 * hh[3] - 5 * hh[4] + hh[5]
         + 512) >> 10, 0, 255,
    )
    assert got_j == want_j


def test_mv_median_prediction():
    st = _MvState(4, 4)
    st.fill(0, 0, 4, 4, np.array([4, 8]))   # mb (0,0)
    st.fill(4, 0, 4, 4, np.array([12, -4]))  # mb (1,0)
    st.fill(8, 0, 4, 4, np.array([0, 0]))    # mb (2,0)
    # mb (1,1): A=(0,0) unavail (col 0 of row 1 not filled yet)...
    st.fill(0, 4, 4, 4, np.array([-8, 4]))   # mb (0,1)
    # predictor for mb (1,1): A=(-8,4), B=(12,-4), C=(0,0)
    got = st.predict(4, 4, 4)
    np.testing.assert_array_equal(got, np.median(
        np.array([[-8, 4], [12, -4], [0, 0]]), axis=0).astype(int))
    # only-A rule: fresh state, only left neighbor known
    st2 = _MvState(4, 4)
    st2.fill(0, 4, 4, 4, np.array([6, -2]))
    np.testing.assert_array_equal(st2.predict(4, 4, 4), [6, -2])


@pytest.mark.parametrize("qp", [0, 12, 26, 40, 51])
def test_sequence_roundtrip_bit_exact(qp):
    f0, f1 = _rand_frames(40 + qp, 48, 64)
    rng = np.random.default_rng(qp)
    specs = _rand_specs(rng, 4, 3)
    stream, rec0, rec1 = encode_h264_p_sequence(f0, f1, specs, qp=qp)
    frames = decode_h264_sequence(stream)
    assert len(frames) == 2
    for pi in range(3):
        np.testing.assert_array_equal(frames[0][pi], rec0[pi])
        np.testing.assert_array_equal(frames[1][pi], rec1[pi])


def test_quarter_pel_fractions_all_roundtrip():
    """Every (fx, fy) quarter-pel fraction combination flows through
    at least one partition and the stream still round-trips."""
    f0, f1 = _rand_frames(9, 64, 64)
    specs = []
    fracs = [(fx, fy) for fx in range(4) for fy in range(4)]
    for i in range(16):
        fx, fy = fracs[i]
        specs.append(("16x16", [(8 + fx, -8 + fy)]))
    stream, _, rec1 = encode_h264_p_sequence(f0, f1, specs, qp=24)
    frames = decode_h264_sequence(stream)
    for pi in range(3):
        np.testing.assert_array_equal(frames[1][pi], rec1[pi])


def test_skip_runs_roundtrip():
    f0, _ = _rand_frames(7, 48, 48)
    specs = [("skip",), ("16x16", [(4, -4)]), ("skip",),
             ("16x8", [(0, 0), (8, 4)]), ("skip",), ("skip",),
             ("8x16", [(-4, 0), (2, 3)]), ("skip",), ("skip",)]
    stream, _, rec1 = encode_h264_p_sequence(f0, f0, specs, qp=20)
    frames = decode_h264_sequence(stream)
    for pi in range(3):
        np.testing.assert_array_equal(frames[1][pi], rec1[pi])
    # all-skip
    stream, _, rec1 = encode_h264_p_sequence(
        f0, f0, [("skip",)] * 9, qp=20
    )
    frames = decode_h264_sequence(stream)
    for pi in range(3):
        np.testing.assert_array_equal(frames[1][pi], rec1[pi])


def test_gates_raise():
    f0, f1 = _rand_frames(3, 32, 32)
    with pytest.raises(NotImplementedError, match="P_8x8"):
        encode_h264_p_sequence(f0, f1, [("8x8", [(0, 0)] * 4)] * 4)
    with pytest.raises(ValueError, match="16"):
        encode_h264_p_sequence(
            (f0[0][:24], f0[1][:12], f0[2][:12]), f1,
            [("16x16", [(0, 0)])] * 2,
        )


@pytest.mark.skipif(shutil.which("ffmpeg") is None, reason="no ffmpeg")
def test_inter_ffmpeg_cross_pin(tmp_path):
    """libavcodec must reconstruct both frames exactly (loop filter
    disabled in every slice header)."""
    f0, f1 = _rand_frames(11, 32, 48)
    rng = np.random.default_rng(5)
    specs = _rand_specs(rng, 3, 2)
    stream, rec0, rec1 = encode_h264_p_sequence(f0, f1, specs, qp=28)
    src = tmp_path / "t.h264"
    src.write_bytes(stream)
    out = tmp_path / "t.yuv"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-i", str(src), "-f", "rawvideo",
         "-pix_fmt", "yuv420p", str(out)],
        check=True,
    )
    raw = out.read_bytes()
    h, w = rec0[0].shape
    fsz = h * w * 3 // 2
    assert len(raw) == 2 * fsz
    for fi, rec in ((0, rec0), (1, rec1)):
        buf = raw[fi * fsz : (fi + 1) * fsz]
        fy = np.frombuffer(buf[: h * w], np.uint8).reshape(h, w)
        fcb = np.frombuffer(
            buf[h * w : h * w + h * w // 4], np.uint8
        ).reshape(h // 2, w // 2)
        fcr = np.frombuffer(buf[h * w + h * w // 4 :], np.uint8).reshape(
            h // 2, w // 2
        )
        np.testing.assert_array_equal(fy, rec[0])
        np.testing.assert_array_equal(fcb, rec[1])
        np.testing.assert_array_equal(fcr, rec[2])
