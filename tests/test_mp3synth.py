"""MP3 hybrid filterbank: IMDCT kernel pins, Princen-Bradley TDAC
perfect reconstruction (long and start/short/stop sequences), alias
butterfly pins, reorder inverse, frequency inversion, polyphase
gate."""

from __future__ import annotations

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal import mp3synth as S


def test_imdct_kernel_matches_scalar_formula():
    rng = np.random.default_rng(1)
    X = rng.standard_normal(18)
    x = S._IM36 @ X
    for i in (0, 7, 35):
        want = sum(
            X[k] * np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
            for k in range(18)
        )
        assert abs(x[i] - want) < 1e-12
    Xs = rng.standard_normal(6)
    xs = S._IM12 @ Xs
    for i in (0, 5, 11):
        want = sum(
            Xs[k] * np.cos(np.pi / 24 * (2 * i + 1 + 6) * (2 * k + 1))
            for k in range(6)
        )
        assert abs(xs[i] - want) < 1e-12


def test_window_shapes():
    assert abs(S._WIN_NORMAL[0] - np.sin(np.pi / 72)) < 1e-15
    assert np.all(S._WIN_START[18:24] == 1.0)
    assert np.all(S._WIN_START[30:] == 0.0)
    assert np.all(S._WIN_STOP[:6] == 0.0)
    assert np.all(S._WIN_STOP[12:18] == 1.0)
    # start/stop are time-mirrors of each other
    np.testing.assert_allclose(S._WIN_STOP, S._WIN_START[::-1], atol=1e-15)


def test_long_tdac_perfect_reconstruction():
    """Forward MDCT (sine window, hop 18) -> imdct_windowed ->
    overlap-add must reproduce n/4 = 9x the signal."""
    rng = np.random.default_rng(2)
    sig = rng.standard_normal(18 * 6)
    h = S._WIN_NORMAL
    F = S._IM36.T
    prev = np.zeros(18)
    rec = np.zeros(18 * 6)
    for g in range(5):
        seg = sig[18 * g : 18 * g + 36]
        z = S.imdct_windowed(F @ (seg * h), 0)
        rec[18 * g : 18 * g + 18] = z[:18] + prev
        prev = z[18:]
    np.testing.assert_allclose(
        rec[18:90], 9.0 * sig[18:90], rtol=1e-10, atol=1e-10
    )


def test_start_short_stop_tdac():
    """The window-switching sequence normal->start->short->stop->
    normal must still reconstruct 9x the signal everywhere (shorts'
    n/4 = 3 factor harmonized by scaling their forward transform)."""
    rng = np.random.default_rng(3)
    sig = rng.standard_normal(18 * 7)
    hN, hS = S._WIN_NORMAL, S._WIN_SHORT
    FN, FS = S._IM36.T, S._IM12.T
    types = [0, 1, 2, 3, 0, 0]
    prev = np.zeros(18)
    rec = np.zeros(18 * 7)
    for g, bt in enumerate(types):
        seg = sig[18 * g : 18 * g + 36]
        if bt == 2:
            X = np.zeros(18)
            for w in range(3):
                sub = seg[6 + 6 * w : 18 + 6 * w]
                X[6 * w : 6 * w + 6] = 3.0 * (FS @ (sub * hS))
        else:
            win = {0: S._WIN_NORMAL, 1: S._WIN_START, 3: S._WIN_STOP}[bt]
            X = FN @ (seg * win)
        z = S.imdct_windowed(X, bt)
        rec[18 * g : 18 * g + 18] = z[:18] + prev
        prev = z[18:]
    np.testing.assert_allclose(
        rec[18:108], 9.0 * sig[18:108], rtol=1e-9, atol=1e-9
    )


def test_alias_butterflies_match_scalar():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(576)
    y = S.alias_reduce(x, 32)
    ci = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
    for sb in (1, 5, 31):
        for i in range(8):
            cs = 1 / np.sqrt(1 + ci[i] ** 2)
            ca = ci[i] * cs
            lo, hi = x[18 * sb - 1 - i], x[18 * sb + i]
            assert abs(y[18 * sb - 1 - i] - (lo * cs - hi * ca)) < 1e-12
            assert abs(y[18 * sb + i] - (hi * cs + lo * ca)) < 1e-12
    # untouched positions
    assert y[9] == x[9]
    # mixed blocks: only the 0|1 boundary
    ym = S.alias_reduce(x, 2)
    assert ym[18 * 2 + 0] == x[18 * 2 + 0]
    assert ym[18 * 1 + 0] != x[18 * 1 + 0]


def test_reorder_short_is_a_permutation():
    x = np.arange(576, dtype=float)
    y = S.reorder_short(x)
    assert sorted(y.tolist()) == sorted(x.tolist())
    # band 0 (width 4): subband 0 gets window-major 6-blocks
    # f=0..5 from windows 0..2: position 18*0 + 6*w + f
    assert y[0] == 0.0  # band0 w0 j0 -> f0 w0
    assert y[6] == 4.0  # band0 w1 j0 (src 3*0 + 1*4 + 0)
    # mixed: first 36 lines untouched
    ym = S.reorder_short(x, mixed=True)
    np.testing.assert_array_equal(ym[:36], x[:36])


def test_frequency_inversion_and_state():
    rng = np.random.default_rng(5)
    st = S.HybridState()
    xr = rng.standard_normal(576)
    out1 = S.hybrid_granule(xr, st, 0)
    assert out1.shape == (18, 32)
    # odd subband, odd sample must equal the negated raw overlap-add
    st2 = S.HybridState()
    x2 = S.alias_reduce(xr, 32)
    z = S.imdct_windowed(x2[18 : 36], 0)
    assert abs(out1[1, 1] + z[1]) < 1e-12  # prev was zero
    # second granule uses the stored tail
    xr2 = rng.standard_normal(576)
    out2 = S.hybrid_granule(xr2, st, 0)
    x2b = S.alias_reduce(xr2, 32)
    z2 = S.imdct_windowed(x2b[:18], 0)
    zprev = S.imdct_windowed(S.alias_reduce(xr, 32)[:18], 0)
    assert abs(out2[0, 0] - (z2[0] + zprev[18])) < 1e-12


def test_polyphase_gate():
    with pytest.raises(NotImplementedError, match="Table B.3"):
        S.synthesize_pcm(np.zeros((18, 32)))
