"""Design-matrix core: grid, interval->grid alignment (J2), FIR
convolution (W4), DCT/poly basis (W5/W6) — numpy cross-checked
(SURVEY.md §5.2#2)."""

from __future__ import annotations

import math

import numpy as np

from neuroimaging_data_pipeline_spark.functions.basis import (
    add_dct_basis,
    add_poly,
    n_dct_basis,
)
from neuroimaging_data_pipeline_spark.functions.convolve import (
    double_gamma_hrf,
    fir_convolve,
)
from neuroimaging_data_pipeline_spark.operators.design import (
    onsets_to_design,
    tr_grid,
)
from tests.conftest import N_TR, TR


def test_tr_grid_shape(spark, runs_dim):
    g = tr_grid(spark, runs_dim, N_TR, TR)
    assert g.count() == 2 * 2 * N_TR
    row = g.filter("subject='sub-001' and run=1 and t=3").first()
    assert row["t_sec"] == 3 * TR


def test_onsets_to_design_boxcar(spark, runs_dim, mid_events, mid_events_pdf):
    g = tr_grid(spark, runs_dim, N_TR, TR)
    dm = onsets_to_design(g, mid_events, ["Big", "Small"])
    assert dm.count() == 2 * 2 * N_TR
    pdf = (
        dm.filter("subject='sub-001' and run=1")
        .orderBy("t")
        .toPandas()
    )
    # numpy oracle: boxcar from the raw events
    ev = mid_events_pdf.query("subject=='sub-001' and run==1")
    for tt in ["Big", "Small"]:
        expect = np.zeros(N_TR)
        for _, e in ev[ev.trial_type == tt].iterrows():
            for t in range(N_TR):
                if e.onset <= t * TR < e.onset + e.duration:
                    expect[t] = 1.0
        np.testing.assert_allclose(pdf[tt].to_numpy(), expect)


def test_fir_convolve_matches_numpy(spark, runs_dim, mid_events):
    g = tr_grid(spark, runs_dim, N_TR, TR)
    dm = onsets_to_design(g, mid_events, ["Big", "Small"])
    kernel = double_gamma_hrf(TR)
    conv = fir_convolve(dm, ["Big", "Small"], kernel)
    pdf = conv.filter("subject='sub-002' and run=2").orderBy("t").toPandas()
    for tt in ["Big", "Small"]:
        x = pdf[tt].to_numpy()
        expect = np.convolve(x, np.array(kernel))[:N_TR]
        np.testing.assert_allclose(pdf[tt + "_c0"].to_numpy(), expect, atol=1e-12)


def test_hrf_kernel_properties():
    k = np.array(double_gamma_hrf(2.0))
    assert len(k) == 16
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-12)
    assert k.argmax() == 3  # peak ~6 s at TR=2


def test_dct_poly_basis(spark, runs_dim):
    g = tr_grid(spark, runs_dim, N_TR, TR)
    k = n_dct_basis(N_TR, TR, 220.0)
    assert k == math.floor(2 * N_TR * TR / 220.0)
    out = add_poly(add_dct_basis(g, N_TR, TR, 220.0), N_TR, order=2)
    pdf = out.filter("subject='sub-001' and run=1").orderBy("t").toPandas()
    t = np.arange(N_TR)
    for f_idx in range(1, k + 1):
        expect = np.cos(math.pi * f_idx * (2 * t + 1) / (2 * N_TR))
        np.testing.assert_allclose(pdf[f"cosine_{f_idx}"], expect, atol=1e-12)
    np.testing.assert_allclose(pdf["poly_0"], 1.0)
    half = (N_TR - 1) / 2
    np.testing.assert_allclose(pdf["poly_2"], ((t - half) / half) ** 2, atol=1e-12)
