"""E1 golden pipeline (SURVEY.md §5.2#3): the full ssm_loop chain —
events -> boxcar -> HRF convolve -> DCT + intercept -> 24 motion
covariates -> nuisance zscore -> mass OLS — on a mini-subject fixture,
with betas checked voxel-by-voxel against numpy lstsq on the SAME
collected design."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from neuroimaging_data_pipeline_spark import GLMPipeline
from tests.conftest import N_TR, RUNS, SUBJECTS, TR

N_VOX = 30


@pytest.fixture(scope="module")
def glm(spark, runs_dim, mid_events, confounds):
    return (
        GLMPipeline(spark, runs_dim, n_tr=N_TR, tr=TR)
        .from_events(mid_events, ["Big", "Small"])
        .convolve_hrf(length_s=24.0)
        .add_dct(cutoff_s=40.0)
        .add_poly(order=0)
        .add_motion(confounds)
        .add_nuisance(confounds, ["csf", "white_matter"], ddof=0)
    )


def test_design_shape_and_columns(glm):
    dm = glm.design().toPandas()
    # one row per (subject, run, t)
    assert len(dm) == len(SUBJECTS) * len(RUNS) * N_TR
    # 2 task _c0 + 5 cosine (floor(2*50*2/40)) + 1 poly + 24 motion + 2 nuisance
    assert glm.regressors == (
        ["Big_c0", "Small_c0"]
        + [f"cosine_{i}" for i in range(1, 6)]
        + ["poly_0"]
        + [
            f"{p}{s}"
            for p in ["trans_x", "trans_y", "trans_z", "rot_x", "rot_y", "rot_z"]
            for s in ("_z", "_z_sq", "_z_d", "_z_d_sq")
        ]
        + ["csf_z", "white_matter_z"]
    )
    assert set(glm.regressors) <= set(dm.columns)
    # intercept is constant 1; boxcar-convolved cols are finite
    assert (dm["poly_0"] == 1.0).all()
    assert np.isfinite(dm[glm.regressors].to_numpy()).all()


@pytest.fixture(scope="module")
def planted_long(spark, glm, rng):
    """Synthesize voxel series from the REAL design: y = X @ beta + eps."""
    dm = glm.design().toPandas().sort_values(["subject", "run", "t"])
    frames = []
    self_betas = {}
    for (s, r), g in dm.groupby(["subject", "run"]):
        X = g[glm.regressors].to_numpy(dtype=np.float64)
        beta = rng.normal(0, 2, (X.shape[1], N_VOX))
        Y = X @ beta + rng.normal(0, 0.25, (X.shape[0], N_VOX))
        self_betas[(s, r)] = beta
        for v in range(N_VOX):
            frames.append(
                pd.DataFrame(
                    {
                        "subject": s,
                        "run": r,
                        "t": g["t"].to_numpy(),
                        "voxel_id": v,
                        "value": Y[:, v],
                    }
                )
            )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True)), self_betas


def test_regress_matches_numpy_lstsq(spark, glm, planted_long):
    values, _ = planted_long
    stats = glm.regress(values).toPandas()
    dm = glm.design().toPandas().sort_values(["subject", "run", "t"])
    vals = values.toPandas()
    n_checked = 0
    for (s, r), g in dm.groupby(["subject", "run"]):
        X = g[glm.regressors].to_numpy(dtype=np.float64)
        for v in [0, 7, 19]:
            y = (
                vals[(vals.subject == s) & (vals.run == r) & (vals.voxel_id == v)]
                .sort_values("t")["value"]
                .to_numpy()
            )
            expect, *_ = np.linalg.lstsq(X, y, rcond=None)
            got = (
                stats[
                    (stats.subject == s)
                    & (stats.run == r)
                    & (stats.voxel_id == v)
                ]
                .set_index("regressor")
                .loc[glm.regressors, "beta"]
                .to_numpy()
            )
            np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)
            n_checked += 1
    assert n_checked == len(SUBJECTS) * len(RUNS) * 3


def test_regress_recovers_planted_betas(glm, planted_long):
    """Low-noise synthesis: fitted betas sit near the planted ones."""
    values, self_betas = planted_long
    stats = glm.regress(values).toPandas()
    (s, r) = next(iter(self_betas))
    beta = self_betas[(s, r)]
    got = (
        stats[(stats.subject == s) & (stats.run == r) & (stats.voxel_id == 0)]
        .set_index("regressor")
        .loc[glm.regressors, "beta"]
        .to_numpy()
    )
    resid = np.abs(got - beta[:, 0])
    assert np.median(resid) < 0.5
