"""Fluent pipeline API — the engine's E1 entry point (SURVEY.md §3).

The reference's flagship program is a chain (ssm_loop.py:41-91):

    onsets -> onsets_to_dm -> convolve -> add_dct_basis -> add_poly
    -> [motion zscore/diff/square, spikes, csf/wm zscore] -> concat
    -> smooth -> regress

``GLMPipeline`` mirrors that chain 1:1 as a builder over lazy
DataFrames — nothing executes until ``.design()`` / ``.regress()`` is
acted on, so Catalyst sees the whole pipeline as ONE plan (the
reference materializes every step eagerly in pandas; here pushdown,
pruning and common-subexpression reuse span the full chain).

    glm = (GLMPipeline(spark, runs, n_tr=296, tr=2.0)
           .from_events(events, ["Big", "Small"])
           .convolve_hrf()
           .add_dct(cutoff_s=220.0)
           .add_poly(order=0)
           .add_motion(confounds)
           .add_nuisance(confounds, ["csf", "white_matter"]))
    stats = glm.regress(bold_long)     # (subject, run, voxel_id, regressor, beta, t, p, df, sigma)

The cohort dimension is just more rows in ``runs`` — the reference's
per-subject scheduler (``sub=os.environ['sub']``, ssm_loop.py:28)
disappears into partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from neuroimaging_data_pipeline_spark.functions.basis import (
    add_dct_basis,
    add_poly,
    n_dct_basis,
)
from neuroimaging_data_pipeline_spark.functions.convolve import (
    double_gamma_hrf,
    fir_convolve,
)
from neuroimaging_data_pipeline_spark.functions.timeseries import (
    motion_covariates_24,
    spike_regressors,
    zscore,
)
from neuroimaging_data_pipeline_spark.operators.design import (
    onsets_to_design,
    tr_grid,
)

_MOTION_PARAMS = ["trans_x", "trans_y", "trans_z", "rot_x", "rot_y", "rot_z"]
KEYS = ["subject", "run"]


class GLMPipeline:
    """Builder for the single-subject (or whole-cohort) GLM design and
    mass-OLS fit. Each method returns ``self``; ``regressors`` tracks
    the accumulated design columns in order."""

    def __init__(
        self, spark: SparkSession, runs: DataFrame, n_tr: int, tr: float
    ) -> None:
        self.spark = spark
        self.runs = runs
        self.n_tr = int(n_tr)
        self.tr = float(tr)
        self._dm = tr_grid(spark, runs, self.n_tr, self.tr)
        self.regressors: list[str] = []
        self._task_cols: list[str] = []

    # -- task regressors ----------------------------------------------------
    def from_events(
        self, events: DataFrame, trial_types: list[str]
    ) -> "GLMPipeline":
        """Interval events -> boxcar columns (onsets_to_dm, J2+pivot)."""
        self._dm = onsets_to_design(self._dm, events, trial_types, keys=KEYS)
        self._task_cols = list(trial_types)
        self.regressors += list(trial_types)
        return self

    def convolve_hrf(self, length_s: float = 32.0) -> "GLMPipeline":
        """Task boxcars (x) double-gamma HRF; replaces the raw boxcars
        with ``_c0`` columns in the design (dm.convolve, ssm_loop.py:54)."""
        kernel = double_gamma_hrf(self.tr, length_s=length_s)
        self._dm = fir_convolve(self._dm, self._task_cols, kernel, keys=KEYS)
        self.regressors = [
            (c + "_c0") if c in self._task_cols else c for c in self.regressors
        ]
        return self

    # -- drift / baseline ---------------------------------------------------
    def add_dct(self, cutoff_s: float = 220.0) -> "GLMPipeline":
        """High-pass DCT basis ``cosine_*`` (add_dct_basis, ssm_loop.py:55)."""
        self._dm = add_dct_basis(self._dm, self.n_tr, self.tr, cutoff_s=cutoff_s)
        k = n_dct_basis(self.n_tr, self.tr, cutoff_s)
        self.regressors += [f"cosine_{i}" for i in range(1, k + 1)]
        return self

    def add_poly(self, order: int = 0) -> "GLMPipeline":
        """Intercept + polynomial drift ``poly_*`` (add_poly, ssm_loop.py:56)."""
        self._dm = add_poly(self._dm, self.n_tr, order=order)
        self.regressors += [f"poly_{p}" for p in range(0, order + 1)]
        return self

    # -- confounds ----------------------------------------------------------
    def add_motion(
        self, confounds: DataFrame, params: list[str] | None = None
    ) -> "GLMPipeline":
        """The 24-regressor motion block {z, z², Δz, Δz²} x 6 params,
        aligned-concat (J1) onto the design (ssm_loop.py:46-50,85)."""
        params = params or _MOTION_PARAMS
        mc = motion_covariates_24(
            confounds.select(*KEYS, "t", *params), params=params, keys=KEYS
        )
        new = [
            f"{p}{s}" for p in params for s in ("_z", "_z_sq", "_z_d", "_z_d_sq")
        ]
        self._dm = self._dm.join(
            mc.select(*KEYS, "t", *new), on=[*KEYS, "t"], how="inner"
        )
        self.regressors += new
        return self

    def add_nuisance(
        self, confounds: DataFrame, cols: list[str], ddof: int = 0
    ) -> "GLMPipeline":
        """z-scored nuisance series (csf / white_matter; scipy ddof=0
        convention at ssm_loop.py:81-82), aligned-concat onto the design."""
        z = zscore(confounds.select(*KEYS, "t", *cols), cols, keys=KEYS, ddof=ddof)
        named = z.select(
            *KEYS, "t", *[z[c].alias(f"{c}_z") for c in cols]
        )
        self._dm = self._dm.join(named, on=[*KEYS, "t"], how="inner")
        self.regressors += [f"{c}_z" for c in cols]
        return self

    def add_spikes(self, spike_ts: list[int]) -> "GLMPipeline":
        """One-hot spike regressors for flagged TRs (W7, ssm_loop.py:77-84)."""
        self._dm = spike_regressors(self._dm, spike_ts)
        self.regressors += [f"spike_{k:02d}" for k in spike_ts]
        return self

    # -- outputs ------------------------------------------------------------
    def design(self) -> DataFrame:
        """The assembled design matrix: (subject, run, t, regressors...)."""
        return self._dm.select(*KEYS, "t", *self.regressors)

    def regress(self, values: DataFrame, **mass_ols_kwargs) -> DataFrame:
        """Mass-univariate OLS of every voxel series in ``values``
        (subject, run, t, voxel_id, value) against the built design —
        the stats bundle D8 (beta, t, p, df, sigma per regressor/voxel)."""
        from neuroimaging_data_pipeline_spark.operators.ols import mass_ols

        return mass_ols(
            values, self.design(), self.regressors, keys=KEYS, **mass_ols_kwargs
        )
