from neuroimaging_data_pipeline_spark.functions.basis import (
    add_dct_basis,
    add_poly,
)
from neuroimaging_data_pipeline_spark.functions.convolve import (
    double_gamma_hrf,
    fir_convolve,
)
from neuroimaging_data_pipeline_spark.functions.timeseries import (
    diff,
    motion_covariates_24,
    spike_regressors,
    zscore,
)

__all__ = [
    "zscore",
    "diff",
    "motion_covariates_24",
    "spike_regressors",
    "double_gamma_hrf",
    "fir_convolve",
    "add_dct_basis",
    "add_poly",
]
