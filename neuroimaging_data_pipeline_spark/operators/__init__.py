from neuroimaging_data_pipeline_spark.operators.design import (
    onsets_to_design,
    tr_grid,
)
from neuroimaging_data_pipeline_spark.operators.histogram import histogram
from neuroimaging_data_pipeline_spark.operators.mask import (
    apply_mask,
    binarize,
    isin_label_mask,
)
from neuroimaging_data_pipeline_spark.operators.ols import (
    mass_ols,
    ols_normal_equations_sql,
)
from neuroimaging_data_pipeline_spark.operators.rulejoin import classify_first_match
from neuroimaging_data_pipeline_spark.operators.smooth import gaussian_smooth
from neuroimaging_data_pipeline_spark.operators.stencil import (
    mode_filter,
    neighborhood_join,
    stencil_offsets,
)

__all__ = [
    "tr_grid",
    "onsets_to_design",
    "histogram",
    "binarize",
    "isin_label_mask",
    "apply_mask",
    "mass_ols",
    "ols_normal_equations_sql",
    "classify_first_match",
    "gaussian_smooth",
    "mode_filter",
    "neighborhood_join",
    "stencil_offsets",
]
