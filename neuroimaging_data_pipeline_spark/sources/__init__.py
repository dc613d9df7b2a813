from neuroimaging_data_pipeline_spark.sources.rules import read_dcm2bids_rules
from neuroimaging_data_pipeline_spark.sources.sidecar import (
    read_sidecars,
    update_sidecar_field,
)
from neuroimaging_data_pipeline_spark.sources.tsv import read_tsv, unpivot_confounds

__all__ = [
    "read_tsv",
    "unpivot_confounds",
    "read_sidecars",
    "update_sidecar_field",
    "read_dcm2bids_rules",
]
