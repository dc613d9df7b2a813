"""PySpark-native analytics engine with the capabilities of
arianayoum/neuroimaging-data-pipeline (see SURVEY.md).

The engine is a *library* of pure DataFrame -> DataFrame functions
(SURVEY.md §7.1): every operator from the reference's dataflow is
re-expressed Spark-first on the DataFrame/SQL API, letting Catalyst/
Tungsten/AQE do the physical planning the reference did by hand
(xargs -P 4, manual memory budgets — SURVEY.md §4.1).
"""

from neuroimaging_data_pipeline_spark.api import GLMPipeline
from neuroimaging_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["GLMPipeline", "get_spark", "stop_spark"]

__version__ = "0.1.0"
