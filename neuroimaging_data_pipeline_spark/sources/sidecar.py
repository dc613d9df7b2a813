"""JSON sidecar metadata (SURVEY.md S4, S10, F5).

Reference: ``layout.get_tr(task='MID')`` reads RepetitionTime from a
sidecar (ssm_loop.py:39,74); ``jq '.TaskName="rest"' | sponge``
mutates a sidecar in place (preprocess_parallel.sh:109-116).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_sidecars(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read sidecar JSONs (one object per file) into a small dim table
    with the source path attached."""
    return spark.read.option("multiLine", True).json(path_glob).withColumn(
        "_src", F.input_file_name()
    )


def get_scalar(sidecars: DataFrame, field: str, **filters) -> float | str | None:
    """``layout.get_tr()`` analog: filter the dim, take the field of the
    first row. Small-dim collect is intentional."""
    df = sidecars
    for k, v in filters.items():
        df = df.filter(F.col(k) == v)
    row = df.select(field).first()
    return None if row is None else row[0]


def update_sidecar_field(
    sidecars: DataFrame, field: str, value
) -> DataFrame:
    """S10: set a metadata field across the selected sidecars; caller
    writes the result back (engine canonicalizes to a write, not an
    in-place mutate — Delta MERGE would be the mutation-in-place
    equivalent on a real deployment)."""
    return sidecars.withColumn(field, F.lit(value))
