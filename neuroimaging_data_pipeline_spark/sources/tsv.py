"""TSV ingestion (SURVEY.md S1, S2, D5).

Reference: ``pd.read_csv(path, sep='\\t')`` (ssm_loop.py:41,72) and
``read.table(sep='\\t', header=TRUE, na.strings='n/a')``
(fmriprep_motion_hist.R:29). fmriprep confounds TSVs have *dynamic*
schemas — a variable number of ``motion_outlierNN`` columns per file —
so the long-format normalization at the ingest boundary (SURVEY.md
§7.4#2) happens here: per-file dynamic columns never leak inward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    null_value: str = "n/a",
) -> DataFrame:
    """TSV with header; BIDS spells nulls 'n/a'. One file or a glob —
    a glob read is the distributed replacement for the reference's
    per-subject read loop (fmriprep_motion_hist.R:21-38)."""
    reader = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("nullValue", null_value)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path).withColumn("_src", F.input_file_name())


def unpivot_confounds(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Wide dynamic-schema confounds -> long (id..., name, value).

    ``value_cols`` defaults to every non-id column. Uses the built-in
    ``unpivot`` (melt) — a narrow transformation, no shuffle.
    """
    value_cols = value_cols or [c for c in df.columns if c not in id_cols]
    casted = df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in value_cols]
    )
    return casted.unpivot(id_cols, value_cols, "name", "value")
