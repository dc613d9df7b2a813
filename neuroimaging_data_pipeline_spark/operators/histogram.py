"""Binned histogram aggregation (SURVEY.md A5).

Reference: ``geom_histogram(binwidth=5)`` over per-subject motion
outlier counts (fmriprep_motion_hist.R:43-44).

One groupBy on the bin expression — a single map-side-combined shuffle
of at most n_bins rows per partition, scale-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    col: str | Column,
    binwidth: float,
    origin: float = 0.0,
) -> DataFrame:
    """Count rows per fixed-width bin. Returns (bin_start, n) with
    bin_start = origin + floor((x-origin)/binwidth)*binwidth."""
    c = F.col(col) if isinstance(col, str) else col
    bin_start = (
        F.floor((c - F.lit(origin)) / F.lit(binwidth)) * F.lit(binwidth)
        + F.lit(origin)
    ).alias("bin_start")
    return (
        df.select(bin_start)
        .groupBy("bin_start")
        .agg(F.count(F.lit(1)).alias("n"))
    )
