"""Data-driven spike detection (nltools ``find_spikes`` parity).

Reference: imported at ``ssm_loop.py:20`` and discussed in
``MID_subject_model_Feb2024.ipynb`` (cell 32, global-signal diagnostic
at ipynb:1451) but never called in the batch path — the engine provides
it anyway so the full notebook QA loop can run: flag timepoints whose
global signal (mean over voxels), or whose frame-to-frame global-signal
difference, z-scores beyond a cutoff. Flagged timepoints become one-hot
spike regressors (W7) — mathematically equivalent to censoring those
TRs inside the GLM.

Scale shape: one keyed aggregate to the per-timepoint global signal
(rows collapse voxels -> timepoints, so everything after the first agg
is tiny), then per-series windows partitioned by the series keys —
no global sort, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def find_spikes(
    df: DataFrame,
    keys: list[str],
    time_col: str = "t",
    value_col: str = "value",
    global_cutoff: float = 3.0,
    diff_cutoff: float = 3.0,
) -> DataFrame:
    """Per (keys..., timepoint): global mean, its z-score, the
    frame-difference z-score, and the spike flags.

    ``keys`` partition the series (subject/run in the reference; any
    grouping at scale) — windows never cross series, so the plan stays
    partition-parallel.
    """
    # Order-independent mean: double summation order differs between
    # partial-agg trees (and engines), and a 1-ulp difference can land
    # exactly on a rounding boundary downstream. Exact decimal SUM is
    # associative-exact, so the mean is bit-stable at any parallelism.
    gs = df.groupBy(*keys, time_col).agg(
        F.try_divide(
            F.sum(F.col(value_col).cast("decimal(28,10)")).cast("double"),
            F.count(F.lit(1)).cast("double"),
        ).alias("global_mean")
    )
    w = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy(time_col)
    with_diff = gs.select(
        *keys,
        time_col,
        "global_mean",
        (F.col("global_mean") - F.lag("global_mean", 1).over(wo)).alias(
            "_diff"
        ),
    )
    scored = with_diff.select(
        *keys,
        time_col,
        "global_mean",
        F.try_divide(
            F.col("global_mean") - F.avg("global_mean").over(w),
            F.stddev_samp("global_mean").over(w),
        ).alias("gs_z"),
        F.try_divide(
            F.col("_diff") - F.avg("_diff").over(w),
            F.stddev_samp("_diff").over(w),
        ).alias("diff_z"),
    )
    return scored.select(
        *keys,
        time_col,
        "global_mean",
        "gs_z",
        "diff_z",
        F.coalesce(
            (F.abs(F.col("gs_z")) > global_cutoff).cast("int"), F.lit(0)
        ).alias("spike_global"),
        F.coalesce(
            (F.abs(F.col("diff_z")) > diff_cutoff).cast("int"), F.lit(0)
        ).alias("spike_diff"),
    )


def spike_regressors(
    spikes: DataFrame,
    keys: list[str],
    time_col: str = "t",
) -> DataFrame:
    """W7 one-hot construction from flagged timepoints: for each series,
    spike k becomes a column that is 1 at its timepoint and 0 elsewhere
    (long form: (keys..., t, spike_idx, v) — pivot at the call site if a
    wide design matrix is needed)."""
    flagged = spikes.filter(
        (F.col("spike_global") == 1) | (F.col("spike_diff") == 1)
    ).select(*keys, F.col(time_col).alias("_spike_t"))
    wo = Window.partitionBy(*keys).orderBy("_spike_t")
    numbered = flagged.select(
        *keys, "_spike_t", F.row_number().over(wo).alias("spike_idx")
    )
    grid = spikes.select(*keys, time_col)
    return grid.join(numbered, on=keys).select(
        *keys,
        time_col,
        "spike_idx",
        (F.col(time_col) == F.col("_spike_t")).cast("int").alias("v"),
    )
