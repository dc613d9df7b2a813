"""Per-series window functions over the ordered TR axis (SURVEY.md §2.5).

All are pure Column/DataFrame compositions of built-in functions —
JVM-side, whole-stage-codegen friendly. The partition keys default to
(subject, run) mirroring the reference's unit of independence
(one process per subject, ssm_loop.py:28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _part(keys: list[str]) -> Window:
    return Window.partitionBy(*keys)


def _ordered(keys: list[str], order: str) -> Window:
    return Window.partitionBy(*keys).orderBy(order)


def zscore(
    df: DataFrame,
    cols: list[str],
    keys: list[str] | None = None,
    ddof: int = 1,
    suffix: str = "",
) -> DataFrame:
    """(x - mean)/sd per partition. W1.

    ``ddof`` is exposed because the reference mixes conventions:
    nltools zscore (ssm_loop.py:47) is pandas ddof=1, scipy
    (ssm_loop.py:81) is ddof=0 (SURVEY.md §7.4#4). ddof=1 ->
    ``stddev_samp``, ddof=0 -> ``stddev_pop``.
    """
    keys = keys if keys is not None else ["subject", "run"]
    w = _part(keys) if keys else Window.partitionBy(F.lit(1))
    sd = F.stddev_samp if ddof == 1 else F.stddev_pop
    out = df
    for c in cols:
        # try_divide: a constant series has sd=0; pandas/scipy zscore
        # yields NaN there, ANSI Spark would throw — null matches the
        # reference's propagate-NaN behavior.
        out = out.withColumn(
            c + suffix,
            F.try_divide(F.col(c) - F.avg(c).over(w), sd(F.col(c)).over(w)),
        )
    return out


def diff(
    df: DataFrame,
    cols: list[str],
    keys: list[str] | None = None,
    order: str = "t",
    fill: float | None = 0.0,
    suffix: str = "_d",
) -> DataFrame:
    """First difference x_t - x_{t-1} per partition, ordered. W2 (+P9 fill).

    The leading row has no predecessor; the reference does
    ``diff().fillna(0)`` (ssm_loop.py:48-49), so ``fill=0.0`` default.
    """
    keys = keys if keys is not None else ["subject", "run"]
    w = _ordered(keys, order)
    out = df
    for c in cols:
        d = F.col(c) - F.lag(c, 1).over(w)
        if fill is not None:
            d = F.coalesce(d, F.lit(float(fill)))
        out = out.withColumn(c + suffix, d)
    return out


def motion_covariates_24(
    df: DataFrame,
    params: list[str] | None = None,
    keys: list[str] | None = None,
    order: str = "t",
) -> DataFrame:
    """The 24-regressor motion block: {z, z^2, dz, dz^2} per param. W1-W3.

    Mirrors ssm_loop.py:46-50: zscore (ddof=1) -> diff -> square ->
    fillna(0). Output columns: p_z, p_z_sq, p_z_d, p_z_d_sq for each
    motion parameter p.
    """
    params = params or ["trans_x", "trans_y", "trans_z", "rot_x", "rot_y", "rot_z"]
    keys = keys if keys is not None else ["subject", "run"]
    out = zscore(df, params, keys=keys, ddof=1, suffix="_z")
    zcols = [p + "_z" for p in params]
    out = diff(out, zcols, keys=keys, order=order, fill=0.0, suffix="_d")
    for p in params:
        out = out.withColumn(p + "_z_sq", F.pow(F.col(p + "_z"), 2))
        out = out.withColumn(p + "_z_d_sq", F.pow(F.col(p + "_z_d"), 2))
    return out


def spike_regressors(
    df: DataFrame,
    spike_ts: list[int],
    t_col: str = "t",
    prefix: str = "spike_",
) -> DataFrame:
    """One-hot column per flagged TR. W7 (ssm_loop.py:77-84 reuses
    fmriprep's motion_outlierNN columns; engine-side generation from a
    flag list)."""
    out = df
    for k in spike_ts:
        out = out.withColumn(
            f"{prefix}{k:02d}",
            F.when(F.col(t_col) == F.lit(k), 1.0).otherwise(0.0),
        )
    return out
