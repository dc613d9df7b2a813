"""Gaussian spatial smoothing (SURVEY.md W8).

Reference: ``data.smooth(fwhm=4)`` (ssm_loop.py:88-89) — 3-D Gaussian
blur applied per TR across voxel space.

Spark-first: the spatial analog of FIR convolution — a neighborhood
join against a broadcast Gaussian-weight offset table, then a
normalized weighted average per (t, voxel):

    smoothed(v,t) = sum_n w(d(v,n)) * value(n,t) / sum_n w(d(v,n))

The kernel is truncated at ``radius`` voxels (weights < ~1e-3 of center
contribute nothing at fMRI FWHMs). Normalizing by the *present*
neighbors' weight sum reproduces nilearn's masked-smoothing edge
behavior: voxels outside the mask simply don't contribute.

Scale: weight table is O(radius^3) rows (~27-125) — broadcast; the
big join is coordinates-equi, co-located under block bucketing. The
separable 3x1-D variant (3 passes) is the constant-factor optimization
if bench demands (SURVEY.md W8 note).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FWHM_TO_SIGMA = 1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))  # 1/2.3548


def gaussian_offsets(
    spark: SparkSession,
    fwhm_vox: float,
    radius: int | None = None,
) -> DataFrame:
    """Broadcastable (dx, dy, dz, w) table for a truncated 3-D Gaussian."""
    sigma = fwhm_vox * FWHM_TO_SIGMA
    if radius is None:
        radius = max(1, int(math.ceil(2.0 * sigma)))
    rows = []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            for dz in range(-radius, radius + 1):
                d2 = dx * dx + dy * dy + dz * dz
                w = math.exp(-d2 / (2.0 * sigma * sigma))
                rows.append((dx, dy, dz, w))
    return spark.createDataFrame(rows, "dx int, dy int, dz int, w double")


def gaussian_smooth(
    values: DataFrame,
    voxel_dim: DataFrame,
    weights: DataFrame,
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Smooth (…, t, voxel_id, value) over space.

    values:    (subject, run, t, voxel_id, value) — long fact table
    voxel_dim: (voxel_id, x, y, z) — broadcastable dimension
    weights:   gaussian_offsets() output
    """
    dim = F.broadcast(voxel_dim.select("voxel_id", "x", "y", "z"))
    keyed = values.join(dim, on="voxel_id")
    group_keys = [c for c in values.columns if c not in (value_col, "voxel_id")]
    # target voxel t sees source voxel s at offset (dx,dy,dz):
    # x_t = x_s + dx. Probe from the *source* side so each fact row
    # fans out once per offset, then regroup on target coords.
    fanned = keyed.join(F.broadcast(weights)).select(
        *group_keys,
        (F.col("x") + F.col("dx")).alias("tx"),
        (F.col("y") + F.col("dy")).alias("ty"),
        (F.col("z") + F.col("dz")).alias("tz"),
        (F.col(value_col) * F.col("w")).alias("wv"),
        F.col("w"),
    )
    target = F.broadcast(
        voxel_dim.select(
            F.col("voxel_id"),
            F.col("x").alias("tx"),
            F.col("y").alias("ty"),
            F.col("z").alias("tz"),
        )
    )
    return (
        fanned.join(target, on=["tx", "ty", "tz"], how="inner")
        .groupBy(*group_keys, "voxel_id")
        .agg((F.sum("wv") / F.sum("w")).alias(value_col))
    )


def gaussian_offsets_1d(
    spark: SparkSession,
    fwhm_vox: float,
    radius: int | None = None,
) -> DataFrame:
    """1-D truncated Gaussian taps (d, w) — one axis of the separable
    kernel. The 3-D cube kernel factors exactly:
    exp(-(dx²+dy²+dz²)/2σ²) = w1(dx)·w1(dy)·w1(dz)."""
    sigma = fwhm_vox * FWHM_TO_SIGMA
    if radius is None:
        radius = max(1, int(math.ceil(2.0 * sigma)))
    rows = [
        (d, math.exp(-(d * d) / (2.0 * sigma * sigma)))
        for d in range(-radius, radius + 1)
    ]
    return spark.createDataFrame(rows, "d int, w double")


def gaussian_smooth_separable(
    values: DataFrame,
    voxel_dim: DataFrame,
    weights_1d: DataFrame,
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Separable Gaussian smoothing: three 1-D passes (x, y, z).

    Identical results to :func:`gaussian_smooth` (same truncated cube
    kernel; the masked-edge normalization is reproduced by smoothing an
    indicator column through the same passes and dividing), but the
    per-row fan-out is 3·(2r+1) instead of (2r+1)³ — at fwhm 4 mm /
    radius 2 that is 15× less intermediate data than 125×; at cluster
    scale this is the difference between a shuffle that fits and one
    that doesn't. Each pass is a broadcast kernel join + regroup on
    coordinates, all co-located under spatial bucketing.
    """
    k = F.broadcast(weights_1d)
    dim = F.broadcast(voxel_dim.select("voxel_id", "x", "y", "z"))
    group_keys = [c for c in values.columns if c not in (value_col, "voxel_id")]
    cur = values.join(dim, on="voxel_id").select(
        *group_keys,
        "x",
        "y",
        "z",
        F.col(value_col).alias("_wv"),
        F.lit(1.0).alias("_wn"),
    )
    for axis in ("x", "y", "z"):
        fanned = cur.join(k).select(
            *group_keys,
            *[
                (F.col(a) + F.col("d")).alias(a) if a == axis else F.col(a)
                for a in ("x", "y", "z")
            ],
            (F.col("_wv") * F.col("w")).alias("_wv"),
            (F.col("_wn") * F.col("w")).alias("_wn"),
        )
        cur = fanned.groupBy(*group_keys, "x", "y", "z").agg(
            F.sum("_wv").alias("_wv"), F.sum("_wn").alias("_wn")
        )
    return (
        cur.join(dim, on=["x", "y", "z"], how="inner")
        .select(
            *group_keys,
            "voxel_id",
            F.try_divide(F.col("_wv"), F.col("_wn")).alias(value_col),
        )
    )
