"""Spatial-operator coverage (SURVEY.md J4/A8/W9, W8, J5, A3) on a
deterministic synthetic voxel volume derived from the ``part`` table.

The volume is a bijection p_partkey -> (x, y, z) on a 16 x 16 x N grid
(the driver's tables are the only allowed inputs, so the voxel plane is
*derived*, identically in both engines):

    voxel_id = p_partkey
    x = p_partkey % 16, y = (p_partkey / 16) % 16, z = p_partkey / 256
    label = p_size % 7             (aseg-like small label alphabet)
    value = p_retailprice / 1000   (kept O(1) so round-6 hashing is
                                    immune to summation-order noise)

Each query drives the real engine operator (operators/stencil.py,
operators/smooth.py) — the SQL oracle re-derives the same semantics
relationally.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.smooth import (
    FWHM_TO_SIGMA,
    gaussian_offsets,
    gaussian_smooth,
)
from neuroimaging_data_pipeline_spark.operators.stencil import (
    _OFFSETS_19,
    mode_filter,
    stencil_offsets,
)
from neuroimaging_data_pipeline_spark.sources.tables import read_table


def _volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(voxel_id, x, y, z, label, value) derived from part."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("voxel_id"),
        (F.col("p_partkey") % 16).alias("x"),
        (F.floor(F.col("p_partkey") / 16) % 16).alias("y"),
        F.floor(F.col("p_partkey") / 256).alias("z"),
        (F.col("p_size") % 7).cast("long").alias("label"),
        (F.round(F.col("p_retailprice") / 1000.0, 6) + F.lit(0.0)).alias("value"),
    )


_VOLUME_SQL = """
  SELECT p_partkey AS voxel_id,
         p_partkey % 16 AS x,
         CAST(FLOOR(p_partkey / 16.0) AS BIGINT) % 16 AS y,
         CAST(FLOOR(p_partkey / 256.0) AS BIGINT) AS z,
         CAST(p_size % 7 AS BIGINT) AS label,
         (ROUND(p_retailprice / 1000.0, 6) + 0.0) AS value
  FROM part
"""


# --- J4 + A8: 19-neighbor stencil mode filter --------------------------------

def j4_stencil_mode(spark, sf_dir):
    """J4+A8: the reference's 19-neighbor ``hmode`` majority filter
    (preprocess_parallel.sh:63-82) as broadcast-offsets join + count +
    deterministic row_number tie-break (count desc, label asc)."""
    vol = _volume(spark, sf_dir)
    return mode_filter(vol, stencil_offsets(spark), value_col="label")


_OFFSETS_VALUES = ", ".join(f"({dx},{dy},{dz})" for dx, dy, dz in _OFFSETS_19)

J4_SQL = f"""
WITH vol AS ({_VOLUME_SQL}),
offsets(dx, dy, dz) AS (VALUES {_OFFSETS_VALUES}),
nbrs AS (
  SELECT v.voxel_id, n.label AS neighbor_value
  FROM vol v CROSS JOIN offsets o
  JOIN vol n ON n.x = v.x + o.dx AND n.y = v.y + o.dy AND n.z = v.z + o.dz
), counts AS (
  SELECT voxel_id, neighbor_value, COUNT(*) AS cnt
  FROM nbrs GROUP BY voxel_id, neighbor_value
), ranked AS (
  SELECT voxel_id, neighbor_value,
         ROW_NUMBER() OVER (PARTITION BY voxel_id
                            ORDER BY cnt DESC, neighbor_value ASC) AS rn
  FROM counts
)
SELECT voxel_id, neighbor_value AS mode_value FROM ranked WHERE rn = 1
"""


# --- W8: Gaussian spatial smoothing ------------------------------------------

_FWHM_VOX = 2.0
_SIGMA = _FWHM_VOX * FWHM_TO_SIGMA
_TWO_S2 = 2.0 * _SIGMA * _SIGMA  # == 1/ln(2) for fwhm=2
_RADIUS = max(1, int(math.ceil(2.0 * _SIGMA)))


def w8_gaussian_smooth(spark, sf_dir):
    """W8: fwhm=2-voxel Gaussian blur (data.smooth(fwhm=4mm) analog,
    ssm_loop.py:88-89). DEFAULT path = separable three 1-D passes
    (operators/smooth.py:gaussian_smooth_separable): 3·(2r+1) fan-out
    instead of (2r+1)³ — 1.6× faster at test scale, and at cluster
    scale the difference between a shuffle that fits and one that
    doesn't. Identical results to the cube kernel (w8b cross-check),
    both checked against the SAME 3-D oracle."""
    from neuroimaging_data_pipeline_spark.operators.smooth import (
        gaussian_offsets_1d,
        gaussian_smooth_separable,
    )

    vol = _volume(spark, sf_dir)
    values = vol.select("voxel_id", "value")
    dim = vol.select("voxel_id", "x", "y", "z")
    sm = gaussian_smooth_separable(
        values, dim, gaussian_offsets_1d(spark, _FWHM_VOX), value_col="value"
    )
    return sm.select("voxel_id", (F.round("value", 6) + F.lit(0.0)).alias("smooth_value"))


def w8b_gaussian_smooth_cube(spark, sf_dir):
    """W8 cross-check: the direct 3-D cube-kernel neighborhood join,
    normalized over present neighbors (masked-edge behavior). Kept as
    the independent formulation validating the separable default."""
    vol = _volume(spark, sf_dir)
    values = vol.select("voxel_id", "value")
    dim = vol.select("voxel_id", "x", "y", "z")
    sm = gaussian_smooth(
        values, dim, gaussian_offsets(spark, _FWHM_VOX), value_col="value"
    )
    return sm.select("voxel_id", (F.round("value", 6) + F.lit(0.0)).alias("smooth_value"))


W8_SQL = f"""
WITH vol AS ({_VOLUME_SQL}),
axis(d) AS (SELECT UNNEST(RANGE(-{_RADIUS}, {_RADIUS + 1}))),
wts AS (
  SELECT ax.d AS dx, ay.d AS dy, az.d AS dz,
         EXP(-(ax.d*ax.d + ay.d*ay.d + az.d*az.d) / {_TWO_S2!r}) AS w
  FROM axis ax CROSS JOIN axis ay CROSS JOIN axis az
), fanned AS (
  SELECT s.x + w.dx AS tx, s.y + w.dy AS ty, s.z + w.dz AS tz,
         s.value * w.w AS wv, w.w AS w
  FROM vol s CROSS JOIN wts w
)
SELECT t.voxel_id, (ROUND(SUM(f.wv) / SUM(f.w), 6) + 0.0) AS smooth_value
FROM fanned f
JOIN vol t ON t.x = f.tx AND t.y = f.ty AND t.z = f.tz
GROUP BY t.voxel_id
"""


# --- J5: nearest-neighbor resample -------------------------------------------

def j5_nearest_resample(spark, sf_dir):
    """J5: nearest-neighbor downsample by 2 (antsApplyTransforms
    -n nearestNeighbor analog, preprocess_parallel.sh:151-159): each
    coarse cell's center (2t+1, ...) maps to exactly one source voxel
    via a coordinate equi-join after rounding."""
    vol = _volume(spark, sf_dir)
    tx = spark.range(8).select(F.col("id").alias("tx"))
    ty = spark.range(8).select(F.col("id").alias("ty"))
    tz = spark.range(4).select(F.col("id").alias("tz"))
    targets = tx.crossJoin(ty).crossJoin(tz).select(
        (F.col("tx") + 8 * F.col("ty") + 64 * F.col("tz")).alias("target_id"),
        (2 * F.col("tx") + 1).alias("x"),
        (2 * F.col("ty") + 1).alias("y"),
        (2 * F.col("tz") + 1).alias("z"),
    )
    return targets.join(F.broadcast(vol), on=["x", "y", "z"], how="inner").select(
        "target_id", "voxel_id", "label", "value"
    )


J5_SQL = f"""
WITH vol AS ({_VOLUME_SQL}),
tx(t) AS (SELECT UNNEST(RANGE(0, 8))),
ty(t) AS (SELECT UNNEST(RANGE(0, 8))),
tz(t) AS (SELECT UNNEST(RANGE(0, 4))),
targets AS (
  SELECT tx.t + 8 * ty.t + 64 * tz.t AS target_id,
         2 * tx.t + 1 AS x, 2 * ty.t + 1 AS y, 2 * tz.t + 1 AS z
  FROM tx CROSS JOIN ty CROSS JOIN tz
)
SELECT t.target_id, v.voxel_id, v.label, v.value
FROM targets t JOIN vol v ON v.x = t.x AND v.y = t.y AND v.z = t.z
"""


# --- A3: voxel-wise mean across time (mean image) ----------------------------

def a3_mean_image(spark, sf_dir):
    """A3: per-voxel mean over the time axis (data.mean() analog,
    ipynb cells 48-49) on the lineitem-derived long fact table
    (voxel_id = l_partkey, t = l_linenumber, value = l_quantity)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_partkey").alias("voxel_id")).agg(
        # l_quantity is integer-valued: double sums are exact in any
        # order, so plain AVG is already bit-stable (no decimal needed)
        (F.round(F.avg("l_quantity"), 6) + F.lit(0.0)).alias("mean_value"),
        F.count(F.lit(1)).alias("n_obs"),
    )


A3_SQL = """
SELECT l_partkey AS voxel_id,
       (ROUND(AVG(l_quantity), 6) + 0.0) AS mean_value,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM lineitem GROUP BY l_partkey
"""


def j11_zorder_key(spark, sf_dir):
    """Z-order (Morton) layout key per voxel
    (sources/bucketing.py:morton3): the spatial-locality sort/range-
    partition key that co-locates stencil neighborhoods in file
    splits at volume scale. Map-only integer bit interleave; the
    octant id (zkey >> 3) is emitted alongside to surface the
    recursive-octant clustering property the layout relies on."""
    from neuroimaging_data_pipeline_spark.sources.bucketing import morton3

    vol = _volume(spark, sf_dir)
    return vol.select(
        "voxel_id",
        "x",
        "y",
        "z",
        morton3("x", "y", "z").alias("zkey"),
        F.shiftright(morton3("x", "y", "z"), 3).alias("octant"),
    )


def _j11_sql() -> str:
    from neuroimaging_data_pipeline_spark.sources.bucketing import morton3_sql

    m = morton3_sql("x", "y", "z")
    return f"""
WITH vol AS ({_VOLUME_SQL})
SELECT voxel_id, x, y, z,
       {m} AS zkey,
       CAST(({m}) >> 3 AS BIGINT) AS octant
FROM vol
"""


J11_SQL = _j11_sql()


QUERIES = {
    "j4_stencil_mode": j4_stencil_mode,
    "j11_zorder_key": j11_zorder_key,
    "w8_gaussian_smooth": w8_gaussian_smooth,
    "w8b_gaussian_smooth_cube": w8b_gaussian_smooth_cube,
    "j5_nearest_resample": j5_nearest_resample,
    "a3_mean_image": a3_mean_image,
}

ORACLE = {
    "j4_stencil_mode": J4_SQL,
    "j11_zorder_key": J11_SQL,
    "w8_gaussian_smooth": W8_SQL,
    "w8b_gaussian_smooth_cube": W8_SQL,
    "j5_nearest_resample": J5_SQL,
    "a3_mean_image": A3_SQL,
}
