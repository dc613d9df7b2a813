"""Spatial neighborhood (stencil) operators (SURVEY.md J4, A8, W9).

Reference: the 19-neighbor ``hmode`` mode filter
(preprocess_parallel.sh:63-82,162-182) reads fixed-offset neighbors of
every voxel and takes the majority label.

Spark-first: neighbors-by-join. A tiny offsets table (19 rows) is
broadcast and cross-applied to the voxel volume, then an equi-join on
the shifted coordinates fetches neighbor values, and a groupBy per
voxel aggregates. Two shuffles total (join + group) on the volume —
and both disappear into local hash joins when the volume Parquet is
bucketed by coordinate blocks (SURVEY.md §4.3 "stencil locality").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's 19-point stencil: 6-face + 12-edge neighbors + center
# (3dcalc a[-1,1,0,0] etc., preprocess_parallel.sh:63-82).
_OFFSETS_19 = [
    (0, 0, 0),
    (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1),
    (1, 1, 0), (1, -1, 0), (-1, 1, 0), (-1, -1, 0),
    (1, 0, 1), (1, 0, -1), (-1, 0, 1), (-1, 0, -1),
    (0, 1, 1), (0, 1, -1), (0, -1, 1), (0, -1, -1),
]


def stencil_offsets(spark: SparkSession, offsets=None) -> DataFrame:
    offsets = offsets if offsets is not None else _OFFSETS_19
    return spark.createDataFrame(offsets, "dx int, dy int, dz int")


def neighborhood_join(
    volume: DataFrame,
    offsets: DataFrame,
    value_col: str = "label",
) -> DataFrame:
    """For each voxel, one row per existing neighbor with the neighbor's
    value. volume: (voxel_id, x, y, z, <value_col>).

    Plan shape: volume x broadcast(offsets) -> shifted coords ->
    self-equi-join on (x,y,z). The self-join is a shuffle hash join on
    coordinates; with block-bucketed layout it stays co-located.
    """
    probes = (
        volume.select("voxel_id", "x", "y", "z")
        .join(F.broadcast(offsets))
        .select(
            "voxel_id",
            (F.col("x") + F.col("dx")).alias("nx"),
            (F.col("y") + F.col("dy")).alias("ny"),
            (F.col("z") + F.col("dz")).alias("nz"),
        )
    )
    nbr = volume.select(
        F.col("x").alias("nx"),
        F.col("y").alias("ny"),
        F.col("z").alias("nz"),
        F.col(value_col).alias("neighbor_value"),
    )
    return probes.join(nbr, on=["nx", "ny", "nz"], how="inner").select(
        "voxel_id", "neighbor_value"
    )


def mode_filter(
    volume: DataFrame,
    offsets: DataFrame,
    value_col: str = "label",
) -> DataFrame:
    """19-neighbor majority vote per voxel (A8 ``hmode``).

    Deterministic tie-break: highest count, then smallest value —
    ``mode()`` builtins (Spark and DuckDB alike) break ties
    arbitrarily, so we use count + row_number with a total order
    (SURVEY.md §7.4#5 determinism discipline applies here too).
    """
    nbrs = neighborhood_join(volume, offsets, value_col)
    counts = nbrs.groupBy("voxel_id", "neighbor_value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # max_by over (cnt, -value): lexicographic max = highest count then
    # smallest (numeric) label — a hash aggregate with map-side partial
    # combine and no sort, vs row_number's shuffle-and-sort of every
    # (voxel, label) pair.
    return counts.groupBy("voxel_id").agg(
        F.max_by(
            "neighbor_value",
            F.struct(F.col("cnt"), (-F.col("neighbor_value")).alias("nv")),
        ).alias("mode_value")
    )
