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


def neighborhood_join_blocked(
    volume: DataFrame,
    offsets: DataFrame,
    value_col: str = "label",
    block: int = 8,
) -> DataFrame:
    """Halo-exchange variant of :func:`neighborhood_join` for
    block-partitioned volumes — the 100 TB shape.

    The stencil gather runs inside each target voxel's home block
    (bx, by, bz = coord div block): probe rows carry their target's
    home-block key, so when the volume is STORED bucketed by
    (bx, by, bz) (sources/bucketing.py) the big probe side (volume x
    n_offsets rows) needs NO shuffle — its join key prefix matches the
    storage clustering. Only the ghost side moves: every voxel
    replicates its value to the <= 8 blocks whose targets can read it
    (its own block, plus adjacent blocks when within ``radius`` of a
    face). Ghost volume = volume x (1 + O(radius/block)) — the halo —
    instead of shuffling volume x n_offsets. Radius is derived from the
    offsets table (19-point stencil -> 1; a radius-2 smoothing kernel
    -> 2).

    Identical results to :func:`neighborhood_join` (pinned in
    tests/test_spatial.py); only the physical movement differs.
    """
    off_rows = offsets.collect()  # tiny, fixed-size kernel table
    radius = max(
        max(abs(r["dx"]), abs(r["dy"]), abs(r["dz"])) for r in off_rows
    )
    B = block

    def blk(c):
        return F.floor(F.col(c) / B).cast("long")

    # Prefer STORED home-block columns (bx, by, bz) when the volume
    # carries them: a bucketed-by-(bx,by,bz) table then feeds the join
    # with its storage clustering — HashPartitioning on a subset of the
    # join keys satisfies the join's ClusteredDistribution, so the big
    # probe side needs no shuffle and only the ghost side moves. A
    # recomputed floor(x/B) expression would not be recognized as the
    # bucket column.
    has_blocks = {"bx", "by", "bz"} <= set(volume.columns)
    probes = (
        volume.select(
            "voxel_id",
            "x",
            "y",
            "z",
            *(
                [F.col("bx"), F.col("by"), F.col("bz")]
                if has_blocks
                else [
                    blk("x").alias("bx"),
                    blk("y").alias("by"),
                    blk("z").alias("bz"),
                ]
            ),
        )
        .join(F.broadcast(offsets))
        .select(
            "voxel_id",
            "bx",
            "by",
            "bz",
            (F.col("x") + F.col("dx")).alias("nx"),
            (F.col("y") + F.col("dy")).alias("ny"),
            (F.col("z") + F.col("dz")).alias("nz"),
        )
    )

    def ghost_blocks(c):
        # blocks whose targets can read this voxel: floor((c-r)/B) ..
        # floor((c+r)/B) — one value in the interior, two near a face.
        return F.sequence(
            F.floor((F.col(c) - radius) / B).cast("long"),
            F.floor((F.col(c) + radius) / B).cast("long"),
        )

    ghosts = (
        volume.select("x", "y", "z", value_col)
        .withColumn("bx", F.explode(ghost_blocks("x")))
        .withColumn("by", F.explode(ghost_blocks("y")))
        .withColumn("bz", F.explode(ghost_blocks("z")))
        .select(
            "bx",
            "by",
            "bz",
            F.col("x").alias("nx"),
            F.col("y").alias("ny"),
            F.col("z").alias("nz"),
            F.col(value_col).alias("neighbor_value"),
        )
    )
    return probes.join(
        ghosts, on=["bx", "by", "bz", "nx", "ny", "nz"], how="inner"
    ).select("voxel_id", "neighbor_value")


def mode_filter(
    volume: DataFrame,
    offsets: DataFrame,
    value_col: str = "label",
    blocked: bool = False,
    block: int = 8,
) -> DataFrame:
    """19-neighbor majority vote per voxel (A8 ``hmode``).

    Deterministic tie-break: highest count, then smallest value —
    ``mode()`` builtins (Spark and DuckDB alike) break ties
    arbitrarily, so we use count + row_number with a total order
    (SURVEY.md §7.4#5 determinism discipline applies here too).
    """
    nbrs = (
        neighborhood_join_blocked(volume, offsets, value_col, block)
        if blocked
        else neighborhood_join(volume, offsets, value_col)
    )
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
