"""Voxel-bucketed Parquet layout — the shuffle-elimination path for
per-voxel operators (SURVEY.md §4.3, §7.4#1).

The flagship cost at 100 TB is the shuffle feeding every
``groupBy('voxel_id')`` (mass OLS, per-voxel means, stencils): ~400 M
long-format rows per subject. The reference sidesteps this by being
single-subject-in-RAM (``Brain_Data`` holds the whole 296 x 1.34 M
matrix, ssm_loop.py:69); the engine's equivalent is *layout*: write
the long fact table bucketed by ``voxel_id`` once at ingest, and every
downstream per-voxel groupBy/join reads pre-clustered buckets —
Catalyst sees the bucket spec as the scan's output partitioning and
plans **zero Exchange** for matching keys.

Write once, amortize forever: smoothing -> OLS -> mean-image all reuse
the same clustering. tests/test_bucketing.py pins the no-shuffle plan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | None = None,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed parquet table.

    ``n_buckets`` sizes the unit of parallelism: at 100 TB pick
    buckets of ~128-512 MB (e.g. 4096 buckets for a 1 TB cohort) so a
    single bucket fits an executor core's memory and the cluster has
    buckets >> cores for stragglers. Sorting within buckets
    (``sort_cols``, e.g. the time axis) makes per-voxel series arrive
    ordered — window ops over t need no per-group sort.
    """
    bucket_cols = bucket_cols or ["voxel_id"]
    if mode == "overwrite":
        # with the in-memory catalog, a previous session's table dir
        # survives while its catalog entry doesn't — saveAsTable then
        # fails on LOCATION_ALREADY_EXISTS. Drop both.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
        if warehouse and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; requires ``spark.sql.sources.bucketing.
    enabled`` (Spark default true) for the scan to expose its
    clustering to the planner."""
    return spark.table(table)


def morton3(x, y, z, bits: int = 8):
    """Z-order (Morton) key for a 3-D voxel coordinate: bit-interleave
    x, y, z into one BIGINT. Sorting / range-partitioning a volume by
    this key clusters spatial NEIGHBORS into the same file splits, so
    the stencil/smoothing joins (operators/stencil.py) read their
    19/27-neighborhoods from co-located blocks instead of scattering
    across the whole table — the standard spatial-locality layout for
    a 100 TB volume (the recursive-octant property: codes agree on
    their high 3(b-1) bits iff the voxels share the parent octant).

    Pure integer bit expressions — identical in both engines.
    """
    from pyspark.sql import functions as F

    cx = x if not isinstance(x, str) else F.col(x)
    cy = y if not isinstance(y, str) else F.col(y)
    cz = z if not isinstance(z, str) else F.col(z)
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(cx.cast("long"), b).bitwiseAND(F.lit(1)), 3 * b)
            + F.shiftleft(F.shiftright(cy.cast("long"), b).bitwiseAND(F.lit(1)), 3 * b + 1)
            + F.shiftleft(F.shiftright(cz.cast("long"), b).bitwiseAND(F.lit(1)), 3 * b + 2)
        )
    return key


def morton3_sql(x: str, y: str, z: str, bits: int = 8) -> str:
    """DuckDB twin expression text of :func:`morton3`."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {3 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {3 * b + 1})")
        terms.append(f"((({z} >> {b}) & 1) << {3 * b + 2})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
