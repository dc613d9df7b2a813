"""Design-matrix construction: regular TR grid + interval->grid alignment.

Reference semantics: ``onsets_to_dm(onsets, sampling_freq=1/tr,
run_length=n_tr)`` (ssm_loop.py:43) builds, per (subject, run), a
296-row regular grid and sets regressor[trial_type][t] = 1 for every
TR whose time falls inside [onset, onset+duration) of an event of that
trial_type (D2/J2 in SURVEY.md §1.1/§2.3).

Spark-first design:
- The grid is generated distributed (``spark.range`` cross-joined with
  the (subject, run) dimension) — no driver-side loops.
- Interval alignment is a *non-equi range join*; the events side is
  tiny (~8 rows per run — MID_subject_model_Feb2024.ipynb cell-9) so we
  broadcast it, making the join a map-side broadcast-nested-loop that
  never shuffles the big grid.
- trial_type -> columns is a pivot with an explicit, pre-computed value
  list: ``pivot(col, values)`` avoids the extra distinct-scan Spark
  performs when values are not supplied. At 100 TB the grid is the big
  side; one pass over it is the floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tr_grid(
    spark: SparkSession,
    runs: DataFrame,
    n_tr: int,
    tr: float,
) -> DataFrame:
    """Regular sampling grid: one row per (subject, run, t), t in [0, n_tr).

    ``runs`` is the (subject, run) dimension (small). The grid is built
    by cross-joining against a distributed ``spark.range`` so the big
    axis (t, and cohort = subjects x runs x t) is generated on
    executors, partitioned by Spark's range partitioning.
    """
    t = spark.range(0, n_tr).toDF("t")
    return (
        runs.crossJoin(t)
        .withColumn("t_sec", F.col("t").cast("double") * F.lit(float(tr)))
    )


def onsets_to_design(
    grid: DataFrame,
    events: DataFrame,
    trial_types: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval->grid alignment + pivot: the reference's ``onsets_to_dm``.

    grid:   (keys..., t, t_sec)
    events: (keys..., onset, duration, trial_type)
    result: (keys..., t, t_sec, <one 0/1 double column per trial_type>)

    The range join condition is ``onset <= t_sec < onset + duration``
    (ssm_loop.py:43 semantics). Events are broadcast (SURVEY.md §4.3:
    J2's non-equi join would otherwise be a shuffled BNLJ — with the
    small side broadcast it is embarrassingly parallel over the grid).
    """
    keys = keys or ["subject", "run"]
    ev = F.broadcast(
        events.select(
            *keys,
            F.col("onset"),
            (F.col("onset") + F.col("duration")).alias("offset_end"),
            F.col("trial_type"),
        )
    )
    cond = [grid[k] == ev[k] for k in keys]
    joined = grid.join(
        ev,
        on=[*cond, grid["t_sec"] >= ev["onset"], grid["t_sec"] < ev["offset_end"]],
        how="left",
    ).select(*[grid[k] for k in keys], grid["t"], grid["t_sec"], ev["trial_type"])
    # Explicit pivot values: skips Spark's values-discovery job and
    # pins column order deterministically.
    pivoted = (
        joined.groupBy(*keys, "t", "t_sec")
        .pivot("trial_type", trial_types)
        .agg(F.coalesce(F.count(F.lit(1)).cast("double"), F.lit(0.0)))
    )
    out = pivoted
    for tt in trial_types:
        # count>=1 -> 1.0 boxcar (an event type may overlap itself only
        # in degenerate designs; clamp to 1 to match boxcar semantics).
        out = out.withColumn(
            tt,
            F.when(F.coalesce(F.col(tt), F.lit(0.0)) >= 1.0, 1.0).otherwise(0.0),
        )
    return out
