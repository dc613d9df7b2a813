"""The E1 flagship pipeline as reusable stages (batch AND streaming).

Reference shape: ``ssm_loop.py:37-102`` — interval events -> TR grid
-> boxcar design (J2 range join) -> HRF convolution (W4) -> simple
per-regressor OLS (A9 summation form). ``__spark_entry__.entry`` runs
exactly this composition; ``streaming/flagship.py`` replays it as a
Structured Streaming ``foreachBatch`` pipeline with an incremental
design/response state.

Why the split is exact (not approximate): per grid cell
(subject, run, t) the pipeline's event-dependent state is
- the boxcar per trial_type — an OR over covering events (a MAX
  monoid: idempotent, commutative, associative), and
- the response y — a COUNT of covering events (a SUM monoid),
so merging per-micro-batch contributions cell-wise with max/sum
reaches the same state as one batch pass over all events, bit-for-bit
(0/1 doubles and integer counts have no float-order sensitivity).
Convolution and OLS are then pure functions of that final state —
streaming and batch share them as code, so parity is structural.

Scale shape: the grid is the big side and is generated distributed
(``tr_grid``); the per-batch event set is broadcast into the range
join; the state is O(runs x n_tr) per subject — cohort-partitionable,
never a full-corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.convolve import (
    double_gamma_hrf,
    fir_convolve,
)
from neuroimaging_data_pipeline_spark.functions.stats import dec_sum
from neuroimaging_data_pipeline_spark.operators.design import tr_grid

#: the events-table trial types, pinned in registration order
FLAGSHIP_TYPES = ["click", "error", "purchase", "signup", "view"]
N_TR = 296
TR = 60.0
N_RUNS = 4


def flagship_kernel(tr: float = TR) -> list[float]:
    """The flagship's HRF: double-gamma sampled at the TR, 8 taps
    (``length_s = 8 * tr`` — entry()'s choice since r1)."""
    return double_gamma_hrf(tr, length_s=8 * tr)


def flagship_events(
    ev: DataFrame,
    anchor_sec,
    n_tr: int = N_TR,
    tr: float = TR,
) -> DataFrame:
    """Raw events -> (subject, run, onset, duration, trial_type).

    ``anchor_sec``: epoch second of the experiment start (the global
    MIN(ts) in batch; a fixed, known anchor in streaming — a stream
    cannot wait for its own minimum). Onsets wrap modulo the run
    length so every event lands on the grid.
    """
    span = float(n_tr) * float(tr)
    return ev.select(
        F.lit("cohort").alias("subject"),
        (F.col("user_id") % N_RUNS).cast("int").alias("run"),
        (
            (F.unix_timestamp("ts") - F.lit(int(anchor_sec))).cast("double")
            % F.lit(span)
        ).alias("onset"),
        (F.col("value") + 1.0).alias("duration"),
        F.col("event_type").alias("trial_type"),
    )


def flagship_runs(spark: SparkSession) -> DataFrame:
    """Literal (subject, run) dimension — avoids self-join lineage
    between the grid (derived from events) and events."""
    return spark.createDataFrame(
        [("cohort", i) for i in range(N_RUNS)], "subject string, run int"
    )


def flagship_state(
    spark: SparkSession,
    events: DataFrame,
    n_tr: int = N_TR,
    tr: float = TR,
    types: list[str] | None = None,
) -> DataFrame:
    """ONE broadcast range join over the distributed grid producing the
    pipeline's whole event-dependent state: per (subject, run, t,
    t_sec) the 0/1 boxcar per trial_type (MAX over covering events)
    and the response y (COUNT of covering events, as double).

    This is the J2 shape from operators/design.onsets_to_design fused
    with the response count — one pass over the grid instead of two
    joins, and the per-cell outputs are exactly the monoids
    :func:`merge_state` folds across micro-batches.
    """
    types = types or FLAGSHIP_TYPES
    grid = tr_grid(spark, flagship_runs(spark), n_tr, tr)
    ev = F.broadcast(
        events.select(
            "subject",
            "run",
            "onset",
            (F.col("onset") + F.col("duration")).alias("offset_end"),
            "trial_type",
        )
    )
    joined = grid.join(
        ev,
        on=[
            grid["subject"] == ev["subject"],
            grid["run"] == ev["run"],
            grid["t_sec"] >= ev["onset"],
            grid["t_sec"] < ev["offset_end"],
        ],
        how="left",
    ).select(
        grid["subject"], grid["run"], grid["t"], grid["t_sec"],
        ev["trial_type"],
    )
    aggs = [
        F.max(
            F.when(F.col("trial_type") == tt, 1).otherwise(0)
        ).cast("double").alias(tt)
        for tt in types
    ]
    return joined.groupBy("subject", "run", "t", "t_sec").agg(
        *aggs,
        F.count("trial_type").cast("double").alias("y"),
    )


def merge_state(
    prev: DataFrame | None,
    batch: DataFrame,
    types: list[str] | None = None,
) -> DataFrame:
    """Cell-wise monoid merge of two state frames: boxcars OR (max),
    response counts add. Union + one groupBy — associative and
    commutative, so micro-batch arrival order cannot change the
    result; idempotent boxcars + the versioned store's txn sink make
    replays safe."""
    types = types or FLAGSHIP_TYPES
    if prev is None:
        return batch
    both = prev.unionByName(batch)
    return both.groupBy("subject", "run", "t", "t_sec").agg(
        *[F.max(tt).alias(tt) for tt in types],
        F.sum("y").alias("y"),
    )


def flagship_betas(
    state: DataFrame,
    n_tr: int = N_TR,
    tr: float = TR,
    types: list[str] | None = None,
    exact_sums: bool = True,
) -> DataFrame:
    """Final stage, a pure function of the state: HRF-convolve each
    boxcar (W4) and fit the per-(run, regressor) simple OLS of y on
    the convolved regressor (A9 summation form). Returns
    (subject, run, regressor, beta) — betas rounded to 6.

    ``exact_sums``: use the registry's order-independent decimal-sum
    discipline for the full-mantissa moments (required for the DuckDB
    oracle twin; entry()'s smoke path keeps plain sums).
    """
    types = types or FLAGSHIP_TYPES
    dm = fir_convolve(state, types, flagship_kernel(tr))
    msum = dec_sum if exact_sums else (lambda c: F.sum(c))
    # ONE aggregate pass computes every regressor's moments (a 5-way
    # union of per-type aggs would rescan + reshuffle the design 5x —
    # the plan audit showed 10 exchanges; this shape is 2), then a
    # stack() unpivot emits the per-regressor rows. Expressions are
    # identical to the per-branch form, so values are unchanged.
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("y").alias("_sy")]
    for tt in types:
        c = F.col(tt + "_c0")
        aggs += [
            msum(c).alias(f"_sx_{tt}"),
            msum(c * F.col("y")).alias(f"_sxy_{tt}"),
            msum(c * c).alias(f"_sxx_{tt}"),
        ]
    agg = dm.groupBy("subject", "run").agg(*aggs)
    nd = F.col("n").cast("double")
    beta_cols = []
    for tt in types:
        mx = F.try_divide(F.col(f"_sx_{tt}"), nd)
        my = F.try_divide(F.col("_sy"), nd)
        beta = F.try_divide(
            F.col(f"_sxy_{tt}") - F.col("n") * mx * my,
            F.col(f"_sxx_{tt}") - F.col("n") * mx * mx,
        )
        beta_cols.append(
            (F.round(beta, 6) + F.lit(0.0)).alias(f"_b_{tt}")
        )
    wide = agg.select("subject", "run", *beta_cols)
    stack = ", ".join(f"'{tt}', _b_{tt}" for tt in types)
    return wide.select(
        "subject",
        "run",
        F.expr(
            f"stack({len(types)}, {stack}) AS (regressor, beta)"
        ),
    ).select("subject", "run", "regressor", "beta")
