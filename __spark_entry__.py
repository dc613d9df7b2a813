"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose the SURVEY.md §2 operator inventory with
DuckDB-checkable oracles (see neuroimaging_data_pipeline_spark/queries/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's E1 pipeline shape on the events table —
    interval events -> TR grid -> boxcar design (range join) -> HRF
    convolution -> DCT/poly basis -> per-type simple-OLS betas of the
    observed per-hour activity against the convolved regressor.

    Returns a small, stable-schema DataFrame (one row per event_type
    regressor with its fitted beta), exercising J2, W4, W5, W6, A9.
    """
    from neuroimaging_data_pipeline_spark.functions.basis import (
        add_dct_basis,
        add_poly,
    )
    from neuroimaging_data_pipeline_spark.functions.convolve import (
        double_gamma_hrf,
        fir_convolve,
    )
    from neuroimaging_data_pipeline_spark.operators.design import (
        onsets_to_design,
        tr_grid,
    )
    from neuroimaging_data_pipeline_spark.sources.tables import read_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    ev = read_table(spark, sf_dir, "events")

    # Events -> intervals on a seconds axis anchored at the first event.
    t0 = ev.agg(F.min("ts").alias("t0"))
    n_tr, tr = 296, 60.0  # one-minute TRs over the event stream
    types = ["click", "error", "purchase", "signup", "view"]
    events = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            F.lit("cohort").alias("subject"),
            (F.col("user_id") % 4).cast("int").alias("run"),
            (
                (F.unix_timestamp("ts") - F.unix_timestamp("t0")).cast("double")
                % (n_tr * tr)
            ).alias("onset"),
            (F.col("value") + 1.0).alias("duration"),
            F.col("event_type").alias("trial_type"),
        )
    )
    # literal runs dim (user_id % 4) — avoids self-join lineage between
    # the grid (derived from events) and events in the range join
    runs = spark.createDataFrame(
        [("cohort", i) for i in range(4)], "subject string, run int"
    )
    grid = tr_grid(spark, runs, n_tr, tr)
    dm = onsets_to_design(grid, events, types)
    dm = fir_convolve(dm, types, double_gamma_hrf(tr, length_s=8 * tr))
    dm = add_poly(add_dct_basis(dm, n_tr, tr, cutoff_s=n_tr * tr / 4), n_tr)
    # response series: per (run, t) total activity value in that minute
    resp = (
        events.join(grid, on=["subject", "run"])
        .filter(
            (grid["t_sec"] >= events["onset"])
            & (grid["t_sec"] < events["onset"] + events["duration"])
        )
        .groupBy("subject", "run", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    fitted = dm.join(resp, on=["subject", "run", "t"], how="left").na.fill(
        {"y": 0.0}
    )
    # per-run simple OLS of y on each convolved regressor (A9 summation form)
    outs = []
    for tt in types:
        c = F.col(tt + "_c0")
        agg = fitted.groupBy("subject", "run").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(c).alias("mx"),
            F.avg("y").alias("my"),
            F.sum(c * F.col("y")).alias("sxy"),
            F.sum(c * c).alias("sxx"),
        )
        beta = F.try_divide(
            F.col("sxy") - F.col("n") * F.col("mx") * F.col("my"),
            F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx"),
        )
        outs.append(
            agg.select(
                "subject",
                "run",
                F.lit(tt).alias("regressor"),
                F.round(beta, 6).alias("beta"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from neuroimaging_data_pipeline_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from neuroimaging_data_pipeline_spark.queries import all_oracles

    return all_oracles()
