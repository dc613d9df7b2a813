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
    observed per-minute activity against the convolved regressor.

    Returns a small, stable-schema DataFrame (one row per (run,
    event_type) regressor with its fitted beta), exercising J2, W4,
    W5, W6, A9. Since r13 the stages are the shared helpers in
    operators/flagship.py, which streaming/flagship.py replays as a
    foreachBatch incremental pipeline (parity pinned in
    tests/test_streaming_flagship.py) and e17_flagship_betas
    oracle-checks against DuckDB.
    """
    from neuroimaging_data_pipeline_spark.functions.basis import (
        add_dct_basis,
        add_poly,
    )
    from neuroimaging_data_pipeline_spark.operators.flagship import (
        N_TR,
        TR,
        flagship_betas,
        flagship_events,
        flagship_state,
    )
    from neuroimaging_data_pipeline_spark.sources.tables import read_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    ev = read_table(spark, sf_dir, "events")
    anchor = ev.agg(F.min(F.unix_timestamp("ts"))).first()[0]
    state = flagship_state(spark, flagship_events(ev, anchor))
    # nuisance basis (W5/W6): part of the flagship plan shape; the
    # simple per-regressor OLS below doesn't consume them, so Catalyst
    # prunes the columns — declared, free when unused.
    state = add_poly(add_dct_basis(state, N_TR, TR, cutoff_s=N_TR * TR / 4), N_TR)
    return flagship_betas(state)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from neuroimaging_data_pipeline_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from neuroimaging_data_pipeline_spark.queries import all_oracles

    return all_oracles()
