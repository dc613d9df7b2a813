"""Bucketed-layout scale path: per-voxel groupBy over a bucketed scan
must plan ZERO shuffles (SURVEY.md §4.3 — the mass-OLS feed)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.plans.audit import (
    exchange_count,
    explain_str,
)
from neuroimaging_data_pipeline_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_values(spark, rng):
    rows = pd.DataFrame(
        {
            "voxel_id": [v for v in range(200) for _ in range(10)],
            "t": [t for _ in range(200) for t in range(10)],
            "value": rng.normal(0, 1, 2000),
        }
    )
    df = spark.createDataFrame(rows)
    write_bucketed(
        df, "t_vox_bucketed", ["voxel_id"], n_buckets=8, sort_cols=["t"]
    )
    return read_bucketed(spark, "t_vox_bucketed")


def test_bucketed_groupby_no_exchange(spark, bucketed_values):
    agg = bucketed_values.groupBy("voxel_id").agg(
        F.avg("value").alias("mean_value")
    )
    plan = explain_str(agg)
    assert exchange_count(plan) == 0, plan
    # and it still computes the right thing
    assert agg.count() == 200


def test_unbucketed_groupby_does_exchange(spark, bucketed_values):
    """Control: the same agg over a plain (non-bucketed) source keeps
    its shuffle — proves the zero above comes from the layout."""
    plain = bucketed_values.sparkSession.createDataFrame(
        bucketed_values.toPandas()
    )
    agg = plain.groupBy("voxel_id").agg(F.avg("value").alias("mean_value"))
    assert exchange_count(explain_str(agg)) >= 1


def test_bucketed_applyinpandas_no_exchange(spark, bucketed_values):
    """The mass-OLS shape: grouped-map pandas over the bucket key
    rides the bucketed clustering with no shuffle."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"voxel_id": [pdf["voxel_id"].iloc[0]], "n": [len(pdf)]}
        )

    out = bucketed_values.groupBy("voxel_id").applyInPandas(
        fit, "voxel_id long, n long"
    )
    plan = explain_str(out)
    assert exchange_count(plan) == 0, plan
    got = out.toPandas()
    assert len(got) == 200 and (got["n"] == 10).all()
