"""Sketch aggregations: error bounds vs exact computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.queries.relational import (
    a_approx_sketches,
)
from neuroimaging_data_pipeline_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    got = a_approx_sketches(spark, SF_DIR).toPandas().set_index("l_returnflag")
    li = read_table(spark, SF_DIR, "lineitem")
    exact = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in exact.index:
        e, g = exact.loc[flag], got.loc[flag]
        assert abs(g.approx_parts - e.parts) / e.parts < 0.05
        assert abs(g.approx_median - e["median"]) / e["median"] < 0.01
        assert abs(g.approx_p95 - e.p95) / e.p95 < 0.01
