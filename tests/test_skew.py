"""Salting rewrites are exact: salted results == unsalted results,
including under heavy key skew."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.skew import (
    replicated_broadcast_join,
    salted_count_distinct,
)


@pytest.fixture(scope="module")
def skewed(spark, rng):
    # one hot key (90% of rows), long tail of normal keys
    n = 20_000
    keys = ["hot" if r < 0.9 else f"k{int(r * 1000)}" for r in rng.random(n)]
    vals = rng.integers(0, 500, n)
    return spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": vals, "rowid": range(n)})
    )


def test_salted_count_distinct_exact(spark, skewed):
    got = (
        salted_count_distinct(skewed, ["k"], "v", n_salt=16)
        .toPandas()
        .set_index("k")["n_distinct"]
        .sort_index()
    )
    expect = (
        skewed.groupBy("k")
        .agg(F.countDistinct("v").alias("n_distinct"))
        .toPandas()
        .set_index("k")["n_distinct"]
        .sort_index()
    )
    pd.testing.assert_series_equal(got, expect)


def test_replicated_broadcast_join_exact(spark, skewed):
    dim = skewed.select("k").distinct().withColumn(
        "label", F.concat(F.lit("L:"), F.col("k"))
    )
    got = (
        replicated_broadcast_join(
            skewed, dim, on="k", n_salt=8, fact_salt_col=F.col("rowid")
        )
        .groupBy("k", "label")
        .count()
        .toPandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )
    expect = (
        skewed.join(dim, on="k")
        .groupBy("k", "label")
        .count()
        .toPandas()
        .sort_values(["k"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)


def test_salted_join_equals_plain_join(spark):
    """salted_equi_join is a physical rewrite: identical rows to the
    plain join on a deliberately hot-keyed fact table, and the salted
    key actually appears in the executed join."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.salting import (
        salted_equi_join,
    )

    # hot key: 90% of facts share k=0
    fact = spark.range(2000).select(
        F.col("id").alias("fid"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 10).alias("k"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    plain = {tuple(r) for r in fact.join(dim, "k").collect()}
    salted_df = salted_equi_join(fact, dim, ["k"], "fid", n_salt=8)
    salted = {tuple(r) for r in salted_df.collect()}
    # same rows modulo column order
    plain_norm = {tuple(sorted(map(str, r))) for r in plain}
    salted_norm = {tuple(sorted(map(str, r))) for r in salted}
    assert plain_norm == salted_norm
    assert "_salt" in salted_df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_left_outer_variant(spark):
    """how='left' keeps unmatched big-side rows (salting must not
    change outer semantics: every big row picks exactly one salt, so
    an unmatched key emits exactly one NULL row, not n_salt)."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.salting import (
        salted_equi_join,
    )

    fact = spark.range(100).select(
        F.col("id").alias("fid"), (F.col("id") % 12).alias("k")
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("p")
    )
    out = salted_equi_join(fact, dim, ["k"], "fid", n_salt=4, how="left")
    assert out.count() == 100  # one row per fact row, matched or not
    unmatched = out.filter(F.col("p").isNull())
    assert {r.k for r in unmatched.collect()} == {10, 11}
    # keys 10 and 11 appear 8x each among ids 0..99
    assert unmatched.count() == 16
