"""The three-tier exact-sum helpers (queries/__init__.py invariant):
order-independence under repartitioning, and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.stats import (
    dec_avg,
    dec_sum,
    money_avg,
    money_sum,
)


@pytest.fixture(scope="module")
def noisy(spark):
    """Full-mantissa doubles engineered so plain double summation is
    order-sensitive: huge + many tiny values."""
    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [rng.normal(1e9, 1.0, 4), rng.normal(1e-7, 1e-8, 5000)]
    )
    pdf = pd.DataFrame({"g": np.arange(len(vals)) % 2, "x": vals})
    return spark.createDataFrame(pdf), pdf


def _collect(df):
    return {r["g"]: r["s"] for r in df.collect()}


def test_dec_sum_is_partitioning_invariant(spark, noisy):
    df, _ = noisy
    outs = [
        _collect(
            df.repartition(n).groupBy("g").agg(dec_sum("x").alias("s"))
        )
        for n in (1, 7, 32)
    ]
    assert outs[0] == outs[1] == outs[2]  # bitwise equal, not approx


def test_dec_sum_matches_duckdb_twin(spark, noisy):
    df, pdf = noisy
    got = _collect(df.groupBy("g").agg(dec_sum("x").alias("s")))
    want = {
        g: s
        for g, s in duckdb.sql(
            "SELECT g, CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS s"
            " FROM pdf GROUP BY g"
        ).fetchall()
    }
    assert got == want  # bitwise


def test_money_sum_matches_duckdb_twin_and_is_invariant(spark):
    rng = np.random.default_rng(6)
    cents = rng.integers(-10_000_000, 10_000_000, 5000)
    pdf = pd.DataFrame(
        {"g": np.arange(5000) % 3, "x": cents.astype(np.float64) / 100.0}
    )
    df = spark.createDataFrame(pdf)
    outs = [
        _collect(
            df.repartition(n).groupBy("g").agg(money_sum("x").alias("s"))
        )
        for n in (1, 13)
    ]
    assert outs[0] == outs[1]
    want = {
        g: s
        for g, s in duckdb.sql(
            "SELECT g, (SUM(CAST(ROUND(x * 100) AS BIGINT)) / 100.0) AS s"
            " FROM pdf GROUP BY g"
        ).fetchall()
    }
    assert outs[0] == want
    # and the scaled-int sum IS the exact cents total
    for g in range(3):
        assert outs[0][g] == pytest.approx(
            cents[np.arange(5000) % 3 == g].sum() / 100.0, abs=0
        )


def test_money_sum_wide_matches_long_path_and_survives_big_totals(spark):
    """wide=True: DECIMAL(20,0) accumulation of the same scaled ints —
    identical results where LONG suffices, and still exact where the
    LONG path would overflow (the 100 TB hot-group switch)."""
    rng = np.random.default_rng(7)
    cents = rng.integers(-10_000_000, 10_000_000, 2000)
    pdf = pd.DataFrame(
        {"g": np.arange(2000) % 3, "x": cents.astype(np.float64) / 100.0}
    )
    df = spark.createDataFrame(pdf)
    narrow = _collect(df.groupBy("g").agg(money_sum("x").alias("s")))
    wide = _collect(df.groupBy("g").agg(money_sum("x", wide=True).alias("s")))
    assert narrow == wide  # bitwise
    # per-addend scaled magnitude ~9.2e18/2: two addends overflow LONG
    big = spark.createDataFrame(
        pd.DataFrame({"g": [0, 0], "x": [4.6e16, 4.6e16]})
    )
    out = _collect(big.groupBy("g").agg(money_sum("x", wide=True).alias("s")))
    assert out[0] == pytest.approx(9.2e16, rel=1e-12)


def test_avg_variants_null_and_empty_semantics(spark):
    pdf = pd.DataFrame(
        {"g": [0, 0, 1, 1], "x": [1.25, None, None, None]}
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["g"]: (r["da"], r["ma"])
        for r in df.groupBy("g")
        .agg(dec_avg("x").alias("da"), money_avg("x").alias("ma"))
        .collect()
    }
    assert out[0] == (1.25, 1.25)  # nulls skipped, count(x) not count(*)
    assert out[1] == (None, None)  # all-null group -> NULL like AVG
