"""Design-matrix diagnostics (SURVEY.md A7, A10, F7).

Reference: ``dm_conv.corr()`` (ipynb:1048) and ``dm_conv.vif()``
(ipynb:1087) — both over the *small* design matrix (296 x ~40), so the
DataFrame -> local-matrix boundary is idiomatic (SURVEY.md A10): the
heavy reduction (X'X over all rows) is distributed; the k x k solve is
driver-side numpy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dec_sum(col) -> F.Column:
    """Order-independent SUM of a double column: exact decimal
    accumulation (each addend rounded once to 10 decimals, then summed
    associatively), cast back to double. Partial-agg tree shape,
    partitioning, and engine can no longer move a rounded output across
    a rounding boundary (the w7b lesson). DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE)``."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.sum(c.cast("decimal(28,10)")).cast("double")


def dec_avg(col) -> F.Column:
    """Order-independent AVG built on ``dec_sum``; NULL on empty input
    like AVG. DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / COUNT(x)``."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.try_divide(dec_sum(c), F.count(c).cast("double"))


def money_sum(col, scale: int = 100, wide: bool = False) -> F.Column:
    """Order-independent SUM for fixed-decimal ("money") doubles: each
    addend maps deterministically to the integer ROUND(x*scale) (IEEE
    multiply + round are engine-identical), the LONG sum is exact and
    associative, and the result is rescaled. As fast as a plain double
    sum (single-long codegen adds — r3 measured 0.24s vs 0.40s for
    DECIMAL(28,10) on the 600k-row a1 agg) with the same
    order-independence guarantee. Headroom: LONG overflows at ~9.2e18 /
    (scale * magnitude) rows per group — e.g. ~9e7 rows at scale 1e6 on
    1e5-magnitude values; ANSI mode throws rather than wrapping.
    ``wide=True`` accumulates the SAME scaled ints in DECIMAL(20,0)
    (headroom ~1e38, still exact/associative, decimal-add cost) — the
    100 TB deployment switch for hot groups past the LONG bound.
    DuckDB twin: ``SUM(CAST(ROUND(x * scale) AS BIGINT)) / scale.0``
    (DuckDB sums BIGINT into HUGEINT, so its twin never overflows)."""
    c = col if isinstance(col, F.Column) else F.col(col)
    scaled = F.round(c * scale).cast("long")
    if wide:
        return (
            F.sum(scaled.cast("decimal(20,0)")).cast("double") / float(scale)
        )
    return F.sum(scaled) / float(scale)


def money_avg(col, scale: int = 100, wide: bool = False) -> F.Column:
    """Order-independent AVG for fixed-decimal doubles (see
    ``money_sum``); NULL on empty input like AVG. DuckDB twin:
    ``(SUM(CAST(ROUND(x*scale) AS BIGINT)) / scale.0) / COUNT(x)``."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.try_divide(money_sum(c, scale, wide), F.count(c).cast("double"))


def corr_matrix(df: DataFrame, cols: list[str]) -> "np.ndarray":
    """Pairwise Pearson correlation of the named columns.

    Distributed: one pass computing sums/crossproducts via
    ``summary``-style aggregation (k*(k+1)/2 agg expressions), then the
    k x k normalization locally. k ~ 40 -> ~800 agg exprs worst case;
    fine inside one whole-stage-codegen stage.
    """
    k = len(cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c)).alias(f"_s{i}"))
        for j in range(i, k):
            aggs.append(F.sum(F.col(c) * F.col(cols[j])).alias(f"_x{i}_{j}"))
    row = df.agg(*aggs).collect()[0]
    n = row["_n"]
    s = np.array([row[f"_s{i}"] for i in range(k)])
    xx = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            xx[i, j] = xx[j, i] = row[f"_x{i}_{j}"]
    cov = (xx - np.outer(s, s) / n) / (n - 1)
    sd = np.sqrt(np.diag(cov))
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = cov / np.outer(sd, sd)
    return corr


def corr_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format correlation pairs (col_a, col_b, corr) as a
    DataFrame — the SQL-surface variant of corr_matrix."""
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.corr(a, b).alias(f"{a}__{b}"))
    row = df.agg(*aggs)
    names = [c for c in row.columns]
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nm.split("__")[0]).alias("col_a"),
                        F.lit(nm.split("__")[1]).alias("col_b"),
                        F.col(nm).alias("corr"),
                    )
                    for nm in names
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.col_a", "r.col_b", "r.corr")


def vif(df: DataFrame, cols: list[str]) -> dict[str, float]:
    """Variance inflation factors: diag of inv(corr matrix) (A10).

    Intercept-like (zero-variance) columns must be excluded by the
    caller, as in the reference (vif computed on the pre-intercept
    design, ipynb:1087).
    """
    corr = corr_matrix(df, cols)
    inv = np.linalg.inv(corr)
    return {c: float(inv[i, i]) for i, c in enumerate(cols)}
