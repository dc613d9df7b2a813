"""DCT high-pass basis and polynomial trend columns (SURVEY.md W5, W6).

Reference: ``add_dct_basis(duration=220)`` (ssm_loop.py:55) appends
cosine regressors for frequencies up to the 220 s cutoff;
``add_poly()`` (ssm_loop.py:56) appends an intercept (order 0) and
optional polynomial drift columns.

Both are *generators* over the regular grid — pure column expressions
(cos/pow on t), no data movement at all: they widen the design matrix
in the same narrow stage that reads it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def n_dct_basis(n_tr: int, tr: float, cutoff_s: float = 220.0) -> int:
    """Number of DCT regressors for a run: floor(2*N*tr / cutoff)."""
    return int(math.floor(2.0 * n_tr * tr / cutoff_s))


def add_dct_basis(
    df: DataFrame,
    n_tr: int,
    tr: float,
    cutoff_s: float = 220.0,
    t_col: str = "t",
    prefix: str = "cosine_",
) -> DataFrame:
    """Append DCT-II basis columns cos(pi*f*(2t+1)/(2N)) for
    f = 1..n_dct_basis, matching nltools' ``add_dct_basis`` column
    family ``cosine_*`` (ssm_loop.py:55)."""
    k = n_dct_basis(n_tr, tr, cutoff_s)
    out = df
    for f_idx in range(1, k + 1):
        out = out.withColumn(
            f"{prefix}{f_idx}",
            F.cos(
                F.lit(math.pi)
                * F.lit(float(f_idx))
                * (2.0 * F.col(t_col).cast("double") + 1.0)
                / F.lit(2.0 * n_tr)
            ),
        )
    return out


def add_poly(
    df: DataFrame,
    n_tr: int,
    order: int = 0,
    t_col: str = "t",
) -> DataFrame:
    """Append intercept (poly_0 = 1.0) and polynomial drift columns
    poly_p = ((t - (N-1)/2) / ((N-1)/2))^p for p = 1..order.

    Reference uses order 0 only (intercept) because linear/quadratic
    drift correlates with the DCT columns (ipynb cells 28,31)."""
    out = df.withColumn("poly_0", F.lit(1.0))
    half = (n_tr - 1) / 2.0
    for p in range(1, order + 1):
        out = out.withColumn(
            f"poly_{p}",
            F.pow((F.col(t_col).cast("double") - half) / half, p),
        )
    return out
