"""FIR convolution with an HRF kernel (SURVEY.md W4).

Reference: ``dm.convolve()`` (ssm_loop.py:54) convolves each regressor
with a double-gamma hemodynamic response function, producing the
``_c0``-suffixed columns (MID_subject_model_Feb2024.ipynb:1005).

Spark-first: a causal weighted sliding sum
``y_t = sum_k h_k * x_{t-k}`` over the ordered TR axis. Implemented as
a window-frame aggregate over ``rowsBetween(-(L-1), 0)`` using
``collect_list`` + ``aggregate`` on a *literal kernel array* — the
kernel is tiny (L ~ 16-32 taps) and baked into the plan as a constant,
so the whole thing is one pass, no shuffle beyond the partitionBy,
no Python.

The regular-grid precondition (one row per t, no gaps) is exactly the
reference's Design_Matrix invariant (D2).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gamma_pdf(x: float, shape: float, scale: float) -> float:
    if x <= 0:
        return 0.0
    return (
        x ** (shape - 1.0)
        * math.exp(-x / scale)
        / (math.gamma(shape) * scale**shape)
    )


def double_gamma_hrf(tr: float, length_s: float = 32.0) -> list[float]:
    """SPM-style double-gamma HRF sampled at the TR, sum-normalized.

    Canonical parameters (public SPM/nilearn convention): peak gamma
    (delay 6, dispersion 1), undershoot gamma (delay 16, dispersion 1),
    undershoot ratio 1/6. Mirrors the kernel nltools uses for
    ``dm.convolve()`` (ssm_loop.py:54) semantically; exact library
    parity is pinned in tests against a closed-form numpy oracle.
    """
    n = max(1, int(round(length_s / tr)))
    taps = []
    for i in range(n):
        t = i * tr
        peak = _gamma_pdf(t, 6.0, 1.0)
        under = _gamma_pdf(t, 16.0, 1.0)
        taps.append(peak - under / 6.0)
    s = sum(taps)
    return [t / s for t in taps] if s != 0 else taps


def fir_convolve_col(
    x: str | Column,
    kernel: list[float],
    keys: list[str],
    order: str = "t",
) -> Column:
    """Causal FIR as a Column: sum_k h_k * x_{t-k}.

    Uses a frame of the trailing L values; ``reverse`` puts x_t first
    so tap k aligns with x_{t-k}; ``zip_with`` against the literal
    kernel array multiplies JVM-side; early rows (frame shorter than L)
    naturally use only the available taps — identical to numpy
    'full'-mode convolution truncated to the series length.
    """
    L = len(kernel)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(-(L - 1), 0)
    )
    xcol = F.col(x) if isinstance(x, str) else x
    frame = F.reverse(F.collect_list(xcol).over(w))  # [x_t, x_{t-1}, ...]
    kern = F.array(*[F.lit(float(h)) for h in kernel])
    prod = F.zip_with(
        frame,
        F.slice(kern, 1, F.size(frame)),
        lambda a, b: a * b,
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def fir_convolve(
    df: DataFrame,
    cols: list[str],
    kernel: list[float],
    keys: list[str] | None = None,
    order: str = "t",
    suffix: str = "_c0",
) -> DataFrame:
    """Convolve each named regressor with the kernel; append ``_c0``
    columns matching the reference's naming (ipynb:1005)."""
    keys = keys if keys is not None else ["subject", "run"]
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, fir_convolve_col(c, kernel, keys, order))
    return out
