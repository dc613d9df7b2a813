"""Group-level (second-level) analysis: cohort inference over
per-subject GLM outputs.

The reference stops at single-subject betas written per regressor
(ssm_loop.py:94-102) — the README's "bigger pipeline" consumes those
maps for group inference. The engine closes that loop: a one-sample
t-test per (voxel, regressor) over subjects' betas, the canonical
random-effects group model.

    t_v = mean_s(beta_sv) / (sd_s(beta_sv) / sqrt(n))

Spark-first: this is a pure grouped aggregation over the stats bundle
(D8) — partial aggregation does the cohort reduction map-side, so the
shuffle carries one row per (voxel, regressor), not one per subject.
With the bundle stored voxel-bucketed, zero shuffle. p-values ride the
same vectorized t-CDF as first-level OLS.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ttest(
    stats: DataFrame,
    beta_col: str = "beta",
    unit_col: str = "subject",
    keys: list[str] | None = None,
    with_p: bool = False,
) -> DataFrame:
    """One-sample t-test of ``beta_col`` against 0 across ``unit_col``
    per group key (voxel_id, regressor by default).

    Returns (keys..., n, mean_beta, sd_beta, t, df[, p]). ``with_p``
    runs the Arrow-batched t-CDF (not SQL-oracle-expressible; the
    t statistic itself is).
    """
    keys = keys or ["voxel_id", "regressor"]
    # Pre-aggregate to ONE beta per unit: with multiple rows per subject
    # (e.g. a multi-run mass_ols bundle) a plain row count would inflate
    # n and df, overstating significance. The per-unit mean is exact and
    # a no-op on already-unique input; partial aggregation keeps both
    # groupBys map-side combinable on the same key prefix.
    per_unit = stats.groupBy(*keys, unit_col).agg(
        F.avg(beta_col).alias(beta_col)
    )
    # Explicit decimal moments instead of avg/stddev_samp: the sums are
    # associative-exact, so the (rounded) cohort mean and t cannot move
    # with the partial-agg tree, and both engines evaluate the SAME
    # closed form (no implementation-defined Welford merge). The
    # cancellation form is safe here: betas are O(1)-O(100) effect
    # estimates, not large-offset raw data.
    from neuroimaging_data_pipeline_spark.functions.stats import dec_sum

    agg = per_unit.groupBy(*keys).agg(
        F.count(unit_col).alias("n"),
        dec_sum(F.col(beta_col)).alias("_s1"),
        dec_sum(F.col(beta_col) * F.col(beta_col)).alias("_s2"),
    )
    nd = F.col("n").cast("double")
    agg = agg.select(
        *keys,
        "n",
        (F.col("_s1") / nd).alias("mean_beta"),
        F.sqrt(
            F.greatest(
                F.try_divide(
                    F.col("_s2") - F.col("_s1") * F.col("_s1") / nd,
                    nd - 1.0,
                ),
                F.lit(0.0),
            )
        ).alias("sd_beta"),
    )
    out = agg.select(
        *keys,
        "n",
        "mean_beta",
        "sd_beta",
        F.try_divide(
            F.col("mean_beta"),
            F.col("sd_beta") / F.sqrt(F.col("n").cast("double")),
        ).alias("t"),
        (F.col("n") - 1).cast("double").alias("df"),
    )
    if not with_p:
        return out

    from pyspark.sql.functions import pandas_udf

    from neuroimaging_data_pipeline_spark.operators.ols import _t_sf

    @pandas_udf("double")
    def p_two_sided(t: pd.Series, df: pd.Series) -> pd.Series:
        import numpy as np

        tv = t.to_numpy(dtype=np.float64)
        dv = df.to_numpy(dtype=np.float64)
        p = np.full_like(tv, np.nan)
        for d in np.unique(dv[~np.isnan(dv)]):
            if d <= 0:
                continue
            m = dv == d
            p[m] = 2.0 * _t_sf(np.abs(tv[m]), float(d))
        return pd.Series(p)

    return out.withColumn("p", p_two_sided(F.col("t"), F.col("df")))
