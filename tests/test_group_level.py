"""Group-level one-sample t-test vs numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from neuroimaging_data_pipeline_spark.operators.group_level import group_ttest


def test_group_ttest_matches_numpy(spark, rng):
    n_sub, n_vox = 12, 40
    betas = rng.normal(0.3, 1.0, (n_sub, n_vox))
    rows = [
        {
            "subject": f"sub-{s:03d}",
            "voxel_id": v,
            "regressor": "task",
            "beta": betas[s, v],
        }
        for s in range(n_sub)
        for v in range(n_vox)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (
        group_ttest(df, with_p=True)
        .toPandas()
        .sort_values("voxel_id")
        .reset_index(drop=True)
    )
    mean = betas.mean(axis=0)
    sd = betas.std(axis=0, ddof=1)
    t = mean / (sd / np.sqrt(n_sub))
    np.testing.assert_allclose(out["mean_beta"], mean, atol=1e-10)
    np.testing.assert_allclose(out["t"], t, atol=1e-9)
    assert (out["df"] == n_sub - 1).all()
    # p symmetric in |t|, in (0,1], smaller for larger |t|
    assert ((out["p"] > 0) & (out["p"] <= 1)).all()
    big, small = out.loc[out["t"].abs().idxmax()], out.loc[out["t"].abs().idxmin()]
    assert big["p"] < small["p"]
