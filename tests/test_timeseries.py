"""W1-W3/W7 window functions + A4/A5 confounds aggregations vs
pandas/numpy oracles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.timeseries import (
    diff,
    motion_covariates_24,
    spike_regressors,
    zscore,
)
from neuroimaging_data_pipeline_spark.operators.histogram import histogram


def test_zscore_both_ddofs(spark, confounds, confounds_pdf):
    out = zscore(confounds, ["trans_x"], ddof=1, suffix="_z1")
    out = zscore(out, ["trans_x"], ddof=0, suffix="_z0")
    pdf = out.filter("subject='sub-001' and run=1").orderBy("t").toPandas()
    ref = confounds_pdf.query("subject=='sub-001' and run==1").sort_values("t")
    x = ref["trans_x"].to_numpy()
    np.testing.assert_allclose(
        pdf["trans_x_z1"], (x - x.mean()) / x.std(ddof=1), atol=1e-12
    )
    np.testing.assert_allclose(
        pdf["trans_x_z0"], (x - x.mean()) / x.std(ddof=0), atol=1e-12
    )


def test_diff_fill(spark, confounds, confounds_pdf):
    out = diff(confounds, ["csf"])
    pdf = out.filter("subject='sub-002' and run=1").orderBy("t").toPandas()
    ref = confounds_pdf.query("subject=='sub-002' and run==1").sort_values("t")
    expect = ref["csf"].diff().fillna(0.0).to_numpy()
    np.testing.assert_allclose(pdf["csf_d"], expect, atol=1e-12)


def test_motion_covariates_24_width(spark, confounds):
    out = motion_covariates_24(confounds)
    params = ["trans_x", "trans_y", "trans_z", "rot_x", "rot_y", "rot_z"]
    expected = [
        p + s for p in params for s in ("_z", "_z_d", "_z_sq", "_z_d_sq")
    ]
    assert len(expected) == 24
    assert all(c in out.columns for c in expected)


def test_spike_regressors(spark, confounds):
    out = spike_regressors(confounds, [3, 17])
    pdf = out.filter("subject='sub-001' and run=1").orderBy("t").toPandas()
    assert pdf["spike_03"].sum() == 1.0 and pdf.loc[3, "spike_03"] == 1.0
    assert pdf["spike_17"].sum() == 1.0


def test_histogram_binwidth(spark):
    df = spark.createDataFrame([(float(v),) for v in [0, 1, 4, 5, 6, 12, 12]], "x double")
    got = {r["bin_start"]: r["n"] for r in histogram(df, "x", 5.0).collect()}
    assert got == {0.0: 3, 5.0: 2, 10.0: 2}


def test_motion_outlier_count_pipeline(spark):
    """E3 end-to-end shape: wide dynamic cols -> unpivot -> prefix filter
    -> per-subject count -> binned histogram (fmriprep_motion_hist.R)."""
    from neuroimaging_data_pipeline_spark.sources.tsv import unpivot_confounds

    wide = spark.createDataFrame(
        [
            ("sub-001", 0.1, 1.0, 0.0, None),
            ("sub-002", 0.2, None, None, 1.0),
        ],
        "subject string, csf double, motion_outlier00 double, "
        "motion_outlier01 double, motion_outlier02 double",
    )
    long = unpivot_confounds(wide, ["subject"])
    counts = (
        long.filter(F.col("name").startswith("motion_outlier") & F.col("value").isNotNull())
        .groupBy("subject")
        .agg(F.countDistinct("name").alias("n_outliers"))
    )
    got = {r["subject"]: r["n_outliers"] for r in counts.collect()}
    assert got == {"sub-001": 2, "sub-002": 1}


def test_find_spikes_flags_injected_outlier(spark):
    """A single injected global-signal jump is flagged by both the
    global and the diff criterion; clean timepoints are not."""
    import numpy as np
    import pandas as pd

    from neuroimaging_data_pipeline_spark.operators.spikes import (
        find_spikes,
        spike_regressors,
    )

    rng = np.random.default_rng(3)
    rows = []
    for t in range(40):
        base = 100.0 + (50.0 if t == 25 else 0.0)  # spike at t=25
        for v in range(20):
            rows.append(("s1", t, float(base + rng.normal(0, 1.0))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["subject", "t", "value"])
    )
    out = (
        find_spikes(df, keys=["subject"], global_cutoff=3.0, diff_cutoff=3.0)
        .toPandas()
        .set_index("t")
        .sort_index()
    )
    assert out.loc[25, "spike_global"] == 1
    assert out.loc[25, "spike_diff"] == 1
    assert out["spike_global"].sum() == 1
    # t=26 drops back down -> diff flags it too; nothing else flagged
    assert set(out.index[out["spike_diff"] == 1]) <= {25, 26}
    regs = spike_regressors(
        spark.createDataFrame(out.reset_index()).withColumn(
            "subject", F.lit("s1")
        ),
        keys=["subject"],
    ).toPandas()
    # one-hot: each spike column is 1 exactly once, at its timepoint
    for idx, grp in regs.groupby("spike_idx"):
        assert grp["v"].sum() == 1
        assert grp.loc[grp["v"] == 1, "t"].iloc[0] in {25, 26}


def test_find_spikes_constant_series_flags_zero(spark):
    """Constant global signal -> stddev 0 -> z NULL: both spike flags
    must coalesce to 0 (not NULL), matching the W7B oracle's CASE/ELSE 0
    convention (ADVICE r2: spike_global lacked the coalesce)."""
    import pandas as pd

    from neuroimaging_data_pipeline_spark.operators.spikes import find_spikes

    rows = [("s1", t, 5.0) for t in range(10) for _ in range(4)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["subject", "t", "value"])
    )
    out = find_spikes(df, keys=["subject"]).toPandas()
    assert (out["spike_global"] == 0).all()
    assert (out["spike_diff"] == 0).all()
    assert out["spike_global"].notna().all()
