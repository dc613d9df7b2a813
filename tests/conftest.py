from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from neuroimaging_data_pipeline_spark.session import get_spark

N_TR = 50
TR = 2.0
SUBJECTS = ["sub-001", "sub-002"]
RUNS = [1, 2]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ndp-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def mid_events_pdf(rng):
    """F-1 fixture: ~8 events per (subject, run), alternating Big/Small."""
    rows = []
    for s in SUBJECTS:
        for r in RUNS:
            onset = 2.0
            for i in range(8):
                dur = float(rng.uniform(6, 18))
                rows.append((s, r, round(onset, 3), round(dur, 3),
                             "Big" if i % 2 == 0 else "Small"))
                onset += dur + float(rng.uniform(2, 8))
    return pd.DataFrame(rows, columns=["subject", "run", "onset", "duration", "trial_type"])


@pytest.fixture(scope="session")
def mid_events(spark, mid_events_pdf):
    return spark.createDataFrame(mid_events_pdf)


@pytest.fixture(scope="session")
def runs_dim(spark):
    return spark.createDataFrame(
        [(s, r) for s in SUBJECTS for r in RUNS], "subject string, run int"
    )


@pytest.fixture(scope="session")
def confounds_pdf(rng):
    """F-3 fixture: motion params as random walks + csf/wm noise."""
    frames = []
    for s in SUBJECTS:
        for r in RUNS:
            data = {"subject": s, "run": r, "t": np.arange(N_TR)}
            for p in ["trans_x", "trans_y", "trans_z", "rot_x", "rot_y", "rot_z"]:
                data[p] = np.cumsum(rng.normal(0, 0.05, N_TR))
            data["csf"] = rng.normal(0, 1, N_TR)
            data["white_matter"] = rng.normal(0, 1, N_TR)
            frames.append(pd.DataFrame(data))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="session")
def confounds(spark, confounds_pdf):
    return spark.createDataFrame(confounds_pdf)
