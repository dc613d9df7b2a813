"""§2.10 UDTF surface: interval-expansion table function via LATERAL."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from neuroimaging_data_pipeline_spark.functions.udtf_ops import (
        IntervalToGrid,
    )

    spark.udtf.register("interval_to_grid", IntervalToGrid)
    return spark


def test_interval_expansion_values(registered):
    out = registered.sql(
        """
        SELECT g.t, g.t_sec, g.coverage
        FROM (SELECT CAST(3.0 AS DOUBLE) AS onset, CAST(5.0 AS DOUBLE) AS dur) e,
        LATERAL interval_to_grid(e.onset, e.dur, 2.0) g
        ORDER BY g.t
        """
    ).collect()
    # [3, 8) over tr=2 ticks: t=1 half-covered, t=2 and t=3 full
    assert [(r.t, r.t_sec, r.coverage) for r in out] == [
        (1, 2.0, 0.5),
        (2, 4.0, 1.0),
        (3, 6.0, 1.0),
    ]


def test_coverage_mass_equals_duration(registered, rng):
    """Property: total covered tick time == interval duration."""
    rows = ", ".join(
        f"({i}, {rng.uniform(0, 50):.3f}, {rng.uniform(0.5, 20):.3f})"
        for i in range(25)
    )
    out = registered.sql(
        f"""
        SELECT e.id, SUM(g.coverage) * 2.0 AS covered, ANY_VALUE(e.dur) AS dur
        FROM (SELECT * FROM VALUES {rows} AS v(id, onset, dur)) e,
        LATERAL interval_to_grid(CAST(e.onset AS DOUBLE),
                                 CAST(e.dur AS DOUBLE), 2.0) g
        GROUP BY e.id
        """
    ).toPandas()
    np.testing.assert_allclose(
        out["covered"].astype(float), out["dur"].astype(float), rtol=1e-6
    )
