"""Fixed-grid equi-depth sketch (a_equidepth_sketch): bucket masses
approximate total/K within one grid-bin's occupancy, edges nest, and
the sketch agrees with the exact NTILE form up to bin granularity."""

from __future__ import annotations

import pytest

from neuroimaging_data_pipeline_spark.queries.relational import (
    EQUIDEPTH_K,
    a_equidepth_hist,
    a_equidepth_sketch,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def sketch_rows(spark):
    return sorted(
        (r.bucket, r.n_rows_est, r.lo_edge, r.hi_edge)
        for r in a_equidepth_sketch(spark, SF).collect()
    )


def test_masses_balanced_within_bin_granularity(spark, sketch_rows):
    total = sum(n for _, n, _, _ in sketch_rows)
    target = total / EQUIDEPTH_K
    # a whole grid bin goes to one bucket, so the worst imbalance is
    # one bin's occupancy; assert a generous 35% relative bound
    for _, n, _, _ in sketch_rows:
        assert abs(n - target) <= 0.35 * target, sketch_rows


def test_buckets_cover_and_nest(sketch_rows):
    assert [b for b, *_ in sketch_rows] == list(range(1, EQUIDEPTH_K + 1))
    for (b1, _, _, hi1), (b2, _, lo2, _) in zip(sketch_rows, sketch_rows[1:]):
        assert hi1 <= lo2 + 1e-9, (b1, b2, hi1, lo2)


def test_sketch_tracks_exact_ntile_boundaries(spark, sketch_rows):
    exact = {
        r.bucket: (r.lo, r.hi)
        for r in a_equidepth_hist(spark, SF).collect()
    }
    # each sketch bucket's value range must overlap the exact bucket's
    # range (the sketch rounds boundaries to grid edges, it cannot
    # wander to a different region of the distribution)
    for b, _, lo, hi in sketch_rows:
        xlo, xhi = exact[b]
        assert lo <= xhi and hi >= xlo, (b, (lo, hi), (xlo, xhi))
