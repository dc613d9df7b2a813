"""Degree-capped triangle estimation (the g_triangles scale sibling)."""

from __future__ import annotations

from neuroimaging_data_pipeline_spark.queries.simsearch import (
    g_triangles,
    g_triangles_cap,
)

SF_DIR = "/root/testdata/sf0.001"


def _counts(df):
    return {r.vec_id: r[1] for r in df.collect()}


def test_cap_is_lower_bound_and_exact_at_large_cap(spark):
    exact = _counts(g_triangles(spark, SF_DIR))
    capped = _counts(g_triangles_cap(spark, SF_DIR, cap=4))
    # per-vertex capped count never exceeds the exact count, and every
    # capped vertex is a vertex with exact triangles
    for v, n in capped.items():
        assert v in exact and n <= exact[v], (v, n, exact.get(v))
    # cap >= max degree -> the estimator IS the exact count
    huge = _counts(g_triangles_cap(spark, SF_DIR, cap=10_000))
    assert huge == exact
