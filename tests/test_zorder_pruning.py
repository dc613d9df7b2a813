"""Layout-quality evidence: a Z-ORDERED parquet layout prunes MORE
row groups for multi-dimensional box predicates than a single-column
sort — measured with the engine's OWN footer-statistics machinery
(sources/parquet_meta.prune_row_groups), i.e. the two round-5 pieces
composing into a demonstrable 100 TB design claim rather than prose.

A single-column (x) sort gives perfect x-locality but NO y-locality:
every row group spans the full y range, so a small (x, y) box
predicate survives in every group that matches x. The Morton
interleave bounds BOTH coordinates per group (recursive-octant
property), so the same box prunes most groups.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as papq

from neuroimaging_data_pipeline_spark.sources.parquet_meta import (
    parse_column_stats,
    prune_row_groups,
)

N = 64  # 64x64 grid, 4096 points
ROW_GROUP = 256  # 16 row groups


def _morton2(x: int, y: int) -> int:
    key = 0
    for b in range(8):
        key |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return key


def _write(tmp_path, order):
    pts = [(x, y) for x in range(N) for y in range(N)]
    pts.sort(key=order)
    tbl = pa.table(
        {
            "x": pa.array([p[0] for p in pts], type=pa.int64()),
            "y": pa.array([p[1] for p in pts], type=pa.int64()),
        }
    )
    p = str(tmp_path) + ".parquet"
    papq.write_table(tbl, p, row_group_size=ROW_GROUP)
    return open(p, "rb").read()


def _survivors(data: bytes, lo: int, hi: int) -> int:
    """Row groups surviving the box predicate lo<=x<=hi AND
    lo<=y<=hi: a group survives only if BOTH columns' ranges
    intersect the box."""
    sx = {r["row_group"]: r["survives"]
          for r in prune_row_groups(data, "x", lo=lo, hi=hi)}
    sy = {r["row_group"]: r["survives"]
          for r in prune_row_groups(data, "y", lo=lo, hi=hi)}
    return sum(1 for g in sx if sx[g] and sy[g])


def test_zorder_layout_prunes_boxes_better(tmp_path):
    linear = _write(tmp_path / "linear", order=lambda p: (p[0], p[1]))
    morton = _write(tmp_path / "morton", order=lambda p: _morton2(*p))

    n_groups = len(
        {s["row_group"] for s in parse_column_stats(linear)}
    )
    assert n_groups == N * N // ROW_GROUP

    # an 8x8 box in the corner and one mid-grid
    for lo, hi in ((0, 7), (24, 31)):
        lin = _survivors(linear, lo, hi)
        mor = _survivors(morton, lo, hi)
        # x-sorted layout: every x-matching group spans all y -> the
        # y bound never prunes; morton bounds both dims per group
        assert mor < lin, (lo, hi, mor, lin)
        assert mor <= 2, (lo, hi, mor)

    # sanity: both layouts keep every group for the full-grid box
    assert _survivors(linear, 0, N - 1) == n_groups
    assert _survivors(morton, 0, N - 1) == n_groups
