"""Stdlib Thrift-compact parquet footer parser (sources/parquet_meta)
cross-checked against pyarrow's reader — an independent parquet
implementation — over every testdata table at two scale factors."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from neuroimaging_data_pipeline_spark.sources.parquet_meta import (
    parse_footer,
    parse_footer_file,
)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_footer_matches_pyarrow_on_all_tables(sf):
    paths = sorted(glob.glob(f"/root/testdata/{sf}/*.parquet"))
    assert len(paths) == 10
    for p in paths:
        mine = parse_footer_file(p)
        ref = pq.ParquetFile(p).metadata
        assert mine["num_rows"] == ref.num_rows, p
        assert mine["n_row_groups"] == ref.num_row_groups, p
        assert mine["n_schema_leaves"] == ref.num_columns, p
        for i, (nr, tbs, nc) in enumerate(mine["row_groups"]):
            rg = ref.row_group(i)
            assert (nr, tbs, nc) == (
                rg.num_rows,
                rg.total_byte_size,
                rg.num_columns,
            ), (p, i)


def test_multi_row_group_fixture():
    from neuroimaging_data_pipeline_spark.queries.ingest import (
        _PQMETA_PATH,
        _write_pqmeta_fixture,
    )

    _write_pqmeta_fixture()
    meta = parse_footer_file(_PQMETA_PATH)
    assert meta["n_row_groups"] == 3
    assert [g[0] for g in meta["row_groups"]] == [1000, 1000, 1000]
    assert meta["num_rows"] == 3000
    assert meta["n_schema_leaves"] == 3


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="PAR1"):
        parse_footer(b"\x00" * 64)
