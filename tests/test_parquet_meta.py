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


def test_column_stats_and_pruning_match_pyarrow():
    """parse_column_stats decodes per-type min/max identically to
    pyarrow's reader on the shared fixture; prune_row_groups makes
    the right skip decisions for range predicates on every testdata
    table's first column."""
    import pyarrow.parquet as papq

    from neuroimaging_data_pipeline_spark.queries.ingest import (
        _PQMETA_PATH,
        _write_pqmeta_fixture,
    )
    from neuroimaging_data_pipeline_spark.sources.parquet_meta import (
        parse_column_stats,
        prune_row_groups,
    )

    _write_pqmeta_fixture()
    data = open(_PQMETA_PATH, "rb").read()
    mine = {
        (s["row_group"], s["column"]): (s["min"], s["max"], s["num_values"])
        for s in parse_column_stats(data)
    }
    pf = papq.ParquetFile(_PQMETA_PATH)
    for gi in range(pf.metadata.num_row_groups):
        rg = pf.metadata.row_group(gi)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            st = col.statistics
            got = mine[(gi, col.path_in_schema)]
            assert got == (st.min, st.max, st.num_values), (gi, ci)

    # pruning: id >= 1500 skips exactly row group 0; <= 999 keeps only 0
    lo = {r["row_group"]: r["survives"] for r in
          prune_row_groups(data, "id", lo=1500)}
    assert lo == {0: 0, 1: 1, 2: 1}
    hi = {r["row_group"]: r["survives"] for r in
          prune_row_groups(data, "id", hi=999)}
    assert hi == {0: 1, 1: 0, 2: 0}
    # band predicate within one group
    band = {r["row_group"]: r["survives"] for r in
            prune_row_groups(data, "id", lo=1100, hi=1200)}
    assert band == {0: 0, 1: 1, 2: 0}


def test_string_column_stats_and_unsupported_kind():
    """BYTE_ARRAY statistics decode as strings (the 'name' column of
    the shared fixture); agg_state rejects unknown aggregate kinds."""
    import pytest

    from neuroimaging_data_pipeline_spark.operators.incremental import (
        agg_state,
    )
    from neuroimaging_data_pipeline_spark.queries.ingest import (
        _PQMETA_PATH,
        _write_pqmeta_fixture,
    )
    from neuroimaging_data_pipeline_spark.sources.parquet_meta import (
        parse_column_stats,
    )

    _write_pqmeta_fixture()
    data = open(_PQMETA_PATH, "rb").read()
    names = [s for s in parse_column_stats(data) if s["column"] == "name"]
    assert len(names) == 3
    for s in names:
        assert isinstance(s["min"], str) and s["min"].startswith("row-")
        assert isinstance(s["max"], str) and s["max"] >= s["min"]

    with pytest.raises(ValueError, match="unsupported aggregate kind"):
        agg_state(None, ["k"], {"bad": ("median", "x")})
