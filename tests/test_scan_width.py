"""read_table's symbolic scan widths (sources/tables.py): "cores"
resolves to defaultParallelism, "auto" to a bytes-derived width
clamped to [1, defaultParallelism] — the r7 fix for the uniform-width
regression (BENCH_DELTA.md r7)."""

from __future__ import annotations

import os

from neuroimaging_data_pipeline_spark.sources import tables as T

SF = "/root/testdata/sf0.001"


def test_cores_resolves_to_default_parallelism(spark):
    df = T.read_table(spark, SF, "documents", min_partitions="cores")
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_auto_width_scales_with_source_bytes(spark):
    cores = spark.sparkContext.defaultParallelism
    # tiny sf0.001 documents: auto must stay narrow (task overhead
    # dominates), but never zero
    df = T.read_table(spark, SF, "documents", min_partitions="auto")
    width = df.rdd.getNumPartitions()
    size = T._source_bytes(f"{SF}/documents.parquet")
    expect = min(cores, max(1, size // T._AUTO_TARGET_BYTES))
    assert 1 <= width <= cores
    assert width >= expect  # repartition only ever widens
    # at a simulated large source, auto saturates at the core count
    assert min(cores, max(1, (100 << 30) // T._AUTO_TARGET_BYTES)) == cores


def test_source_bytes_handles_files_dirs_and_missing(tmp_path):
    f = tmp_path / "x.parquet"
    f.write_bytes(b"a" * 1234)
    assert T._source_bytes(str(f)) == 1234
    d = tmp_path / "ds.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"b" * 100)
    (d / "part-1.parquet").write_bytes(b"c" * 50)
    (d / "_SUCCESS").write_bytes(b"")  # metadata files don't count
    (d / ".hidden").write_bytes(b"zz")
    assert T._source_bytes(str(d)) == 150
    assert T._source_bytes(str(tmp_path / "missing.parquet")) == 0
