"""S5/S6: volume ingest — binaryFile scan -> mapInPandas decode ->
long rows; values round-trip bit-exact, mask semi-join composes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.mask import apply_mask
from neuroimaging_data_pipeline_spark.sources.nifti import (
    decode_ndpvol,
    encode_ndpvol,
    load_volume_long,
    n_tr_of,
)

DIMS = (4, 3, 2, 5)  # (x, y, z, t)


@pytest.fixture(scope="module")
def volume_dir(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("volumes")
    arrays = {}
    for name in ("sub-001_bold.vol", "sub-002_bold.vol"):
        arr = rng.normal(0, 1, DIMS)
        arr[0, :, :, :] = 0.0  # an out-of-brain slab: dropped by default
        (d / name).write_bytes(encode_ndpvol(arr))
        arrays[name] = arr
    return str(d), arrays


def test_ndpvol_roundtrip(rng):
    arr = rng.normal(0, 1, DIMS)
    back = decode_ndpvol(encode_ndpvol(arr))
    np.testing.assert_array_equal(back, arr)


def test_load_volume_long_values(spark, volume_dir):
    d, arrays = volume_dir
    long = load_volume_long(spark, f"{d}/*.vol").cache()
    nx, ny, nz, nt = DIMS
    assert n_tr_of(long) == nt
    pdf = long.toPandas()
    assert set(pdf["path"].str.rsplit("/", n=1).str[-1]) == set(arrays)
    # zero slab dropped: x=0 never appears
    assert (pdf["x"] > 0).all()
    # spot-check values bit-exact against the source array
    name = "sub-001_bold.vol"
    sub = pdf[pdf["path"].str.endswith(name)]
    arr = arrays[name]
    for _, r in sub.sample(20, random_state=7).iterrows():
        assert arr[r.x, r.y, r.z, r.t] == r.value
    # voxel_id encodes (x, y, z) in C order
    assert (
        sub.voxel_id == sub.x * (ny * nz) + sub.y * nz + sub.z
    ).all()


def test_mask_semi_join_composes(spark, volume_dir):
    d, _ = volume_dir
    long = load_volume_long(spark, f"{d}/*.vol")
    nx, ny, nz, nt = DIMS
    # mask keeps only z == 1 voxels
    mask = spark.range(nx * ny * nz).select(
        F.col("id").alias("voxel_id"),
        ((F.col("id") % nz) == 1).cast("int").alias("in_mask"),
    )
    kept = apply_mask(long, mask)
    pdf = kept.toPandas()
    assert (pdf["z"] == 1).all() and len(pdf) > 0
