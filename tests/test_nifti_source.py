"""S5/S6: volume ingest — binaryFile scan -> mapInPandas decode ->
long rows; values round-trip bit-exact, mask semi-join composes."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.mask import apply_mask
from neuroimaging_data_pipeline_spark.sources.nifti import (
    decode_ndpvol,
    decode_nifti1,
    encode_ndpvol,
    encode_nifti1,
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


def test_nifti1_roundtrip_float64_lossless(rng):
    """The REAL stdlib NIfTI-1 codec: float64, slope=1/inter=0 is
    bit-exact, and the header fields parse back (348-byte header,
    Fortran voxel order — the reference's actual nib.load input)."""
    arr = rng.normal(0, 1, DIMS)
    payload = encode_nifti1(arr, dtype="f8")
    assert struct.unpack_from("<i", payload, 0)[0] == 348
    assert payload[344:348] == b"n+1\0"
    np.testing.assert_array_equal(decode_nifti1(payload), arr)


def test_nifti1_fortran_order_on_disk(rng):
    """x must vary fastest in the on-disk buffer (nifti1.h layout) —
    a C-order writer would transpose every volume silently."""
    arr = np.arange(np.prod(DIMS), dtype=np.float64).reshape(DIMS)
    payload = encode_nifti1(arr, dtype="f8")
    raw = np.frombuffer(payload, dtype="<f8", offset=352)
    assert raw[0] == arr[0, 0, 0, 0]
    assert raw[1] == arr[1, 0, 0, 0]  # x neighbor adjacent on disk
    np.testing.assert_array_equal(decode_nifti1(payload), arr)


def test_nifti1_int16_with_scaling(rng):
    """int16 storage + scl_slope/inter: the decoder recovers values to
    slope/2 quantization, exactly like nibabel's get_fdata."""
    arr = rng.normal(100.0, 10.0, DIMS)
    payload = encode_nifti1(arr, dtype="i2", scl_slope=0.01, scl_inter=50.0)
    back = decode_nifti1(payload)
    np.testing.assert_allclose(back, arr, atol=0.005 + 1e-9)


def test_nifti1_gzip_and_big_endian(rng):
    arr = rng.normal(0, 1, DIMS)
    gz = encode_nifti1(arr, dtype="f8", compress=True)
    assert gz[:2] == b"\x1f\x8b"
    np.testing.assert_array_equal(decode_nifti1(gz), arr)
    be = encode_nifti1(arr, dtype="f4", byteorder=">")
    assert struct.unpack_from(">i", be, 0)[0] == 348
    np.testing.assert_allclose(
        decode_nifti1(be), arr.astype(np.float32).astype(np.float64)
    )


def test_nifti1_3d_gains_singleton_t(rng):
    arr3 = rng.normal(0, 1, DIMS[:3])
    payload = encode_nifti1(arr3[..., np.newaxis], dtype="f8")
    # rewrite dim[0]=3 so the file claims 3-D
    hdr = bytearray(payload)
    struct.pack_into("<8h", hdr, 40, 3, *DIMS[:3], 1, 1, 1, 1)
    back = decode_nifti1(bytes(hdr))
    assert back.shape == (*DIMS[:3], 1)
    np.testing.assert_array_equal(back[..., 0], arr3)


def test_nifti1_rejects_bad_payloads():
    with pytest.raises(ValueError):
        decode_nifti1(b"\x00" * 400)  # bad sizeof_hdr
    with pytest.raises(ValueError):
        decode_nifti1(b"junk")  # truncated
    ok = encode_nifti1(np.zeros(DIMS), dtype="f8")
    twofile = bytearray(ok)
    twofile[344:348] = b"ni1\0"
    with pytest.raises(ValueError):
        decode_nifti1(bytes(twofile))  # .hdr/.img pair unsupported


def test_load_volume_long_real_nii_end_to_end(spark, tmp_path, rng):
    """The driver-contract path on REAL .nii bytes: binaryFile scan ->
    mapInPandas stdlib decode -> long rows match the source arrays
    bit-exact; 'nibabel' decoder name falls back to the stdlib parser
    in this container."""
    arrays = {}
    for i, name in enumerate(
        ("sub-001_bold.nii", "sub-002_bold.nii", "sub-003_bold.nii.gz")
    ):
        arr = rng.normal(0, 1, DIMS)
        arr[0, :, :, :] = 0.0
        (tmp_path / name).write_bytes(
            encode_nifti1(arr, dtype="f8", compress=name.endswith(".gz"))
        )
        arrays[name] = arr
    long = load_volume_long(
        spark, f"{tmp_path}/*.nii*", decoder="nifti1"
    ).cache()
    assert n_tr_of(long) == DIMS[-1]
    pdf = long.toPandas()
    assert set(pdf["path"].str.rsplit("/", n=1).str[-1]) == set(arrays)
    assert (pdf["x"] > 0).all()  # zero slab dropped
    nx, ny, nz, nt = DIMS
    assert len(pdf) == len(arrays) * (nx - 1) * ny * nz * nt
    for name, arr in arrays.items():
        sub = pdf[pdf["path"].str.endswith(name)]
        for _, r in sub.sample(10, random_state=3).iterrows():
            assert arr[r.x, r.y, r.z, r.t] == r.value
    # the gated decoder name now degrades to the stdlib parser
    fb = load_volume_long(spark, f"{tmp_path}/sub-001*.nii", decoder="nibabel")
    assert fb.count() == (nx - 1) * ny * nz * nt


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
