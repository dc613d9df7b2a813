"""4-D volume ingest: NIfTI-style dense arrays -> long voxel rows
(SURVEY.md S5/S6, D3).

Reference: ``nib.load(path)`` / ``Brain_Data(img, mask=...)``
(ssm_loop.py:40,60,69) pulls a whole (x,y,z,t) array into RAM and
flattens to (t x voxel). The engine's equivalent is a *source*: a
``binaryFile`` scan of volume files, each decoded inside an
Arrow-batched ``mapInPandas`` and exploded to long rows
``(path, t, voxel_id, x, y, z, value)`` — from there every downstream
op (mask semi-join, smoothing, mass OLS) is relational.

Scale shape: one file = one input split = one decode task; a 68-subject
cohort is 272 files decoding in parallel, and the explode happens
executor-side (the driver never sees pixel data). Write the result
voxel-bucketed (sources/bucketing.py) once, reuse the clustering in
every per-voxel op.

Decoders:
- ``nibabel``: real NIfTI — import-gated (the library is not in this
  container); raises NotImplementedError with guidance if absent.
- ``ndpvol``: the engine's deterministic raw format for tests —
  magic b"NDPVOL1\\0", four little-endian int32 dims (x, y, z, t),
  then float64 voxel data in C order. Real plumbing, fake codec —
  same policy as multimodal/binaryops.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"NDPVOL1\0"

VOLUME_LONG_SCHEMA = (
    "path string, t long, voxel_id long, x int, y int, z int, value double"
)


def encode_ndpvol(arr: np.ndarray) -> bytes:
    """Serialize a 4-D float array (x, y, z, t) to the ndpvol format."""
    if arr.ndim != 4:
        raise ValueError(f"expected 4-D (x,y,z,t), got shape {arr.shape}")
    header = _MAGIC + struct.pack("<4i", *arr.shape)
    return header + np.ascontiguousarray(arr, dtype="<f8").tobytes()


def decode_ndpvol(payload: bytes) -> np.ndarray:
    if payload[:8] != _MAGIC:
        raise ValueError("not an ndpvol payload")
    dims = struct.unpack("<4i", payload[8:24])
    n = dims[0] * dims[1] * dims[2] * dims[3]
    data = np.frombuffer(payload, dtype="<f8", count=n, offset=24)
    return data.reshape(dims)


def _decode(payload: bytes, decoder: str) -> np.ndarray:
    if decoder == "ndpvol":
        return decode_ndpvol(bytes(payload))
    if decoder == "nibabel":
        try:
            import io

            import nibabel as nib
        except ImportError as e:  # pragma: no cover - env without nibabel
            raise NotImplementedError(
                "decoder 'nibabel' requires the nibabel package; provision "
                "it on the cluster or ingest via the 'ndpvol' format"
            ) from e
        img = nib.Nifti1Image.from_bytes(bytes(payload))  # pragma: no cover
        return np.asarray(img.dataobj, dtype=np.float64)  # pragma: no cover
    raise NotImplementedError(f"unknown volume decoder '{decoder}'")


def load_volume_long(
    spark: SparkSession,
    path_glob: str,
    decoder: str = "ndpvol",
    drop_zeros: bool = True,
) -> DataFrame:
    """Scan volume files and explode to long rows.

    ``drop_zeros`` mirrors the reference's early masking instinct
    (out-of-brain voxels are exactly 0 in masked volumes —
    ssm_loop.py:69): dropping them at the decode boundary cuts the
    long table ~5x before anything shuffles.
    """
    binfiles = spark.read.format("binaryFile").load(path_glob)

    def explode_volumes(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                arr = _decode(row["content"], decoder)
                nx, ny, nz, nt = arr.shape
                # voxel ids in C order over (x, y, z)
                flat = arr.reshape(nx * ny * nz, nt)
                vox = np.arange(nx * ny * nz, dtype=np.int64)
                xs = (vox // (ny * nz)).astype(np.int32)
                ys = ((vox // nz) % ny).astype(np.int32)
                zs = (vox % nz).astype(np.int32)
                for t in range(nt):
                    v = flat[:, t]
                    keep = v != 0.0 if drop_zeros else np.ones_like(v, bool)
                    yield pd.DataFrame(
                        {
                            "path": row["path"],
                            "t": np.int64(t),
                            "voxel_id": vox[keep],
                            "x": xs[keep],
                            "y": ys[keep],
                            "z": zs[keep],
                            "value": v[keep],
                        }
                    )

    return binfiles.select("path", "content").mapInPandas(
        explode_volumes, VOLUME_LONG_SCHEMA
    )


def n_tr_of(volumes_long: DataFrame) -> int:
    """``img.shape[-1]`` equivalent (ssm_loop.py:40): the time-axis
    length of a loaded volume table."""
    from pyspark.sql import functions as F

    return volumes_long.agg(F.max("t")).first()[0] + 1
