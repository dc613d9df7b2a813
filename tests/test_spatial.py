"""J4/A8 stencil mode filter + W8 Gaussian smoothing + P7/P8/J3 masking
vs numpy oracles (FIXTURES.md F-4/F-5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.mask import (
    ASEG_ROI_LABELS,
    apply_mask,
    binarize,
    isin_label_mask,
)
from neuroimaging_data_pipeline_spark.operators.smooth import (
    FWHM_TO_SIGMA,
    gaussian_offsets,
    gaussian_smooth,
)
from neuroimaging_data_pipeline_spark.operators.stencil import (
    _OFFSETS_19,
    mode_filter,
    stencil_offsets,
)

GRID = 6  # 6x6x6 volume


@pytest.fixture(scope="module")
def volume_pdf(rng):
    ids = np.arange(GRID**3)
    x, y, z = np.unravel_index(ids, (GRID, GRID, GRID))
    labels = rng.choice([0, 2, 11, 17, 50, 99], size=GRID**3)
    return pd.DataFrame(
        {"voxel_id": ids, "x": x, "y": y, "z": z,
         "label": labels, "in_mask": (labels > 0).astype(int)}
    )


@pytest.fixture(scope="module")
def volume(spark, volume_pdf):
    return spark.createDataFrame(volume_pdf)


def test_isin_and_binarize(spark, volume, volume_pdf):
    out = volume.select(
        "voxel_id",
        isin_label_mask("label").alias("roi"),
        binarize("label").alias("b"),
    ).toPandas().sort_values("voxel_id")
    expect_roi = np.where(
        np.isin(volume_pdf.label, ASEG_ROI_LABELS), volume_pdf.label, 0
    )
    np.testing.assert_array_equal(out["roi"], expect_roi)
    np.testing.assert_array_equal(out["b"], (volume_pdf.label > 0).astype(int))


def test_mask_semi_join(spark, volume, volume_pdf):
    vals = spark.createDataFrame(
        pd.DataFrame({"voxel_id": np.arange(GRID**3), "value": 1.0})
    )
    kept = apply_mask(vals, volume)
    assert kept.count() == int(volume_pdf.in_mask.sum())


def test_mode_filter_matches_numpy(spark, volume, volume_pdf):
    offsets = stencil_offsets(spark)
    got = mode_filter(volume, offsets).toPandas().set_index("voxel_id")["mode_value"]
    lab = np.full((GRID, GRID, GRID), -1, dtype=int)
    lab[volume_pdf.x, volume_pdf.y, volume_pdf.z] = volume_pdf.label
    for _, row in volume_pdf.sample(30, random_state=0).iterrows():
        vals = []
        for dx, dy, dz in _OFFSETS_19:
            nx, ny, nz = row.x + dx, row.y + dy, row.z + dz
            if 0 <= nx < GRID and 0 <= ny < GRID and 0 <= nz < GRID:
                vals.append(lab[nx, ny, nz])
        uniq, cnt = np.unique(vals, return_counts=True)
        # tie-break: max count then smallest label
        best = uniq[np.lexsort((uniq, -cnt))][0]
        assert got[row.voxel_id] == best


def test_gaussian_smooth_matches_numpy(spark, volume, volume_pdf, rng):
    fwhm_vox = 2.0
    weights = gaussian_offsets(spark, fwhm_vox)
    vals_np = rng.normal(0, 1, GRID**3)
    vals = spark.createDataFrame(
        pd.DataFrame(
            {"subject": "sub-001", "t": 0,
             "voxel_id": np.arange(GRID**3), "value": vals_np}
        )
    )
    got = (
        gaussian_smooth(vals, volume, weights)
        .toPandas()
        .set_index("voxel_id")["value"]
    )
    sigma = fwhm_vox * FWHM_TO_SIGMA
    radius = int(np.ceil(2 * sigma))
    vol = vals_np.reshape(GRID, GRID, GRID)
    for _, row in volume_pdf.sample(20, random_state=1).iterrows():
        num = den = 0.0
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                for dz in range(-radius, radius + 1):
                    nx, ny, nz = row.x + dx, row.y + dy, row.z + dz
                    if 0 <= nx < GRID and 0 <= ny < GRID and 0 <= nz < GRID:
                        w = np.exp(-(dx**2 + dy**2 + dz**2) / (2 * sigma**2))
                        num += w * vol[nx, ny, nz]
                        den += w
        np.testing.assert_allclose(got[row.voxel_id], num / den, atol=1e-10)


def test_smooth_preserves_constant(spark, volume):
    """Property: smoothing a constant field returns the constant
    (normalization correctness at volume edges)."""
    weights = gaussian_offsets(spark, 2.0)
    vals = spark.range(GRID**3).select(
        F.lit("s").alias("subject"), F.lit(0).alias("t"),
        F.col("id").alias("voxel_id"), F.lit(3.5).alias("value")
    )
    out = gaussian_smooth(vals, volume, weights).toPandas()
    np.testing.assert_allclose(out["value"], 3.5, atol=1e-12)


def test_separable_smooth_equals_3d(spark, volume, volume_pdf, rng):
    """Separable 3-pass smoothing == cube-kernel smoothing, including
    masked-edge normalization (indicator-division trick), on a
    sparse/masked value set."""
    from neuroimaging_data_pipeline_spark.operators.smooth import (
        gaussian_offsets_1d,
        gaussian_smooth_separable,
    )

    fwhm_vox = 2.0
    vals_np = rng.normal(0, 1, GRID**3)
    keep = rng.random(GRID**3) > 0.3  # masked-out holes
    pdf = pd.DataFrame(
        {"subject": "s", "t": 0,
         "voxel_id": np.arange(GRID**3)[keep], "value": vals_np[keep]}
    )
    vals = spark.createDataFrame(pdf)
    got3d = (
        gaussian_smooth(vals, volume, gaussian_offsets(spark, fwhm_vox))
        .toPandas().set_index("voxel_id").sort_index()
    )
    gotsep = (
        gaussian_smooth_separable(
            vals, volume, gaussian_offsets_1d(spark, fwhm_vox)
        )
        .toPandas().set_index("voxel_id").sort_index()
    )
    assert list(got3d.index) == list(gotsep.index)
    np.testing.assert_allclose(
        gotsep["value"], got3d["value"], rtol=1e-9, atol=1e-12
    )


def test_blocked_stencil_matches_global(spark):
    """Halo-exchange blocked stencil == coordinate-equi-join stencil on
    every voxel, including block-boundary voxels (the halo), for both
    radius-1 (19-point) and an asymmetric-coverage volume."""
    from neuroimaging_data_pipeline_spark.operators.stencil import (
        mode_filter,
        neighborhood_join,
        neighborhood_join_blocked,
        stencil_offsets,
    )

    # 20x20x4 volume with gaps -> plenty of block boundaries at block=8
    rows = [
        (x + 20 * y + 400 * z, x, y, z, (x * 7 + y * 3 + z) % 5)
        for x in range(20)
        for y in range(20)
        for z in range(4)
        if (x + y + z) % 7 != 0  # holes: masked-volume behavior
    ]
    vol = spark.createDataFrame(
        rows, "voxel_id long, x long, y long, z long, label long"
    )
    offs = stencil_offsets(spark)
    a = (
        neighborhood_join(vol, offs, "label")
        .groupBy("voxel_id")
        .count()
        .toPandas()
        .set_index("voxel_id")["count"]
        .sort_index()
    )
    b = (
        neighborhood_join_blocked(vol, offs, "label", block=8)
        .groupBy("voxel_id")
        .count()
        .toPandas()
        .set_index("voxel_id")["count"]
        .sort_index()
    )
    assert a.equals(b)
    ma = mode_filter(vol, offs).toPandas().set_index("voxel_id").sort_index()
    mb = (
        mode_filter(vol, offs, blocked=True)
        .toPandas()
        .set_index("voxel_id")
        .sort_index()
    )
    assert ma.equals(mb)


def test_blocked_stencil_probe_side_uses_bucketed_layout(spark, tmp_path):
    """With the volume stored bucketed by home block, the probe side of
    the blocked stencil (volume x 19 rows — the BIG side) joins straight
    off its storage clustering: EXACTLY one shuffle remains, and it is
    the ghost (halo) side's hashpartitioning(bx, by, bz). Broadcast is
    disabled so the shuffle structure is observable (at test scale AQE
    would otherwise broadcast everything and prove nothing)."""
    from neuroimaging_data_pipeline_spark.operators.stencil import (
        neighborhood_join_blocked,
        stencil_offsets,
    )
    from neuroimaging_data_pipeline_spark.plans.audit import (
        exchange_count,
        explain_str,
    )
    from neuroimaging_data_pipeline_spark.sources.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    rows = [
        (x + 16 * y + 256 * z, x, y, z, (x + y + z) % 5)
        for x in range(16)
        for y in range(16)
        for z in range(4)
    ]
    vol = spark.createDataFrame(
        rows, "voxel_id long, x long, y long, z long, label long"
    )
    volb = vol.select(
        "*",
        F.floor(F.col("x") / 8).cast("long").alias("bx"),
        F.floor(F.col("y") / 8).cast("long").alias("by"),
        F.floor(F.col("z") / 8).cast("long").alias("bz"),
    )
    write_bucketed(
        volb, "t_stencil_vol", bucket_cols=["bx", "by", "bz"], n_buckets=8
    )
    stored = read_bucketed(spark, "t_stencil_vol")
    offs = stencil_offsets(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plain = neighborhood_join_blocked(vol, offs, "label", block=8)
        bucketed = neighborhood_join_blocked(stored, offs, "label", block=8)
        n_plain = exchange_count(explain_str(plain))
        n_bucketed = exchange_count(explain_str(bucketed))
        bplan = explain_str(bucketed)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert n_bucketed == 1, f"want exactly the halo shuffle:\n{bplan}"
    assert n_plain == 2, f"unbucketed should shuffle both sides: {n_plain}"
    assert "Bucketed: true" in bplan
    # results identical through the stored-block fast path
    a = (
        neighborhood_join_blocked(vol, offs, "label", block=8)
        .groupBy("voxel_id").count().toPandas()
        .set_index("voxel_id")["count"].sort_index()
    )
    b = (
        neighborhood_join_blocked(stored, offs, "label", block=8)
        .groupBy("voxel_id").count().toPandas()
        .set_index("voxel_id")["count"].sort_index()
    )
    assert a.equals(b)


def test_morton3_matches_reference_and_octant_property(spark):
    import itertools

    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.sources.bucketing import morton3

    def ref(x, y, z, bits=8):
        k = 0
        for b in range(bits):
            k |= ((x >> b) & 1) << (3 * b)
            k |= ((y >> b) & 1) << (3 * b + 1)
            k |= ((z >> b) & 1) << (3 * b + 2)
        return k

    coords = list(itertools.product(range(8), range(8), range(4)))
    df = spark.createDataFrame(coords, "x long, y long, z long")
    got = {
        (r.x, r.y, r.z): r.k
        for r in df.select("x", "y", "z", morton3("x", "y", "z").alias("k")).collect()
    }
    for x, y, z in coords:
        assert got[(x, y, z)] == ref(x, y, z)
        # recursive octant: high bits are the parent cell's code
        assert got[(x, y, z)] >> 3 == ref(x // 2, y // 2, z // 2)
    # bijective on the grid
    assert len(set(got.values())) == len(coords)
