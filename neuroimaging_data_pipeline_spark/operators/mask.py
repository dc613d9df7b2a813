"""Masking operators (SURVEY.md P7, P8, J3, S6).

Long-format law (SURVEY.md §7.1): voxel data is
(subject, run, t, voxel_id, value); the voxel dimension is
(voxel_id, x, y, z, label, in_mask). Masking is then a left-semi join
— the Spark analog of ``Brain_Data(img, mask=...)`` (ssm_loop.py:69).

Scale: the mask/dimension side is ~1.3 M rows (a few MB) — always
broadcast; the semi-join never shuffles the 100 TB fact side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# FreeSurfer aseg subcortical ROI labels kept by the reference's
# ``amongst(a,11,12,13,17,18,26,50,51,52,53,54,58)`` (preprocess_parallel.sh:59).
ASEG_ROI_LABELS = [11, 12, 13, 17, 18, 26, 50, 51, 52, 53, 54, 58]


def binarize(col: str | Column, threshold: float = 0.0) -> Column:
    """value > threshold -> 1 else 0 (P8, ``binarize_img`` ssm_loop.py:65)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > threshold, 1).otherwise(0)


def isin_label_mask(
    labels: str | Column = "label",
    keep: list[int] | None = None,
) -> Column:
    """label in ROI-set ? label : 0 (P7, preprocess_parallel.sh:59)."""
    keep = keep if keep is not None else ASEG_ROI_LABELS
    c = F.col(labels) if isinstance(labels, str) else labels
    return F.when(c.isin(keep), c).otherwise(0)


def apply_mask(
    values: DataFrame,
    voxel_dim: DataFrame,
    mask_col: str = "in_mask",
    on: str = "voxel_id",
) -> DataFrame:
    """Keep only in-mask voxels: left-semi join on voxel_id (J3).

    The dimension side is filtered then broadcast: the physical plan is
    a BroadcastHashJoin(LeftSemi) — a map-side filter of the fact
    table, zero shuffle.
    """
    mask = F.broadcast(
        voxel_dim.filter(F.col(mask_col) == 1).select(on)
    )
    return values.join(mask, on=on, how="left_semi")
