"""Shard-level helpers for the e13 composed video pipeline: pack
per-document H.264 GOP blobs into USTAR tar shards (the WebDataset
shape) and reverse the whole stack — tar walk, NAL parse, CAVLC
decode, motion compensation — into order-pinned per-shard features.

Kept in a dedicated module so both the query layer and tests can
drive the pack/decode pair directly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from neuroimaging_data_pipeline_spark.multimodal.h264_inter import (
    decode_h264_sequence,
)
from neuroimaging_data_pipeline_spark.multimodal.tar import (
    parse_tar,
    write_tar,
)


def pack_gop_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas packer: one USTAR tar per shard, members named
    ``{doc_id:08d}.h264`` in ascending doc order (deterministic
    member order is what makes the downstream md5 order-pinned)."""
    pdf = pdf.sort_values("doc_id")
    members = [
        (f"{int(i):08d}.h264", bytes(b))
        for i, b in zip(pdf["doc_id"], pdf["content"])
    ]
    shard = int(pdf["shard_id"].iloc[0])
    return pd.DataFrame({"shard_id": [shard],
                         "tar": [write_tar(members)]})


def decode_shard_features(
    shards: DataFrame,
) -> DataFrame:
    """Walk each tar shard, decode every member's 3-frame GOP, and
    emit per-shard (n_docs, total final-frame luma sum, md5 over
    'doc_id:sum' strings in member order)."""
    out_schema = (
        "shard_id long, n_docs long, sum_y_p2_total long,"
        " docs_md5 string"
    )

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_id, blob in zip(pdf["shard_id"], pdf["tar"]):
                parts = []
                total = 0
                for name, data in parse_tar(bytes(blob)):
                    doc_id = int(name.split(".")[0])
                    frames = decode_h264_sequence(bytes(data))
                    s = int(frames[-1][0].sum())
                    total += s
                    parts.append(f"{doc_id}:{s}")
                digest = hashlib.md5(
                    "|".join(parts).encode()
                ).hexdigest()
                rows.append(
                    (int(shard_id), len(parts), total, digest)
                )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "n_docs", "sum_y_p2_total",
                         "docs_md5"],
            )

    return shards.mapInPandas(feat, out_schema)
