"""Shard-level helpers for the e15 composed CONTAINER-FIRST video
pipeline: pack per-document MP4 clips (avc1 + avcC + length-prefixed
samples, the m40 fixture) into USTAR tar shards and reverse the whole
stack — tar member walk, MP4 box parse, avcC parameter-set extraction,
length-prefix re-framing, CAVLC H.264 decode over the DPB — into
order-pinned per-shard features. Completes the e13 (raw Annex-B GOP
shards) / e14 (MP3 shards) family with the container-first path real
corpora use (WebDataset .tar of .mp4 members).

Scale shape (same as e13/e14): ONE pack shuffle (groupBy shard), a
deliberate re-spread after it, then a single narrow decode+aggregate
task per shard — at 100 TB one task per tar shard, linear CPU.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from neuroimaging_data_pipeline_spark.multimodal.h264_mp4 import (
    decode_h264_mp4,
)
from neuroimaging_data_pipeline_spark.multimodal.tar import (
    parse_tar,
    write_tar,
)


def pack_mp4_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas packer: one USTAR tar per shard, members named
    ``{doc_id:08d}.mp4`` in ascending doc order (deterministic member
    order makes the downstream md5 order-pinned)."""
    pdf = pdf.sort_values("doc_id")
    members = [
        (f"{int(i):08d}.mp4", bytes(b))
        for i, b in zip(pdf["doc_id"], pdf["content"])
    ]
    shard = int(pdf["shard_id"].iloc[0])
    return pd.DataFrame({"shard_id": [shard],
                         "tar": [write_tar(members)]})


def decode_mp4_shard_features(shards: DataFrame) -> DataFrame:
    """Walk each tar shard, demux + fully decode every member's MP4
    (box walk, avcC, length-prefixed NALs, CAVLC + DPB), verify the
    container metadata every member must carry, and emit per-shard
    (n_docs, n_samples_total, sum of the decoded P2 luma, md5 over
    'doc_id:sum_y_idr:sum_y_p1:sum_y_p2:sum_cb_p2:sum_cr_p2' strings
    in member order)."""
    out_schema = (
        "shard_id long, n_docs long, n_samples_total long,"
        " sum_y_p2_total long, docs_md5 string"
    )

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_id, blob in zip(pdf["shard_id"], pdf["tar"]):
                parts = []
                p2_total = 0
                samples_total = 0
                for name, data in parse_tar(bytes(blob)):
                    doc_id = int(name.split(".")[0])
                    frames, info = decode_h264_mp4(bytes(data))
                    if (info["n_samples"] != len(frames)
                            or info["profile"] != 66
                            or info["length_size"] != 4):
                        raise ValueError(
                            f"doc {doc_id}: container metadata "
                            "disagrees with the decoded stream"
                        )
                    samples_total += info["n_samples"]
                    sums = (
                        int(frames[0][0].sum()),
                        int(frames[1][0].sum()),
                        int(frames[2][0].sum()),
                        int(frames[2][1].sum()),
                        int(frames[2][2].sum()),
                    )
                    p2_total += sums[2]
                    parts.append(
                        f"{doc_id}:" + ":".join(str(v) for v in sums)
                    )
                rows.append(
                    (int(shard_id), len(parts), samples_total,
                     p2_total,
                     hashlib.md5("|".join(parts).encode()).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "n_docs", "n_samples_total",
                         "sum_y_p2_total", "docs_md5"],
            )

    return shards.mapInPandas(feat, out_schema)
