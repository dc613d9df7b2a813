"""Shard-level helpers for the e14 composed AUDIO pipeline: pack
per-document MP3 Layer III streams into USTAR tar shards (the
WebDataset shape an audio training corpus uses) and reverse the whole
stack — tar walk, frame-header hop, bit-reservoir reassembly,
side-info / scalefactor / Huffman decode, requantization — into
order-pinned per-shard features. Mirrors h264_gop_helpers (e13).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from neuroimaging_data_pipeline_spark.multimodal.mp3l3 import (
    decode_mp3_l3,
)
from neuroimaging_data_pipeline_spark.multimodal.tar import (
    parse_tar,
    write_tar,
)


def pack_mp3_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas packer: one USTAR tar per shard, members named
    ``{doc_id:08d}.mp3`` in ascending doc order (deterministic member
    order makes the downstream md5 order-pinned)."""
    pdf = pdf.sort_values("doc_id")
    members = [
        (f"{int(i):08d}.mp3", bytes(b))
        for i, b in zip(pdf["doc_id"], pdf["content"])
    ]
    shard = int(pdf["shard_id"].iloc[0])
    return pd.DataFrame({"shard_id": [shard],
                         "tar": [write_tar(members)]})


def decode_mp3_shard_features(shards: DataFrame) -> DataFrame:
    """Walk each tar shard, fully decode every member's Layer III
    payload (bit reservoir and all), and emit per-shard (n_docs,
    total granules, total order-weighted spectral checksum, md5 over
    'doc_id:wsum' strings in member order)."""
    out_schema = (
        "shard_id long, n_docs long, n_granules_total long,"
        " wsum_total long, docs_md5 string"
    )

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_id, blob in zip(pdf["shard_id"], pdf["tar"]):
                parts = []
                wtotal = 0
                gr_total = 0
                for name, data in parse_tar(bytes(blob)):
                    doc_id = int(name.split(".")[0])
                    out = decode_mp3_l3(bytes(data))
                    if not out["reservoir_used"]:
                        raise ValueError(
                            f"doc {doc_id}: bit reservoir never "
                            "exercised — fixture contract broken"
                        )
                    wsum = 0
                    for k, g in enumerate(out["granules"]):
                        for idx, v in enumerate(g["lines"]):
                            if v:
                                wsum += v * (idx + 1) * (k + 1)
                    gr_total += out["n_granules"]
                    wtotal += wsum
                    parts.append(f"{doc_id}:{wsum}")
                digest = hashlib.md5(
                    "|".join(parts).encode()
                ).hexdigest()
                rows.append(
                    (int(shard_id), len(parts), gr_total, wtotal,
                     digest)
                )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "n_docs", "n_granules_total",
                         "wsum_total", "docs_md5"],
            )

    return shards.mapInPandas(feat, out_schema)
