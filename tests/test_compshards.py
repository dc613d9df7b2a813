"""e12's mixed bz2/xz JSONL shard pack/unpack round trip."""

from __future__ import annotations

import pandas as pd

from neuroimaging_data_pipeline_spark.sources.compshards import (
    bxz_shard_documents,
    synthesize_jsonl_bxz_shards,
)


def test_mixed_shard_round_trip(spark):
    texts = ["line one\nline two", 'quote " and \\ backslash', None,
             "plain", "unicode é中文"] * 25
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(texts)), dtype="int64"),
                "text": texts,
            }
        )
    )
    shards = synthesize_jsonl_bxz_shards(docs)
    srows = shards.collect()
    # 125 docs -> shards 0,1,2: containers alternate bz2/xz/bz2
    assert {r.shard_id: r.container for r in srows} == {
        0: "bz2", 1: "xz", 2: "bz2"
    }
    back = {
        r["doc_id"]: (r["shard_id"], r["container"], r["text"])
        for r in bxz_shard_documents(shards).collect()
    }
    assert len(back) == len(texts)
    for i, t in enumerate(texts):
        sid, cont, got = back[i]
        assert sid == i // 50
        assert cont == ("bz2" if sid % 2 == 0 else "xz")
        assert got == ("" if t is None else t), i
