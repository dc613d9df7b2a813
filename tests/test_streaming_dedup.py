"""Streaming dedup (dropDuplicatesWithinWatermark) + stream-stream
join, driven through real file streams."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.streaming.dedup import (
    dedup_stream_exact,
    enrich_stream,
)


def _run(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture()
def doc_stream_dir(tmp_path, spark):
    base = pd.Timestamp("2026-01-01")
    rows = []
    for i in range(60):
        rows.append(
            {
                "doc_id": i,
                "ts": base + pd.Timedelta(minutes=i),
                # every third doc repeats the content of i-1 -> dup
                "text": f"document body {i - 1 if i % 3 == 2 else i}",
            }
        )
    pdf = pd.DataFrame(rows)
    src = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = tmp_path / "docs"
    src.coalesce(2).write.parquet(str(d))
    return str(d)


def test_stream_dedup_drops_repeats(spark, doc_stream_dir):
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(doc_stream_dir)
    )
    out = _run(
        spark, dedup_stream_exact(stream, watermark="30 minutes"), "t_dedup"
    ).toPandas()
    # 60 docs, 20 are content-repeats of the previous doc
    assert len(out) == 40
    assert out["_digest"].nunique() == 40


def test_stream_stream_enrich(spark, tmp_path):
    base = pd.Timestamp("2026-01-01")
    ev = pd.DataFrame(
        {
            "event_id": range(20),
            "user_id": [i % 4 for i in range(20)],
            "ts": [base + pd.Timedelta(minutes=10 + i) for i in range(20)],
        }
    )
    meta = pd.DataFrame(
        {
            "user_id": [0, 1, 2, 3],
            "mts": [base + pd.Timedelta(minutes=m) for m in (0, 5, 200, 5)],
            "segment": ["a", "b", "c", "d"],
        }
    )
    (tmp_path / "ev").mkdir()
    (tmp_path / "meta").mkdir()
    spark.createDataFrame(ev).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "ev")
    )
    spark.createDataFrame(meta).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "meta")
    )
    es = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(
        str(tmp_path / "ev")
    )
    ms = spark.readStream.schema("user_id long, mts timestamp, segment string").parquet(
        str(tmp_path / "meta")
    )
    out = _run(spark, enrich_stream(es, ms), "t_enrich").toPandas()
    # user 2's metadata arrives at minute 200 — outside every event's
    # [ts - 1h, ts] window -> its events never enrich; users 0/1/3 do.
    assert set(out["segment"]) == {"a", "b", "d"}
    got_users = set(out["user_id"])
    assert got_users == {0, 1, 3}
    # each enriched event matched exactly one metadata row
    assert len(out) == len(ev[ev.user_id != 2])


def test_stream_stream_left_outer_enrich(spark, tmp_path):
    """LEFT OUTER stream-stream join: events with in-window metadata
    enrich exactly as the inner form; events whose metadata never
    arrives (user 2: metadata lands outside every window) are still
    EMITTED with NULL meta columns once the watermark proves the
    window closed. Sentinel far-future rows on both sides advance the
    watermark so the finite availableNow run flushes the outer state;
    the result (sans sentinels) equals the equivalent batch left
    join."""
    from neuroimaging_data_pipeline_spark.streaming.dedup import (
        enrich_stream_outer,
    )

    base = pd.Timestamp("2026-01-01")
    ev = pd.DataFrame(
        {
            "event_id": range(20),
            "user_id": [i % 4 for i in range(20)],
            "ts": [base + pd.Timedelta(minutes=10 + i) for i in range(20)],
        }
    )
    meta = pd.DataFrame(
        {
            "user_id": [0, 1, 2, 3],
            "mts": [base + pd.Timedelta(minutes=m) for m in (0, 5, 200, 5)],
            "segment": ["a", "b", "c", "d"],
        }
    )
    (tmp_path / "ev").mkdir()
    (tmp_path / "meta").mkdir()
    edf = spark.createDataFrame(ev)
    edf.coalesce(1).write.mode("append").parquet(str(tmp_path / "ev"))
    # two watermark-advancing sentinel batches per side
    for mins in (600, 601):
        spark.createDataFrame(
            pd.DataFrame(
                {"event_id": [9000 + mins], "user_id": [99],
                 "ts": [base + pd.Timedelta(minutes=mins)]}
            )
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "ev"))
        spark.createDataFrame(
            pd.DataFrame(
                {"user_id": [99], "mts": [base + pd.Timedelta(minutes=mins)],
                 "segment": ["z"]}
            )
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "meta"))
    spark.createDataFrame(meta).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "meta")
    )
    es = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "ev"))
    ms = spark.readStream.schema(
        "user_id long, mts timestamp, segment string"
    ).parquet(str(tmp_path / "meta"))
    out = _run(
        spark, enrich_stream_outer(es, ms), "t_enrich_outer"
    ).toPandas()
    out = out[out.user_id != 99]
    # every original event emitted exactly once
    assert sorted(out.event_id) == list(range(20))
    # user 2's events carry NULL meta; others enriched
    u2 = out[out.user_id == 2]
    assert len(u2) == 5 and u2.segment.isna().all()
    rest = out[out.user_id != 2]
    assert rest.segment.notna().all()
    assert set(rest.segment) == {"a", "b", "d"}


def test_stream_neardup_minhash_suppresses_edited_recrawls(spark, tmp_path):
    """neardup_stream_minhash + fold_claims over a real file stream:
    re-crawls with small edits (which slip past the exact digest) are
    suppressed, distinct documents survive, and the per-batch fold
    matches the batch-twin keep rule (first arrival in EVERY band
    bucket)."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        band_buckets,
        row_minhash_sigs,
    )
    from neuroimaging_data_pipeline_spark.streaming.dedup import (
        fold_claims,
        neardup_stream_minhash,
    )

    rng = np.random.default_rng(3)
    base = pd.Timestamp("2026-01-01")
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(30):
        if i % 3 == 2:
            # near-dup of doc i-1: same body, ONE word changed
            body = rows[-1]["text"].split()
            body[5] = "EDITED"
            text = " ".join(body)
        else:
            text = " ".join(
                words[int(j)] for j in rng.integers(0, 40, size=30)
            )
        rows.append(
            {"doc_id": i, "ts": base + pd.Timedelta(minutes=i),
             "text": text}
        )
    pdf = pd.DataFrame(rows)
    src = tmp_path / "docs"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(str(src))
    claims = neardup_stream_minhash(stream)
    q = (
        claims.writeStream.format("memory")
        .queryName("neardup_claims")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        fold_claims(spark.table("neardup_claims"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    # batch-twin expectation: first (sec, doc_id) arrival per bucket
    docs = spark.createDataFrame(pdf).withColumn(
        "_sec", F.unix_timestamp("ts")
    )
    sigs = row_minhash_sigs(docs).select("doc_id", "sig", "_sec")
    banded = band_buckets(sigs, keep_cols=("_sec",))
    claim = banded.groupBy("band", "band_hash").agg(
        F.min(F.struct("_sec", "doc_id")).alias("_f")
    )
    j = banded.join(claim, ["band", "band_hash"])
    want = (
        j.groupBy("doc_id")
        .agg(
            F.sum(
                (F.col("_f.doc_id") != F.col("doc_id")).cast("int")
            ).alias("n")
        )
        .select(
            "doc_id",
            (F.col("n") == 0).alias("kept"),
            F.col("n").cast("long").alias("n_coll_buckets"),
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, want)
    # the semantic point: edited re-crawls are SUPPRESSED even though
    # their exact digests differ, and their predecessors survive
    kept = got["kept"]
    assert not kept.loc[2] and not kept.loc[5] and not kept.loc[8]
    assert kept.loc[1] and kept.loc[4] and kept.loc[7]


def test_stream_neardup_minhash_string_ids(spark, tmp_path):
    """ADVICE r12: id_col looked generic but the operator pinned
    'long' in its output/state schemas. The schemas are now derived
    from the input column's type — string document ids must work
    end-to-end, with the same first-claim (sec, id) ordering."""
    from neuroimaging_data_pipeline_spark.streaming.dedup import (
        fold_claims,
        neardup_stream_minhash,
    )

    base = pd.Timestamp("2026-01-01")
    text_a = " ".join(f"w{i}" for i in range(30))
    edited = text_a.split()
    edited[5] = "EDITED"
    rows = [
        {"doc_id": "crawl/a", "ts": base, "text": text_a},
        {"doc_id": "crawl/b", "ts": base + pd.Timedelta(minutes=1),
         "text": " ".join(edited)},
        {"doc_id": "crawl/c", "ts": base + pd.Timedelta(minutes=2),
         "text": " ".join(f"z{i}" for i in range(30))},
    ]
    src = tmp_path / "docs_str"
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
        str(src)
    )
    stream = spark.readStream.schema(
        "doc_id string, ts timestamp, text string"
    ).parquet(str(src))
    claims = neardup_stream_minhash(stream)
    q = (
        claims.writeStream.format("memory")
        .queryName("neardup_claims_str")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        fold_claims(spark.table("neardup_claims_str"))
        .toPandas()
        .set_index("doc_id")["kept"]
    )
    assert got.loc["crawl/a"] and got.loc["crawl/c"]
    assert not got.loc["crawl/b"]  # edited re-crawl suppressed
