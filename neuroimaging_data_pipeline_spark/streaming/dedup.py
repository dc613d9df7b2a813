"""Streaming deduplication + stream-stream enrichment (SURVEY.md §2.9
engine additions — the ingest-time half of the dedup story).

At 100 TB, exact dedup is cheapest *before* data lands: a streaming
``dropDuplicatesWithinWatermark`` on the content digest filters
re-crawls/re-uploads inside the watermark horizon with bounded state
(state TTL = watermark), instead of a full-corpus batch shuffle later.
The batch operators (dedup/exact.py, dedup/minhash.py) then only see
survivors.

``enrich_stream`` is the stream-stream inner join shape (events x
late-arriving metadata): both sides watermarked, join condition
includes an event-time bound so state stays finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    stream: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each content digest within the
    watermark horizon. State is one digest per distinct document,
    expired at the watermark — bounded regardless of stream length."""
    digested = stream.withColumn(
        "_digest", F.md5(F.col(content_col).cast("binary"))
    )
    return digested.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["_digest"]
    )


def enrich_stream(
    events: DataFrame,
    meta: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    meta_ts_col: str = "mts",
    watermark: str = "2 hours",
    max_lag: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Stream-stream inner join: each event picks up metadata rows
    whose timestamp is within [event - max_lag, event]. The time bound
    plus watermarks let Spark expire both sides' state."""
    e = events.withWatermark(ts_col, watermark).alias("e")
    m = meta.withWatermark(meta_ts_col, watermark).alias("m")
    joined = e.join(
        m,
        on=F.expr(
            f"e.{key} = m.{key} AND m.{meta_ts_col} >= e.{ts_col} - {max_lag} "
            f"AND m.{meta_ts_col} <= e.{ts_col}"
        ),
        how="inner",
    )
    meta_cols = [c for c in meta.columns if c != key]
    return joined.select("e.*", *[F.col(f"m.{c}") for c in meta_cols])


def enrich_stream_outer(
    events: DataFrame,
    meta: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    meta_ts_col: str = "mts",
    watermark: str = "10 minutes",
    max_lag: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Stream-stream LEFT OUTER join — the enrich shape that must
    also emit events whose metadata never arrives (with NULL meta
    columns), which is the half of the join surface the inner form
    cannot express. Same time-bound condition as
    :func:`enrich_stream`; the outer semantics are WHY both sides
    need watermarks: an unmatched event can only be emitted once the
    watermark proves its match window [ts - max_lag, ts] can no
    longer receive metadata, so NULL rows appear with watermark
    latency, never wrongly-early. State on both sides expires at the
    same bound."""
    e = events.withWatermark(ts_col, watermark).alias("e")
    m = meta.withWatermark(meta_ts_col, watermark).alias("m")
    joined = e.join(
        m,
        on=F.expr(
            f"e.{key} = m.{key} AND m.{meta_ts_col} >= e.{ts_col} - {max_lag} "
            f"AND m.{meta_ts_col} <= e.{ts_col}"
        ),
        how="left_outer",
    )
    meta_cols = [c for c in meta.columns if c != key]
    return joined.select("e.*", *[F.col(f"m.{c}") for c in meta_cols])


def neardup_stream_minhash(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming NEAR-duplicate suppression — the MinHash-LSH sibling
    of :func:`dedup_stream_exact`, for re-crawls that differ by a few
    edits and so slip past the exact digest.

    Per arriving document: k-word shingles -> MinHash signature ->
    ``bands`` LSH band buckets (dedup/minhash.py — the exact same
    deterministic md5-parity family the batch operators and their
    DuckDB oracles use). The ONE stateful stage keys on
    (band, band_hash) via ``applyInPandasWithState``: state is the
    bucket's first claimant (sec, id), and every claim row is emitted
    as (id, band, band_hash, claimed_by). A document is a KEEPER iff
    it claimed ALL of its buckets — that fold is one non-stateful
    aggregate the caller runs in ``foreachBatch`` (fold_claims below),
    because Spark does not allow an aggregation downstream of
    flatMapGroupsWithState in the same streaming query. This
    claims + foreachBatch-fold split IS the production shape: the
    fold is per-micro-batch local work, and the exactly-once sink
    (sources/versioned.append_txn) makes replays idempotent.

    State: one (sec, id) tuple per DISTINCT band bucket — bounded by
    corpus vocabulary, not stream length, and ~bands x smaller than a
    signature store. First-claim order is (event-second, id) within a
    micro-batch and processing order across batches (the standard
    streaming-dedup contract, same as dropDuplicatesWithinWatermark).

    ``id_col`` may be any orderable type: the claim/state schemas are
    derived from the input column's actual Spark type rather than
    pinned to ``long`` (ADVICE r12), so string document ids work too.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        band_buckets,
        row_minhash_sigs,
    )

    docs = stream.select(
        F.col(id_col), F.col(text_col), F.unix_timestamp(ts_col).alias("_sec")
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    id_is_int = id_type in ("tinyint", "smallint", "int", "bigint", "long")
    # signatures are computed ROW-WISE (higher-order functions, no
    # groupBy): a streaming query may not put an aggregation upstream
    # of applyInPandasWithState, and a document's signature is a pure
    # function of its own text anyway — the map-only form is the
    # correct streaming (and 100 TB batch) shape.
    sigs = row_minhash_sigs(
        docs, text_col=text_col, num_hashes=num_hashes, k=shingle_k
    ).select(id_col, "sig", "_sec")
    claims_in = band_buckets(
        sigs, id_col=id_col, num_hashes=num_hashes, bands=bands,
        keep_cols=("_sec",),
    )

    def fn(key_tuple, pdf_iter, state: GroupState):
        band, band_hash = key_tuple
        if state.exists:
            fsec, fid = state.get
        else:
            fsec, fid = None, None
        # a hot bucket's rows can span several Arrow chunks; the
        # (sec, id)-minimum claimant must be chosen over the WHOLE
        # micro-batch, so concatenate before sorting (per-chunk sorts
        # could crown a claimant that is not the batch minimum —
        # ADVICE r12).
        chunks = list(pdf_iter)
        batch = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else (chunks[0] if chunks else None)
        )
        rows = []
        if batch is not None and len(batch):
            sub = batch.sort_values(["_sec", id_col])
            # itertuples mangles underscore-prefixed names — pull the
            # two columns as plain lists instead
            secs = sub["_sec"].astype("int64").tolist()
            ids = sub[id_col]
            dids = (ids.astype("int64") if id_is_int else ids).tolist()
            if fid is None:
                fsec, fid = secs[0], dids[0]
            rows = [(did, int(band), band_hash, fid) for did in dids]
        if fid is not None:
            state.update((fsec, fid))
        yield pd.DataFrame(
            rows, columns=[id_col, "band", "band_hash", "claimed_by"]
        )

    return claims_in.groupBy("band", "band_hash").applyInPandasWithState(
        fn,
        outputStructType=(
            f"{id_col} {id_type}, band int, band_hash string, "
            f"claimed_by {id_type}"
        ),
        stateStructType=f"fsec long, fid {id_type}",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_claims(claims: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The per-batch fold for :func:`neardup_stream_minhash` claims:
    (id, kept, n_coll_buckets) — kept iff the document claimed every
    one of its band buckets. Non-stateful; run inside foreachBatch."""
    return claims.groupBy(id_col).agg(
        (F.sum((F.col("claimed_by") != F.col(id_col)).cast("int")) == 0)
        .alias("kept"),
        F.sum((F.col("claimed_by") != F.col(id_col)).cast("int"))
        .cast("long")
        .alias("n_coll_buckets"),
    )
