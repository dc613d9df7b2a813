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
