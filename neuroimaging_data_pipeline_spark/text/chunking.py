"""Document chunking and context packing — the two ways training and
retrieval pipelines cut a corpus into fixed-size windows.

- ``chunk_sliding``: RAG-style sliding-window chunks (size C, stride
  S < C for overlap) per document. Map-only: tokens -> start offsets
  -> explode -> slice; zero shuffle, chunk identity is a content md5
  so downstream chunk-level dedup composes with the hash families.
- ``pack_blocks``: GPT-style concat-and-chop packing — documents are
  concatenated in a deterministic order within each stream (here: per
  source, by doc_id) and chopped into fixed B-token blocks; each doc
  reports its token interval and the block span it lands in. One
  window cumsum per stream; streams (sources/shards) are the
  parallelism unit, exactly how packing runs at corpus scale (a
  1000-shard corpus packs 1000 streams independently).

Determinism: pure integer token arithmetic and md5 content keys —
no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(text_col) -> F.Column:
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )


def chunk_sliding(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, [carry_cols...], chunk_idx, start_tok, n_tokens,
    chunk_md5) — one row per sliding window: starts at multiples of
    ``stride`` while the start is inside the document; the last chunk
    may be short. Empty docs yield no chunks.

    ``carry_cols`` are passed through map-side so downstream per-group
    aggregates never need to join chunks back to the document table —
    at corpus scale that re-join is a fact-to-fact shuffle this
    parameter exists to delete."""
    carry = list(carry_cols or [])
    d = docs.select(
        F.col(id_col), *carry, _toks(F.col(text_col)).alias("toks")
    )
    d = d.withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    idx = F.sequence(
        F.lit(0), F.floor((F.col("n") - 1) / stride).cast("int")
    )
    out = d.select(
        id_col,
        *carry,
        "toks",
        "n",
        F.explode(idx).alias("chunk_idx"),
    ).select(
        id_col,
        *carry,
        "chunk_idx",
        (F.col("chunk_idx") * stride).alias("start_tok"),
        F.slice(
            "toks", F.col("chunk_idx") * stride + 1, chunk_size
        ).alias("_chunk"),
    )
    return out.select(
        id_col,
        *carry,
        "chunk_idx",
        "start_tok",
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.md5(F.array_join("_chunk", " ")).alias("chunk_md5"),
    )


def chunk_sliding_sql(
    chunk_size: int = 32,
    stride: int = 24,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col},
         list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                     t -> t <> '') AS toks
  FROM {table}
), sized AS (
  SELECT {id_col}, toks, len(toks) AS n FROM base WHERE len(toks) > 0
), chunks AS (
  SELECT {id_col}, CAST(i AS INT) AS chunk_idx,
         CAST(i * {stride} AS BIGINT) AS start_tok,
         list_slice(toks, i * {stride} + 1, i * {stride} + {chunk_size}) AS chunk
  FROM sized, UNNEST(range(0, CAST(floor((n - 1) / {stride}) AS BIGINT) + 1)) AS t(i)
)
SELECT {id_col}, chunk_idx, start_tok,
       CAST(len(chunk) AS BIGINT) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM chunks
"""


def pack_blocks(
    docs: DataFrame,
    block_size: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "source",
) -> DataFrame:
    """(id, stream, start_tok, n_tokens, first_block, last_block) —
    concat-and-chop packing: within each stream, docs concatenate in
    id order and the token stream chops into ``block_size`` blocks.
    ``first_block``/``last_block`` are the block ids the doc's tokens
    span (docs straddle block boundaries by design — that IS the
    packing shape)."""
    d = docs.select(
        F.col(id_col),
        F.col(stream_col),
        F.size(_toks(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return d.select(
        id_col,
        stream_col,
        "start_tok",
        "n_tokens",
        F.floor(F.col("start_tok") / block_size).cast("long").alias(
            "first_block"
        ),
        F.when(
            F.col("n_tokens") > 0,
            F.floor(
                (F.col("start_tok") + F.col("n_tokens") - 1) / block_size
            ),
        )
        .otherwise(F.floor(F.col("start_tok") / block_size))
        .cast("long")
        .alias("last_block"),
    )


def pack_blocks_sql(
    block_size: int = 128,
    table: str = "documents",
    id_col: str = "doc_id",
    stream_col: str = "source",
) -> str:
    return f"""
WITH sized AS (
  SELECT {id_col}, {stream_col},
         CAST(len(list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM {table}
), cum AS (
  SELECT {id_col}, {stream_col}, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY {stream_col} ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
           AS start_tok
  FROM sized
)
SELECT {id_col}, {stream_col}, start_tok, n_tokens,
       CAST(floor(start_tok / {block_size}) AS BIGINT) AS first_block,
       CAST(CASE WHEN n_tokens > 0
                 THEN floor((start_tok + n_tokens - 1) / {block_size})
                 ELSE floor(start_tok / {block_size}) END AS BIGINT) AS last_block
FROM cum
"""
