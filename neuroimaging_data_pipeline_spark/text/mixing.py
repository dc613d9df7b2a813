"""Deterministic mixture-weighted corpus sampling (domain reweighting).

The data-mixing step of training-corpus assembly (Pile/Dolma-style
domain weights): each source/domain gets a target sampling rate, and
rows are kept by content-addressed hash bucket — NOT rand() — so the
mixture is reproducible across engines, runs, and partitionings, and
composable with the train/eval split primitive (text/analysis.py
hash_bucket, same md5 discipline).

Scale shape: the weight table is a broadcast dim (a mixture config is
KB-sized at any corpus scale); the keep decision is one md5 + compare
per row, map-only — no shuffle at all, the filter composes into
whatever plan consumes the sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.text.analysis import hash_bucket

#: Bucket granularity for mixture rates (rate resolution = 1/1000).
MIX_BUCKETS = 1000


def mixture_sample(
    df: DataFrame,
    thresholds: dict[str, int],
    key_col: str = "doc_id",
    group_col: str = "source",
    default_threshold: int = 0,
) -> DataFrame:
    """Keep a row iff its content hash bucket (0..MIX_BUCKETS-1 over
    ``key_col``) is below its group's integer threshold — i.e. group g
    is downsampled to thresholds[g]/MIX_BUCKETS of its rows. Groups
    absent from ``thresholds`` get ``default_threshold`` (0 = dropped:
    an explicit mixture is an allowlist). Thresholds are INTEGERS so
    both engines compare exact values, never a float rate."""
    spark = df.sparkSession
    dim = F.broadcast(
        spark.createDataFrame(
            sorted(thresholds.items()), f"{group_col} string, _thresh int"
        )
    )
    return (
        df.withColumn("_bucket", hash_bucket(key_col, MIX_BUCKETS))
        .join(dim, group_col, "left")
        .filter(
            F.col("_bucket")
            < F.coalesce(F.col("_thresh"), F.lit(int(default_threshold)))
        )
        .drop("_thresh")
        .withColumnRenamed("_bucket", "bucket")
    )


def source_cap(
    df: DataFrame,
    cap: int,
    key_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Cap each group at ``cap`` rows — the over-represented-domain
    limiter next to rate-based mixture_sample. Selection is by md5
    priority of the row key (a deterministic uniform shuffle), so the
    kept subset is an unbiased sample that is stable across engines,
    runs, and partitionings. One row_number window per group (single
    shuffle on the group key); emits (key, group, rk) with rk the
    1-based priority rank."""
    from pyspark.sql import Window

    pri = F.md5(F.concat(F.lit("cap42:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(pri.asc(), F.col(key_col).asc())
    return (
        df.select(key_col, group_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(cap))
    )


def source_cap_sql(
    cap: int,
    table: str = "documents",
    key_col: str = "doc_id",
    group_col: str = "source",
) -> str:
    """DuckDB twin: identical md5 priority and tie-break."""
    return f"""
WITH ranked AS (
  SELECT {key_col}, {group_col},
         CAST(ROW_NUMBER() OVER (
           PARTITION BY {group_col}
           ORDER BY md5('cap42:' || CAST({key_col} AS VARCHAR)) ASC, {key_col} ASC
         ) AS INT) AS rk
  FROM {table}
)
SELECT {key_col}, {group_col}, rk FROM ranked WHERE rk <= {int(cap)}
"""


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per group —
    importance sampling by a quality/length weight (the
    sample-good-docs-more curation step). Efraimidis-Spirakis A-ES:
    each row gets priority u^(1/w) (equivalently ln(u)/w maximized)
    with u a content-addressed md5 uniform in (0, 1] — deterministic
    across engines/runs/partitionings, unlike rand(). Rows with
    weight <= 0 are excluded (standard A-ES domain). One row_number
    window per group; emits (key, group, weight, rk)."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws42:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # u in (0, 1]: (h + 1) / 2^60
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    pri = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_pri"), F.asc(key_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            key_col, group_col, F.col(weight_col).alias("weight"),
            pri.alias("_pri"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .drop("_pri")
    )


def weighted_sample_sql(
    k: int,
    weight_col: str,
    table: str = "documents",
    key_col: str = "doc_id",
    group_col: str = "source",
) -> str:
    """DuckDB twin: identical md5 uniform, priority, and tie-break."""
    return f"""
WITH pri AS (
  SELECT {key_col}, {group_col}, CAST({weight_col} AS BIGINT) AS weight,
         ln((CAST(('0x' || substr(md5('ws42:' || CAST({key_col} AS VARCHAR)), 1, 15))
              AS BIGINT) + 1) / {float(2**60)!r})
           / CAST({weight_col} AS DOUBLE) AS p
  FROM {table} WHERE {weight_col} > 0
)
SELECT {key_col}, {group_col}, weight,
       CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {group_col} ORDER BY p DESC, {key_col} ASC
  ) AS rk
  FROM pri
) WHERE rk <= {int(k)}
"""


def mixture_sample_sql(
    thresholds: dict[str, int],
    columns: str = "doc_id, source, bucket",
    table: str = "documents",
    key_col: str = "doc_id",
    group_col: str = "source",
    default_threshold: int = 0,
) -> str:
    """DuckDB twin: identical md5 bucket (60-bit prefix, salt 's42')
    and identical integer-threshold allowlist semantics."""
    values = ", ".join(
        f"('{g}', {int(t)})" for g, t in sorted(thresholds.items())
    )
    return f"""
WITH mix({group_col}, thresh) AS (VALUES {values}),
b AS (
  SELECT t.*,
         CAST(('0x' || substr(md5('s42:' || CAST({key_col} AS VARCHAR)), 1, 15))
              AS BIGINT) % {MIX_BUCKETS} AS bucket
  FROM {table} t
)
SELECT {columns}
FROM b LEFT JOIN mix USING ({group_col})
WHERE bucket < COALESCE(thresh, {int(default_threshold)})
"""


def epoch_shuffle(
    df,
    key_col: str = "doc_id",
    seed: str = "epoch7",
    n_shards: int = 8,
):
    """Deterministic global shuffle — the before-every-epoch permute a
    training pipeline needs, made reproducible: each row's order key
    is a content-addressed md5 of (seed, key), so the permutation is
    identical across runs, engines and partitionings (``rand()`` is
    none of those, and re-shuffling an epoch after a failure must not
    change what the loaders already read). The corpus splits into
    ``n_shards`` loader shards by the hash, with the row's position
    within its shard by md5 order.

    At 100 TB this is ONE shuffle: partition by shard, sort within
    partition by the key (the window below is exactly that plan);
    n_shards scales to loader count and the md5 is uniform, so no
    shard skews. Emits (key, shuffle_key, shard, pos)."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    h = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("shuffle_key")
    return (
        df.select(
            key_col,
            key.alias("shuffle_key"),
            (h % int(n_shards)).cast("int").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
    )


def epoch_shuffle_sql(
    seed: str = "epoch7",
    n_shards: int = 8,
    table: str = "documents",
    key_col: str = "doc_id",
) -> str:
    """DuckDB twin: identical md5 order key, 60-bit shard hash, and
    rank-within-shard."""
    return f"""
WITH k AS (
  SELECT {key_col},
         md5('{seed}:' || CAST({key_col} AS VARCHAR)) AS shuffle_key,
         CAST(CAST(('0x' || substr(md5('{seed}:' || CAST({key_col} AS VARCHAR)), 1, 15))
              AS BIGINT) % {int(n_shards)} AS INT) AS shard
  FROM {table}
)
SELECT {key_col}, shuffle_key, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key) AS INT) AS pos
FROM k
"""
