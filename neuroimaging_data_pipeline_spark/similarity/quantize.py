"""Per-vector int8 scalar quantization of an embedding column.

The vector-compression step an ANN index runs before sharding a
corpus-scale embedding table (FAISS SQ8 shape): each vector stores a
(min, scale) pair plus one uint8 code per component — a 4x shrink of
shuffle/storage bytes that the IVF/LSH paths here would consume at
100 TB. Map-only column expressions, zero shuffle, no Python.

Determinism: codes are round((x - min) / scale) on identically-formed
doubles in both engines; the summary exposes the integer code
checksum exactly and rounds the float fields to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8_summary(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vmin, vmax, code_sum, mean_abs_err): quantize each vector
    to 0..255 codes against its own [min, max] range and report the
    exact integer code checksum plus the mean absolute reconstruction
    error. Constant vectors (max == min) quantize to all-zero codes
    with zero error."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    mn = F.array_min(x)
    mx = F.array_max(x)
    scale = (mx - mn) / F.lit(255.0)
    codes = F.transform(
        x,
        lambda v: F.when(
            mx > mn, F.round((v - mn) / scale, 0)
        ).otherwise(F.lit(0.0)).cast("long"),
    )
    recon_err = F.zip_with(
        x,
        codes,
        lambda v, c: F.abs(v - (mn + c.cast("double") * scale)),
    )
    n = F.size(F.col(vec_col))
    return emb.select(
        F.col(id_col),
        (F.round(mn, 6) + F.lit(0.0)).alias("vmin"),
        (F.round(mx, 6) + F.lit(0.0)).alias("vmax"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        (
            F.round(
                F.try_divide(
                    F.aggregate(
                        recon_err, F.lit(0.0), lambda a, e: a + e
                    ),
                    n.cast("double"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_abs_err"),
    )


def quantize_int8_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin with the identical expression tree (same division
    and rounding order, same constant-vector branch)."""
    return f"""
WITH x AS (
  SELECT {id_col},
         list_transform({vec_col}, v -> CAST(v AS DOUBLE)) AS xs
  FROM {table}
), rng AS (
  SELECT {id_col}, xs,
         list_min(xs) AS mn, list_max(xs) AS mx,
         (list_max(xs) - list_min(xs)) / 255.0 AS scale
  FROM x
), coded AS (
  SELECT {id_col}, xs, mn, mx, scale,
         list_transform(xs, v -> CAST(
           CASE WHEN mx > mn THEN round((v - mn) / scale, 0) ELSE 0.0 END
           AS BIGINT)) AS codes
  FROM rng
)
SELECT {id_col},
       (ROUND(mn, 6) + 0.0) AS vmin,
       (ROUND(mx, 6) + 0.0) AS vmax,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       (ROUND(
          list_sum(list_transform(list_zip(xs, codes),
            p -> abs(p[1] - (mn + CAST(p[2] AS DOUBLE) * scale))))
          / CAST(len(xs) AS DOUBLE), 6) + 0.0) AS mean_abs_err
FROM coded
"""
