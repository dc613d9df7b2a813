"""Distribution-drift detection: exact two-sample Kolmogorov-Smirnov
statistic of each group against the rest of the corpus.

The data-quality monitoring shape of a training pipeline: when a new
source/domain/snapshot lands, compare the distribution of a bounded
numeric signal (doc length, quality score, token count) against the
corpus and alert on drift. KS is the classic distribution-free test;
this computes it EXACTLY (no sampling, no binning).

Exactness/determinism: the statistic is assembled in pure integer
arithmetic — D_num(v) = |c_g(v) * n_rest - c_rest(v) * n_g| on raw
cumulative counts — and only the final max is divided and rounded, so
both engines compute identical values regardless of summation order.

Scale shape: one (group, value) count aggregate over the corpus, then
all window work runs on the DISTINCT-VALUE grid (bounded for the
bounded signals this is for — doc-length style metrics have at most
thousands of distinct values, independent of corpus row count). The
global-CDF cumulative uses an unpartitioned window over that grid —
safe BECAUSE the grid is metric-bounded, not corpus-sized; for an
unbounded continuous signal, quantize first (the standard practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """(group, n, ks) — exact KS statistic of each group's value
    distribution against the REST of the corpus (leave-one-group-out).
    Groups covering the whole corpus (no rest) yield ks NULL.

    NULL contract: rows whose ``value_col`` is NULL are EXCLUDED from
    the test (and from ``n``) up front. A KS statistic is defined over
    an ordered domain NULL does not belong to; silently folding NULLs
    into either CDF (or only into the totals, as a null-unsafe grid
    join would) skews D. The SQL twin applies the identical filter, and
    it also removes the engines' NULLS FIRST (Spark) vs NULLS LAST
    (DuckDB) window-ordering divergence."""
    df = df.na.drop(subset=[value_col])
    counts = (
        df.groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    gvals = counts.select(value_col).distinct()
    groups = counts.groupBy(group_col).agg(F.sum("cnt").alias("n_g"))
    total = counts.agg(F.sum("cnt").alias("n_all"))

    # global per-value counts -> global cumulative (distinct-value grid)
    wg = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gcum = (
        counts.groupBy(value_col)
        .agg(F.sum("cnt").alias("vcnt"))
        .withColumn("g_cum", F.sum("vcnt").over(wg))
        .select(value_col, "g_cum")
    )

    # full (group x distinct value) grid so every CDF jump point of
    # either side is evaluated
    grid = (
        groups.select(group_col, "n_g")
        .crossJoin(gvals)
        .join(counts, [group_col, value_col], "left")
        .na.fill({"cnt": 0})
    )
    wv = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = (
        grid.withColumn("c_g", F.sum("cnt").over(wv))
        .join(F.broadcast(gcum), value_col)
        .join(F.broadcast(total))
        .withColumn("c_rest", F.col("g_cum") - F.col("c_g"))
        .withColumn("n_rest", F.col("n_all") - F.col("n_g"))
        .withColumn(
            "d_num",
            F.abs(
                F.col("c_g") * F.col("n_rest")
                - F.col("c_rest") * F.col("n_g")
            ),
        )
    )
    return (
        cdf.groupBy(group_col)
        .agg(
            F.max("n_g").alias("n"),
            F.max("d_num").alias("ks_num"),
            F.max(F.col("n_g") * F.col("n_rest")).alias("_den"),
        )
        .select(
            group_col,
            "n",
            (
                F.round(
                    F.try_divide(
                        F.col("ks_num").cast("double"), F.col("_den")
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("ks"),
        )
    )


def auc_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """(group, n, auc) — exact Mann-Whitney AUC of each group against
    the rest: P(group value > rest value) + 0.5 * P(tie), the
    stochastic-dominance EFFECT SIZE next to ks_drift's max-deviation
    statistic (0.5 = no shift). Assembled entirely in integers:
    U2x = sum over values of a_cnt * (2 * rest_cum_below + rest_at),
    auc = U2x / (2 * n_g * n_rest); only the final division is
    floating point. Same bounded distinct-value grid as ks_drift,
    same NULL contract: NULL values are excluded up front (in both
    engines) — Mann-Whitney is an order statistic and NULL has no
    place in the ranking."""
    df = df.na.drop(subset=[value_col])
    counts = (
        df.groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    groups = counts.groupBy(group_col).agg(F.sum("cnt").alias("n_g"))
    total = counts.agg(F.sum("cnt").alias("n_all"))
    wg = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gcum = (
        counts.groupBy(value_col)
        .agg(F.sum("cnt").alias("vcnt"))
        .withColumn("g_cum", F.sum("vcnt").over(wg))
        .select(value_col, "vcnt", "g_cum")
    )
    wv = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = (
        counts.withColumn("c_g", F.sum("cnt").over(wv))
        .join(F.broadcast(gcum), value_col)
        .join(F.broadcast(total))
        .withColumn("rest_at", F.col("vcnt") - F.col("cnt"))
        .withColumn(
            "rest_below",
            (F.col("g_cum") - F.col("vcnt")) - (F.col("c_g") - F.col("cnt")),
        )
        .withColumn(
            "u2x",
            F.col("cnt")
            * (F.lit(2) * F.col("rest_below") + F.col("rest_at")),
        )
    )
    return (
        cdf.groupBy(group_col)
        .agg(
            F.max(F.col("n_all")).alias("_n_all"),
            F.sum("cnt").alias("n"),
            F.sum("u2x").alias("_u2x"),
        )
        .select(
            group_col,
            "n",
            (
                F.round(
                    F.try_divide(
                        F.col("_u2x").cast("double"),
                        (F.lit(2) * F.col("n") * (F.col("_n_all") - F.col("n"))).cast("double"),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("auc"),
        )
    )


def auc_drift_sql(
    value_col: str, group_col: str, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`auc_drift` — identical integer assembly,
    identical NULL-exclusion contract."""
    return f"""
WITH counts AS (
  SELECT {group_col} AS grp, {value_col} AS val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
), total AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_all FROM counts
), gcum AS (
  SELECT val, vcnt,
         CAST(SUM(vcnt) OVER (ORDER BY val
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS g_cum
  FROM (SELECT val, CAST(SUM(cnt) AS BIGINT) AS vcnt FROM counts GROUP BY val)
), cdf AS (
  SELECT c.grp, c.val, c.cnt,
         CAST(SUM(c.cnt) OVER (PARTITION BY c.grp ORDER BY c.val
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_g,
         g.vcnt, g.g_cum, t.n_all
  FROM counts c JOIN gcum g ON c.val = g.val CROSS JOIN total t
)
SELECT grp AS {group_col},
       CAST(SUM(cnt) AS BIGINT) AS n,
       (ROUND(CAST(SUM(cnt * (2 * ((g_cum - vcnt) - (c_g - cnt)) + (vcnt - cnt))) AS DOUBLE)
              / CAST(2 * SUM(cnt) * (MAX(n_all) - SUM(cnt)) AS DOUBLE), 6) + 0.0) AS auc
FROM cdf
GROUP BY grp
"""


def ks_drift_sql(
    value_col: str, group_col: str, table: str = "documents"
) -> str:
    """DuckDB twin: identical integer assembly, identical grid,
    identical NULL-exclusion contract."""
    return f"""
WITH counts AS (
  SELECT {group_col} AS grp, {value_col} AS val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
), groups AS (
  SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_g FROM counts GROUP BY grp
), total AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_all FROM counts
), gcum AS (
  SELECT val, CAST(SUM(vcnt) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS g_cum
  FROM (SELECT val, SUM(cnt) AS vcnt FROM counts GROUP BY val)
), grid AS (
  SELECT g.grp, g.n_g, v.val, COALESCE(c.cnt, 0) AS cnt
  FROM groups g
  CROSS JOIN (SELECT DISTINCT val FROM counts) v
  LEFT JOIN counts c ON c.grp = g.grp AND c.val = v.val
), cdf AS (
  SELECT grid.grp, grid.n_g, grid.val,
         CAST(SUM(grid.cnt) OVER (PARTITION BY grid.grp ORDER BY grid.val
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_g,
         gcum.g_cum, total.n_all
  FROM grid JOIN gcum ON grid.val = gcum.val CROSS JOIN total
)
SELECT grp AS {group_col},
       MAX(n_g) AS n,
       (ROUND(CAST(MAX(ABS(c_g * (n_all - n_g) - (g_cum - c_g) * n_g)) AS DOUBLE)
              / MAX(n_g * (n_all - n_g)), 6) + 0.0) AS ks
FROM cdf
GROUP BY grp
"""
