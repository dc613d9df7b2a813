"""Deterministic, engine-checkable sketches: HyperLogLog distinct
counting and Bloom-filter membership — the two one-pass, mergeable,
bounded-memory primitives a 100 TB pipeline leans on (cardinality
estimation for planning/dedup sizing; Bloom pruning before expensive
joins).

Spark's own ``approx_count_distinct`` / ``bloom_filter_agg`` are the
production defaults, but their sketch internals are engine-specific,
which is why ``a_approx_sketches`` can only be rows-only checked.
These variants fix the hash family to md5 (the repo-wide parity
discipline: MinHash, SimHash, CDC), so DuckDB recomputes IDENTICAL
registers / bit positions and the driver's value-hash gate applies to
the whole sketch path end-to-end — estimate included.

All hash arithmetic stays in <= 52-bit integers (exact in BIGINT and
in any double-passing layer on both engines): the HLL word is the
first 13 hex chars of md5, split by bit shifts; Bloom positions are
16-bit hex slices mod M. No 64-bit unsigned division anywhere.

Scale shape: both are pure column expressions + ONE partial-aggregable
group-by (max per HLL register / bit-position set union); registers
and bit arrays are KB-scale dims. No Python rows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: HLL: m = 2^P registers. P=8 -> 256 registers, ~6.5% rel. error.
HLL_P = 8
#: bits of md5 used: top P = bucket, the remaining W bits feed rho.
HLL_W = 44

#: Bloom: M bits, K md5-salted hash functions.
BLOOM_M = 8192
BLOOM_K = 3


def _hll_alpha(m: int) -> float:
    # standard bias constants (Flajolet et al. 2007)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(
    df: DataFrame, value_col: str, group_col: str | None = None
) -> DataFrame:
    """HyperLogLog distinct-count estimate with a FIXED md5 hash:
    h = first 13 hex chars of md5(value) as a 52-bit int; bucket =
    h >> 44 (top P=8 bits); w = low 44 bits; rho = 45 - bit_length(w)
    (w = 0 -> 45). Registers = max(rho) per bucket; estimate =
    alpha * m^2 / sum(2^-M_j) over all m registers (absent registers
    contribute 2^0), with the standard linear-counting small-range
    correction when E <= 2.5m and empty registers exist.
    Deterministic end-to-end, so the DuckDB twin reproduces registers
    AND estimate bit-for-bit (rounded to 4).

    One shuffle on (group, bucket) compact keys with map-side max
    partials; the register table is <= m rows per group (KB)."""
    return hll_estimate(
        hll_registers(df, value_col, group_col), group_col
    )


def hll_registers(
    df: DataFrame, value_col: str, group_col: str | None = None
) -> DataFrame:
    """The sketch STATE: (group?, _b, _mj) register rows. This is the
    mergeable artifact — two register tables over disjoint (or
    overlapping!) data merge by max per bucket, which is what makes
    HLL incremental across micro-batches, shards, and days at 100 TB;
    pinned in tests/test_sketches.py (foreachBatch merge == one-shot)."""
    keys = [group_col] if group_col else []
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    bucket = F.shiftright(h, HLL_W)
    w = h.bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = F.when(F.col("_w") == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.conv(F.col("_w"), 10, 2))
    )
    return (
        df.select(*keys, bucket.alias("_b"), w.alias("_w"))
        .withColumn("_rho", rho)
        .groupBy(*keys, "_b")
        .agg(F.max("_rho").alias("_mj"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_col: str | None = None) -> DataFrame:
    """Merge two register tables (max per bucket) — the sketch-union
    operation; associative, commutative, idempotent."""
    keys = [group_col] if group_col else []
    return (
        a.unionByName(b)
        .groupBy(*keys, "_b")
        .agg(F.max("_mj").alias("_mj"))
    )


def hll_estimate(
    regs: DataFrame, group_col: str | None = None
) -> DataFrame:
    """(group?, used_registers, estimate) from a register table."""
    keys = [group_col] if group_col else []
    m = 1 << HLL_P
    alpha = _hll_alpha(m)
    agg = (
        regs.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_nz"),
            F.sum(F.pow(F.lit(2.0), -F.col("_mj"))).alias("_sum_nz"),
        )
        .withColumn("_sum", F.col("_sum_nz") + (F.lit(m) - F.col("_nz")))
        .withColumn("_e_raw", F.lit(alpha * m * m) / F.col("_sum"))
        .withColumn(
            "estimate",
            F.round(
                F.when(
                    (F.col("_e_raw") <= F.lit(2.5 * m))
                    & (F.col("_nz") < F.lit(m)),
                    F.lit(float(m))
                    * F.log(F.lit(float(m)) / (F.lit(m) - F.col("_nz"))),
                ).otherwise(F.col("_e_raw")),
                4,
            )
            + F.lit(0.0),
        )
    )
    return agg.select(
        *keys, F.col("_nz").alias("used_registers"), "estimate"
    )


def hll_distinct_sql(
    value_col: str,
    group_col: str | None,
    table: str,
) -> str:
    """DuckDB twin: identical md5 bucketing, rho, and estimate."""
    m = 1 << HLL_P
    alpha = _hll_alpha(m)
    keys = f"{group_col}, " if group_col else ""
    gb1 = f"GROUP BY {group_col}, _b" if group_col else "GROUP BY _b"
    gb2 = f"GROUP BY {group_col}" if group_col else ""
    return f"""
WITH h AS (
  SELECT {keys}
         CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
  FROM {table}
), parts AS (
  SELECT {keys}
         (hv >> {HLL_W}) AS _b,
         (hv & {(1 << HLL_W) - 1}) AS _w
  FROM h
), regs AS (
  SELECT {keys} _b,
         MAX(CASE WHEN _w = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W + 1} - length(bin(_w)) END) AS _mj
  FROM parts {gb1}
), agg AS (
  SELECT {keys}
         CAST(COUNT(*) AS BIGINT) AS _nz,
         SUM(POWER(2.0, -_mj)) AS _sum_nz
  FROM regs {gb2}
)
SELECT {keys}
       _nz AS used_registers,
       (ROUND(CASE WHEN CAST('{alpha * m * m!r}' AS DOUBLE) / (_sum_nz + ({m} - _nz)) <= {2.5 * m}
                    AND _nz < {m}
                   THEN {float(m)} * ln({float(m)} / ({m} - _nz))
                   ELSE CAST('{alpha * m * m!r}' AS DOUBLE) / (_sum_nz + ({m} - _nz))
              END, 4) + 0.0) AS estimate
FROM agg
"""


def bloom_build_probe(
    build: DataFrame,
    probe: DataFrame,
    build_col: str,
    probe_col: str,
) -> DataFrame:
    """Deterministic Bloom membership: the build side's values set
    K md5-salted bit positions in an M-bit filter; each probe value is
    'maybe present' iff ALL K of its positions are set. Returns the
    probe rows with a ``bloom_hit`` int (1/0) — the pruning predicate
    a 100 TB pipeline applies BEFORE an expensive join (false
    positives possible, false negatives impossible; both engines
    compute identical bits, so even the false positives match).

    Positions: int of md5 hex chars [1+4k, 4+4k) (16 bits per salt
    slice of the SALTED hash) mod M. Plan: the set-bit table is a
    distinct-aggregated <= M-row dim broadcast to the probe scan;
    probing is K broadcast left joins + an all-present check — no
    probe-side shuffle at all."""
    def positions(col):
        salted = F.md5(F.concat(F.lit("bloom:"), col.cast("string")))
        return [
            (
                F.conv(F.substring(salted, 1 + 4 * k, 4), 16, 10)
                .cast("long") % F.lit(BLOOM_M)
            ).alias(f"_p{k}")
            for k in range(BLOOM_K)
        ]

    bits = (
        build.select(
            F.explode(F.array(*positions(F.col(build_col)))).alias("_bit")
        )
        .distinct()
    )
    p = probe.select(F.col(probe_col), *positions(F.col(probe_col)))
    out = p
    for k in range(BLOOM_K):
        out = out.join(
            F.broadcast(bits.withColumnRenamed("_bit", f"_hit{k}")),
            on=[F.col(f"_p{k}") == F.col(f"_hit{k}")],
            how="left",
        )
    hit = None
    for k in range(BLOOM_K):
        c = F.col(f"_hit{k}").isNotNull()
        hit = c if hit is None else (hit & c)
    return out.select(
        F.col(probe_col),
        F.when(hit, F.lit(1)).otherwise(F.lit(0)).alias("bloom_hit"),
    )


def _pos_sql(col: str, k: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5('bloom:' || CAST({col} AS VARCHAR)),"
        f" {1 + 4 * k}, 4)) AS BIGINT) % {BLOOM_M})"
    )


def bloom_probe_sql(
    build_col: str,
    probe_col: str,
    build_from: str,
    probe_from: str,
) -> str:
    """DuckDB twin: identical salted positions and all-K check.
    ``build_from`` / ``probe_from`` are FROM-clause bodies (table or
    parenthesized subquery) producing the respective columns."""
    pos_union = " UNION ".join(
        f"SELECT {_pos_sql(build_col, k)} AS _bit FROM {build_from}"
        for k in range(BLOOM_K)
    )
    checks = " AND ".join(
        f"{_pos_sql(probe_col, k)} IN (SELECT _bit FROM bits)"
        for k in range(BLOOM_K)
    )
    return f"""
WITH bits AS (
  {pos_union}
)
SELECT {probe_col},
       CAST(CASE WHEN {checks} THEN 1 ELSE 0 END AS INT) AS bloom_hit
FROM {probe_from}
"""


#: Count-min sketch: D salted hash rows, W counters per row.
CMS_D = 4
CMS_W = 1024


def _cms_pos(col, d: int) -> F.Column:
    """Row-d counter index: 16-bit slice [1+4d, 4+4d) of the salted
    md5, mod W — same exact-small-integer discipline as Bloom."""
    salted = F.md5(F.concat(F.lit("cms:"), col.cast("string")))
    return (
        F.conv(F.substring(salted, 1 + 4 * d, 4), 16, 10).cast("long")
        % F.lit(CMS_W)
    )


def cms_heavy_hitters(
    df: DataFrame, value_col: str, k: int = 10
) -> DataFrame:
    """Count-min heavy hitters with a FIXED md5 hash family: every
    value increments one counter per row (D x W table, KB-scale, one
    partial-aggregable shuffle); a value's frequency estimate is the
    MIN of its D counters (over-estimate only — collisions can
    inflate, never deflate). Returns the top-``k`` distinct values by
    (estimate DESC, value ASC) with their estimates and, at this
    checkable scale, the true counts alongside.

    This is the bounded-memory frequency/heavy-hitter primitive at
    100 TB (trending keys, hot-shard detection, vocabulary heads)
    where exact per-key counts would be a corpus-wide shuffle on an
    unbounded key domain: the sketch is D*W counters regardless of
    cardinality and merges by cell-wise addition. Deterministic hash
    -> both engines compute identical counters, estimates, and
    top-k."""
    counters = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("_d"),
                            _cms_pos(F.col(value_col), d).alias("_w"),
                        )
                        for d in range(CMS_D)
                    ]
                )
            ).alias("_c")
        )
        .groupBy("_c._d", "_c._w")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    vals = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("true_count"))
    probed = vals.select(
        value_col,
        "true_count",
        *[_cms_pos(F.col(value_col), d).alias(f"_p{d}") for d in range(CMS_D)],
    )
    out = probed
    for d in range(CMS_D):
        out = out.join(
            F.broadcast(
                counters.filter(F.col("_d") == d).select(
                    F.col("_w").alias(f"_p{d}"), F.col("_n").alias(f"_n{d}")
                )
            ),
            f"_p{d}",
        )
    est = F.least(*[F.col(f"_n{d}") for d in range(CMS_D)])
    ranked = out.select(
        value_col, est.alias("estimate"), "true_count"
    )
    w = Window.orderBy(F.desc("estimate"), F.asc(value_col))
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cms_heavy_hitters_sql(value_col: str, table: str, k: int = 10) -> str:
    """DuckDB twin: identical salted positions, counters, min-estimate
    and top-k key."""
    def pos(col, d):
        return (
            f"(CAST(('0x' || substr(md5('cms:' || CAST({col} AS VARCHAR)),"
            f" {1 + 4 * d}, 4)) AS BIGINT) % {CMS_W})"
        )

    cnt_union = " UNION ALL ".join(
        f"SELECT {d} AS _d, {pos(value_col, d)} AS _w FROM {table}"
        for d in range(CMS_D)
    )
    est = "LEAST(" + ", ".join(
        f"(SELECT _n FROM counters c WHERE c._d = {d}"
        f" AND c._w = {pos('v.' + value_col, d)})"
        for d in range(CMS_D)
    ) + ")"
    return f"""
WITH cells AS (
  {cnt_union}
), counters AS (
  SELECT _d, _w, CAST(COUNT(*) AS BIGINT) AS _n FROM cells GROUP BY _d, _w
), vals AS (
  SELECT {value_col}, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM {table} GROUP BY {value_col}
), ranked AS (
  SELECT v.{value_col}, {est} AS estimate, v.true_count,
         ROW_NUMBER() OVER (ORDER BY {est} DESC, v.{value_col} ASC) AS rn
  FROM vals v
)
SELECT {value_col}, estimate, true_count FROM ranked WHERE rn <= {k}
"""
