"""Sketch aggregations: error bounds vs exact computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.queries.relational import (
    a_approx_sketches,
)
from neuroimaging_data_pipeline_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    """The hash-matchable form (VERDICT r8 #2): every error-bound
    boolean is TRUE and the exact columns match an independent exact
    aggregate."""
    got = a_approx_sketches(spark, SF_DIR).toPandas().set_index("l_returnflag")
    li = read_table(spark, SF_DIR, "lineitem")
    exact = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in exact.index:
        e, g = exact.loc[flag], got.loc[flag]
        assert g.n_rows == e.n
        assert g.exact_parts == e.parts
        assert bool(g.parts_within_3rsd)
        assert bool(g.median_rank_ok)
        assert bool(g.p95_rank_ok)


def test_raw_sketches_within_error_bounds(spark):
    """The raw sketch outputs (pre-reshape form) stay within their
    advertised error bounds vs exact computation."""
    li = read_table(spark, SF_DIR, "lineitem")
    both = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
            F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx_p95"),
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in both.index:
        g = both.loc[flag]
        assert abs(g.approx_parts - g.parts) / g.parts < 0.05
        assert abs(g.approx_median - g["median"]) / g["median"] < 0.01
        assert abs(g.approx_p95 - g.p95) / g.p95 < 0.01


def test_hll_deterministic_accuracy(spark):
    """The md5-pinned HLL estimate lands within ~3 standard errors
    (256 registers -> 6.5% rel. error) of the true cardinality, and
    is exactly reproducible across partitionings (deterministic
    hash -> deterministic registers)."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    n_true = 5000
    df = spark.range(n_true * 3).select(
        (F.col("id") % n_true).alias("v"),
        (F.col("id") % 2).cast("string").alias("g"),
    )
    out = {r.g: r.estimate for r in hll_distinct(df, "v", "g").collect()}
    # n_true is even, so each parity group only ever sees values of
    # its own parity: 2500 distinct per group.
    for g, est in out.items():
        assert abs(est - 2500) / 2500 < 0.2, (g, est)
    out2 = {
        r.g: r.estimate
        for r in hll_distinct(df.repartition(17), "v", "g").collect()
    }
    assert out == out2


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch and stay
    within a few percent."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.sketches import (
        hll_distinct,
    )

    df = spark.range(40).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v").collect()[0].estimate
    assert abs(est - 40) <= 4, est


def test_bloom_no_false_negatives(spark):
    """Every build-side value probes as a hit (Bloom's hard
    guarantee); non-members may false-positive but at M=8192/K=3 and
    200 build keys the rate stays low."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.sketches import (
        bloom_build_probe,
    )

    build = spark.range(200).select((F.col("id") * 7).alias("k"))
    probe = spark.range(2000).select((F.col("id") * 7).alias("k"))
    out = {r.k: r.bloom_hit for r in
           bloom_build_probe(build, probe, "k", "k").collect()}
    members = {i * 7 for i in range(200)}
    assert all(out[k] == 1 for k in members)
    fp = sum(v for k, v in out.items() if k not in members)
    assert fp / (len(out) - len(members)) < 0.05, fp


def test_cms_overestimate_only_and_exactness(spark):
    """Count-min estimates are >= true counts (collisions only
    inflate), exact for keys whose cells are collision-free, and
    deterministic across partitionings."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    # skewed: key 0 appears 500x, keys 1..99 appear (k % 7) + 1 times
    rows = [(0,)] * 500 + [(k,) for k in range(1, 100) for _ in range(k % 7 + 1)]
    df = spark.createDataFrame(rows, "v long")
    out = {r.v: (r.estimate, r.true_count)
           for r in cms_heavy_hitters(df, "v", k=100).collect()}
    assert out[0][1] == 500
    for v, (est, true) in out.items():
        assert est >= true, (v, est, true)
    # the heavy hitter tops the ranking
    top = cms_heavy_hitters(df, "v", k=1).collect()[0]
    assert top.v == 0 and top.estimate >= 500
    out2 = {r.v: (r.estimate, r.true_count)
            for r in cms_heavy_hitters(df.repartition(13), "v", k=100).collect()}
    assert out == out2


def test_hll_mergeable_incremental(spark):
    """THE scale property: register tables merge by max per bucket —
    associative, commutative, idempotent — so an incremental
    micro-batch build equals the one-shot sketch exactly. Simulates
    the foreachBatch shape: three disjoint (plus one OVERLAPPING)
    batches merged register-by-register."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    full = spark.range(3000).select((F.col("id") % 1100).alias("v"))
    # three micro-batches by id range + a fourth that REPEATS batch 1
    b1 = spark.range(0, 1000).select((F.col("id") % 1100).alias("v"))
    b2 = spark.range(1000, 2000).select((F.col("id") % 1100).alias("v"))
    b3 = spark.range(2000, 3000).select((F.col("id") % 1100).alias("v"))
    state = hll_registers(b1, "v")
    for b in (b2, b3, b1):  # re-processing b1 = at-least-once delivery
        state = hll_merge(state, hll_registers(b, "v"))
    inc = hll_estimate(state).collect()[0]
    one_shot = hll_distinct(full, "v").collect()[0]
    assert inc.estimate == one_shot.estimate
    assert inc.used_registers == one_shot.used_registers


def test_cms_mergeable_incremental(spark):
    """CMS counters merge by cell-wise ADDITION (disjoint batches) —
    incremental micro-batch counter tables summed cell-wise equal the
    one-shot sketch, so estimates and top-k match exactly."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        _cms_pos,
        cms_heavy_hitters,
    )

    full = spark.range(4000).select((F.col("id") % 300).alias("v"))

    def counters(df):
        return (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(d).alias("_d"),
                                _cms_pos(F.col("v"), d).alias("_w"),
                            )
                            for d in range(CMS_D)
                        ]
                    )
                ).alias("_c")
            )
            .groupBy("_c._d", "_c._w")
            .agg(F.count(F.lit(1)).alias("_n"))
        )

    one_shot = {(r._d, r._w): r._n for r in counters(full).collect()}
    merged: dict = {}
    for lo, hi in ((0, 1500), (1500, 3000), (3000, 4000)):
        part = spark.range(lo, hi).select((F.col("id") % 300).alias("v"))
        for r in counters(part).collect():
            merged[(r._d, r._w)] = merged.get((r._d, r._w), 0) + r._n
    assert merged == one_shot
