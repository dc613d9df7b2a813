"""Runtime bloom-filter join pruning (Spark's row-level runtime filter).

At 100 TB the classic shape is a fact-to-fact sort-merge join where
one side carries a selective predicate: without a runtime filter the
un-predicated side shuffles EVERY row, then the join drops most of
them. Spark's `spark.sql.optimizer.runtime.bloomFilter.enabled`
injects a bloom filter built from the filtered (creation) side and
applies `might_contain` on the other (application) side BEFORE its
shuffle — the probe-side scan+exchange shrinks to roughly the
matching keys. This is the optimizer feature that keeps our 8
declared fact-to-fact SMJ sites (PLANS.md) affordable when the
driving side is selective, so pin that (a) the filter is actually
injected on this Spark build under the documented configs, and
(b) results are identical with it on and off.

The size thresholds default to cluster scale
(`applicationSideScanSizeThreshold` 10GB); the test lowers them the
same way a real job tunes them, which is itself the documented
recipe for enabling the filter on mid-size tables.
"""

from __future__ import annotations

import pytest

from neuroimaging_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="ndp-bloom-tests", master="local[4]")
    yield s


BLOOM_CONFS = {
    # force the fact-to-fact (non-broadcast) join shape
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local tables are far below the cluster-scale defaults
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the injected filter from being swapped to a semi-join dpp form
    "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
}


def _with_confs(spark, confs):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _tables(spark, tmp_path):
    # parquet-backed so the planner has real size statistics
    big = spark.range(0, 200_000).selectExpr(
        "id", "id % 1000 as k", "id * 7 as payload"
    )
    sel = spark.range(0, 50_000).selectExpr(
        "id % 1000 as k", "id as other", "id % 97 as grp"
    )
    bp, sp = str(tmp_path / "big"), str(tmp_path / "sel")
    big.write.mode("overwrite").parquet(bp)
    sel.write.mode("overwrite").parquet(sp)
    return bp, sp


def test_bloom_filter_injected_and_result_identical(spark, tmp_path):
    bp, sp = _tables(spark, tmp_path)

    def build():
        # rebuilt under each conf set: a DataFrame memoizes its
        # queryExecution, so reusing one would freeze the first plan
        big, sel = spark.read.parquet(bp), spark.read.parquet(sp)
        return big.join(sel.where("grp = 0"), "k").groupBy("k").count()

    old = _with_confs(spark, BLOOM_CONFS)
    try:
        joined = build()
        plan_on = joined._jdf.queryExecution().executedPlan().toString()
        with_filter = joined.collect()
    finally:
        _restore(spark, old)

    assert "might_contain" in plan_on or "bloom_filter" in plan_on, (
        "runtime bloom filter was not injected; plan:\n" + plan_on[:4000]
    )

    off = dict(BLOOM_CONFS)
    off["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
    old = _with_confs(spark, off)
    try:
        joined = build()
        plan_off = joined._jdf.queryExecution().executedPlan().toString()
        without_filter = joined.collect()
    finally:
        _restore(spark, old)

    assert "might_contain" not in plan_off
    assert sorted(map(tuple, with_filter)) == sorted(map(tuple, without_filter))
    assert "SortMergeJoin" in plan_on, "expected the fact-to-fact SMJ shape"
