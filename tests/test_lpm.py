"""Longest-prefix-match CIDR join (operators/lpm.py): hand-checked
longest-match semantics on nested prefixes, CIDR validation, and the
plan shape (broadcast equi-join, never a nested-loop range join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.lpm import (
    lpm_join,
    parse_cidr,
)

PFX = [
    ("0.0.0.0/0", "default"),
    ("10.0.0.0/8", "corp"),
    ("10.16.0.0/12", "corp-east"),
    ("10.16.32.0/19", "corp-east-dc2"),
    ("192.168.0.0/16", "rfc1918"),
]


def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


def test_parse_cidr_and_validation():
    assert parse_cidr("10.16.0.0/12") == (_ip(10, 16, 0, 0), 12)
    assert parse_cidr("0.0.0.0/0") == (0, 0)
    with pytest.raises(ValueError, match="host bits"):
        parse_cidr("10.16.1.0/12")  # bits below /12 set
    with pytest.raises(ValueError, match="prefix length"):
        parse_cidr("10.0.0.0/33")
    with pytest.raises(ValueError, match="network"):
        parse_cidr("10.0.0/8")


def test_longest_match_wins_hand_cases(spark):
    cases = [
        (_ip(10, 16, 32, 7), "corp-east-dc2"),   # matches /8 /12 /19
        (_ip(10, 16, 64, 1), "corp-east"),       # /8 /12, not /19
        (_ip(10, 200, 0, 1), "corp"),            # /8 only
        (_ip(192, 168, 3, 4), "rfc1918"),
        (_ip(8, 8, 8, 8), "default"),            # only the /0
    ]
    df = spark.createDataFrame(
        [(i, ip) for i, (ip, _) in enumerate(cases)], "row_id int, ip long"
    )
    out = {
        r.row_id: (r.label, r.prefix_len)
        for r in lpm_join(df, PFX).collect()
    }
    assert len(out) == len(cases)
    for i, (_ip_, want) in enumerate(cases):
        assert out[i][0] == want, (i, out[i])


def test_no_default_drops_unmatched(spark):
    df = spark.createDataFrame([(1, _ip(8, 8, 8, 8))], "row_id int, ip long")
    assert lpm_join(df, PFX[1:]).count() == 0


def test_duplicate_prefix_rejected(spark):
    df = spark.createDataFrame([(1, 0)], "row_id int, ip long")
    with pytest.raises(ValueError, match="duplicate"):
        lpm_join(df, PFX + [("10.0.0.0/8", "again")])


def test_plan_is_broadcast_equi_join_not_bnlj(spark):
    df = spark.range(1000).select(
        F.col("id").alias("row_id"),
        ((F.col("id") * 2654435761) % 4294967296).alias("ip"),
    )
    plan = lpm_join(df, PFX)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_duplicate_fact_rows_keep_multiplicity(spark):
    # the collapse after the per-length explode must key on a synthetic
    # row id, not the fact columns: two IDENTICAL fact rows are two
    # output rows, and map-typed fact columns must not break groupBy
    ip = _ip(10, 16, 32, 7)
    df = spark.createDataFrame(
        [(ip, {"k": "v"}), (ip, {"k": "v"}), (ip, {"k": "w"})],
        "ip long, attrs map<string,string>",
    )
    rows = lpm_join(df, PFX).collect()
    assert len(rows) == 3
    assert all(r.label == "corp-east-dc2" for r in rows)
    assert sorted(r.attrs["k"] for r in rows) == ["v", "v", "w"]
