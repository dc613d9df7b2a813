"""Incremental aggregate maintenance — the materialized-view refresh
primitive: fold a DELTA batch into an existing aggregate table
without touching historical raw data.

At 100 TB the raw fact history is cold storage; the daily pipeline
only sees the new partition. Any aggregate built from COMMUTATIVE
MONOID state (count, sum, min, max — and by extension mean via
(sum, count), the HLL registers in operators/sketches.py, CMS cells)
refreshes as new_state = old_state (+) agg(delta): one shuffle over
the delta plus a key-wise merge with the (much smaller) aggregate
table. The refresh invariant — incremental == full recompute — is
what makes the result trustworthy, and it is exactly what the oracle
and pytest pin here.

Plan shape: agg(delta) is a partial-aggregable shuffle on the delta
only; the merge is a full-outer equi-join on the aggregate's group
keys (aggregate rows ~ distinct keys, usually broadcastable; left as
a plain join so AQE picks, since a wide-key aggregate can be a
corpus-scale fact itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: monoid merge expressions per supported aggregate kind.
#: SUM must propagate NULL when BOTH sides are NULL (a group whose
#: measure values are all NULL has SUM NULL under a full recompute;
#: coalescing both sides to 0 would refresh it to 0 and break the
#: incremental == recompute invariant). count(*) is never NULL for a
#: present group, so plain coalesce-add is exact there.
_MERGE = {
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "sum": lambda a, b: F.when(
        a.isNull() & b.isNull(), F.lit(None)
    ).otherwise(F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))),
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
}


def agg_state(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Build the aggregate STATE table: ``measures`` maps output
    column -> (kind, source_col) with kind in count/sum/min/max
    (count ignores source_col)."""
    aggs = []
    for out, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum":
            aggs.append(F.sum(src).alias(out))
        elif kind == "min":
            aggs.append(F.min(src).alias(out))
        elif kind == "max":
            aggs.append(F.max(src).alias(out))
        else:
            raise ValueError(f"unsupported aggregate kind: {kind}")
    return df.groupBy(*keys).agg(*aggs)


def refresh(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """new_state = state (+) agg_state(delta): full-outer key join,
    per-measure monoid merge. Keys absent from either side pass
    through; min/max use least/greatest (NULL-ignoring)."""
    d = agg_state(delta, keys, measures)
    s = state
    for out in measures:
        s = s.withColumnRenamed(out, f"_old_{out}")
        d = d.withColumnRenamed(out, f"_new_{out}")
    joined = s.join(d, keys, "full_outer")
    cols = [F.col(k) for k in keys]
    for out, (kind, _src) in measures.items():
        cols.append(
            _MERGE[kind](
                F.col(f"_old_{out}"), F.col(f"_new_{out}")
            ).alias(out)
        )
    return joined.select(*cols)
