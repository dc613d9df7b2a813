"""Longest-prefix-match (CIDR) join — the IP-to-network enrichment
every web-corpus pipeline runs for geo/ASN tagging, bot-range
filtering and per-network rate caps. A naive implementation is a
range join (ip BETWEEN net_lo AND net_hi) that Spark can only plan as
a broadcast-nested-loop with a post-filter; this operator re-expresses
it as ONE broadcast EQUI-join.

The trick (standard in software routers): group the prefix table by
prefix LENGTH — real tables use a handful of distinct lengths — and
have each fact row emit one candidate key per distinct length,
``ip >> (32 - len)``. A prefix of length L matches iff its shifted
network equals the shifted ip, so the join is a plain equi-join on
(len, shifted); the longest match is then a struct-max over the
per-row candidates (max prefix length wins; at most one network can
match per length, so the max is unique).

Scale: the prefix dim is KB-to-MB (broadcast); the fact side explodes
by len(distinct lengths) — bounded, known at plan time — and
aggregates straight back with a partial-aggregable struct-max. No
shuffle beyond the one keyed agg; no row-Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_cidr(cidr: str) -> tuple[int, int]:
    """'10.16.0.0/12' -> (network_as_int, prefix_len), validated:
    host bits below the mask must be zero."""
    net_s, _, len_s = cidr.partition("/")
    plen = int(len_s)
    if not 0 <= plen <= 32:
        raise ValueError(f"bad prefix length in {cidr!r}")
    parts = [int(p) for p in net_s.split(".")]
    if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
        raise ValueError(f"bad IPv4 network in {cidr!r}")
    net = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
    if plen < 32 and net & ((1 << (32 - plen)) - 1):
        raise ValueError(f"host bits set below /{plen} in {cidr!r}")
    return net, plen


def lpm_join(
    facts: DataFrame,
    prefixes: list[tuple[str, str]],
    ip_col: str = "ip",
) -> DataFrame:
    """Enrich ``facts`` with the longest matching (cidr, label).
    ``prefixes`` is [(cidr, label)]; rows with no match are dropped
    (include a 0.0.0.0/0 default to keep everything). Adds columns
    ``prefix_len`` (int) and ``label``."""
    parsed = []
    seen = set()
    for cidr, label in prefixes:
        net, plen = parse_cidr(cidr)
        if (net, plen) in seen:
            raise ValueError(f"duplicate prefix {cidr!r}")
        seen.add((net, plen))
        parsed.append((plen, net >> (32 - plen) if plen else 0, cidr, label))
    lengths = sorted({p[0] for p in parsed})

    spark = facts.sparkSession
    dim = spark.createDataFrame(
        parsed, "prefix_len int, shifted long, cidr string, label string"
    )
    # unique per-row key BEFORE the explode, so the post-join collapse
    # preserves duplicate fact rows (see groupBy note below)
    facts_keyed = facts.withColumn("_row", F.monotonically_increasing_id())
    # one candidate key per distinct prefix length, known at plan time
    cand = facts_keyed.withColumn(
        "_cand",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(plen).alias("prefix_len"),
                        F.shiftrightunsigned(
                            F.col(ip_col).cast("long"), 32 - plen
                        ).alias("shifted")
                        if plen
                        else F.lit(0).cast("long").alias("shifted"),
                    )
                    for plen in lengths
                ]
            )
        ),
    ).select("_row", *facts.columns, "_cand.prefix_len", "_cand.shifted")
    hit = cand.join(F.broadcast(dim), ["prefix_len", "shifted"])
    best = F.max(F.struct("prefix_len", "cidr", "label")).alias("_best")
    # Re-collapse the per-length candidates on the synthetic unique
    # row id, NOT on facts.columns: grouping by every fact column
    # would merge duplicate fact rows into one output row (silently
    # changing multiplicity) and fails outright for non-groupable
    # column types like maps. first() per fact column is exact here —
    # all candidate rows of one _row carry identical fact values.
    firsts = [F.first(c).alias(c) for c in facts.columns]
    return (
        hit.groupBy("_row")
        .agg(*firsts, best)
        .select(
            *facts.columns,
            F.col("_best.prefix_len").alias("prefix_len"),
            F.col("_best.cidr").alias("cidr"),
            F.col("_best.label").alias("label"),
        )
    )
