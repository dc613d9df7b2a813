"""Ordered first-match rule classification (SURVEY.md J6, P6, D7).

Reference: dcm2bids matches each DICOM series against the ordered rule
list in config.json (criteria are globs over SeriesDescription /
SidecarFilename, config.json:3-57); the first matching rule assigns
dataType/modalityLabel.

Spark-first: broadcast theta-join on LIKE predicates + row_number over
an explicit priority column — never file order (SURVEY.md §7.4#5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def glob_to_like(pattern: str) -> str:
    """Translate the reference's glob criteria (``*task*``, ``*64dir``)
    to SQL LIKE patterns. Escapes pre-existing %/_ literals."""
    return (
        pattern.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
    )


def classify_first_match(
    items: DataFrame,
    rules: DataFrame,
    item_key: str,
    criteria_field_col: str = "criteria_field",
    criteria_pattern_col: str = "criteria_pattern",
    priority_col: str = "priority",
) -> DataFrame:
    """Match items against ordered rules; first (lowest-priority-number)
    match wins. Unmatched items are kept with null rule columns.

    rules: (priority, ..., criteria_field, criteria_pattern) — the
    pattern is a glob matched against items[criteria_field]. The rules
    side is tiny (7 rows in config.json) -> broadcast; the LIKE
    theta-join is a BroadcastNestedLoopJoin, which at any scale is one
    map-side pass over items.

    First-match selection is ``min_by(rule_col, priority)`` grouped by
    the item row — a hash aggregate with map-side partial combine, so
    the shuffle carries one row per item, not one per (item, matched
    rule), and needs no sort. (A row_number window would shuffle AND
    sort every matched row — strictly worse at scale.)
    """
    prepared = rules.withColumn(
        "_like_pattern",
        F.regexp_replace(
            F.regexp_replace(F.col(criteria_pattern_col), r"([%_])", r"\\$1"),
            r"\*",
            "%",
        ),
    )
    fields = [
        r[0]
        for r in prepared.select(criteria_field_col).distinct().collect()
        if r[0] is not None
    ]
    # field dispatch: items[field] LIKE pattern, field chosen per rule.
    # Column-vs-column LIKE needs the SQL expression form.
    cond_sql = " OR ".join(
        f"(`{criteria_field_col}` = '{f_name}' AND `{f_name}` LIKE `_like_pattern`)"
        for f_name in fields
    )
    matched = items.join(
        F.broadcast(prepared),
        on=F.expr(cond_sql),
        how="left",
    )
    rule_cols = [c for c in rules.columns if c != priority_col]
    item_cols = [c for c in items.columns if c != item_key]
    # ONE min_by over a struct of all rule columns: independent per-column
    # min_by calls could mix columns from different rules when two
    # matching rules share a priority; the struct keeps the winning rule
    # row coherent (ties broken by the struct's column order, total).
    agg = matched.groupBy(item_key, *item_cols).agg(
        F.min(priority_col).alias(priority_col),
        F.min_by(
            F.struct(*[F.col(c) for c in rule_cols]),
            F.struct(F.col(priority_col), *[F.col(c) for c in rule_cols]),
        ).alias("_rule"),
    )
    return agg.select(
        item_key,
        *item_cols,
        priority_col,
        *[F.col(f"_rule.{c}").alias(c) for c in rule_cols],
    )
