"""Plan-quality report over every registered query.

Prints, per query: shuffle (Exchange) count, broadcast vs sort-merge
join counts, row-Python operator count, pushed filters, and scan
column widths — the properties that decide whether the same plan
survives a 1000-executor / 100 TB deployment (SURVEY.md §4).

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from neuroimaging_data_pipeline_spark.plans.audit import (
        broadcast_join_count,
        exchange_count,
        explain_str,
        pushed_filters,
        python_eval_count,
        read_schemas,
        sortmerge_join_count,
    )
    from neuroimaging_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ndp-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    header = f"{'query':28s} {'exch':>4s} {'bhj':>3s} {'smj':>3s} {'pyrow':>5s}  scan-cols / pushed"
    print(header)
    print("-" * len(header))
    for name, fn in sorted(entrymod.queries().items()):
        if only and name not in only:
            continue
        try:
            plan = explain_str(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {e}")
            continue
        cols = ",".join(str(s.count(":")) for s in read_schemas(plan)) or "-"
        pushed = "; ".join(pushed_filters(plan))[:60] or "-"
        print(
            f"{name:28s} {exchange_count(plan):4d} "
            f"{broadcast_join_count(plan):3d} "
            f"{sortmerge_join_count(plan):3d} "
            f"{python_eval_count(plan):5d}  [{cols}] {pushed}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
