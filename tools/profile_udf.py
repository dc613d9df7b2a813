"""Profile the Python-worker side of one or more registered queries.

Uses Spark 4's session-level UDF profiler
(``spark.sql.pyspark.udf.profiler=perf``): runs each named query to
the noop sink, then prints the aggregated cProfile output for every
Python evaluation node in its plan — the in-situ view of where the
Arrow-batch codec time actually goes (guide §1/§4: measure before
touching per-task work).

Usage: python tools/profile_udf.py [--sf DIR] query [query ...]
(an explicit --sf flag, r14: the old positional-path sniffing silently
ate a mistyped query name containing '/')
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args_ns = ap.parse_args()
    sf_dir, names = args_ns.sf, args_ns.queries

    import __spark_entry__ as entrymod
    from neuroimaging_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="ndp-udf-profile",
        extra_conf={"spark.sql.pyspark.udf.profiler": "perf"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"\n================ {name} ================")
        try:
            spark.profile.show(type="perf")
        except Exception as e:  # noqa: BLE001
            print(f"profiler unavailable: {e}")
        spark.profile.clear()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
