"""A/B a few registered queries under optional extra Spark confs.

Times each named query with the bench's exact methodology (untimed
warm-up, then min-of-N noop-sink runs) inside ONE fresh session built
with the requested conf overrides, so a candidate session conf or a
query rewrite can be measured the way the driver will measure it.

Usage:
  python tools/ab_query.py [--conf k=v ...] [--runs N] [--sf DIR] q [q ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from neuroimaging_data_pipeline_spark.session import get_spark

    for kv in args.conf:
        if "=" not in kv:
            ap.error(f"--conf expects key=value, got {kv!r}")
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="ndp-ab", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}:warm")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(args.runs):
            df = fn(spark, args.sf)
            spark.sparkContext.setJobDescription(f"ab:{name}:{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(
            f"{name:28s} min={min(times):7.3f}  "
            f"runs={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
