"""Per-round benchmark: runs the registered queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing uses the noop sink — full execution of the physical plan
without driver-side row materialization, so what's measured is the
engine, not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from neuroimaging_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ndp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def run(name, fn):
        # best of 2: first execution pays one-off costs (scan cache,
        # codegen, Python worker spawn) that vanish in steady state —
        # the number recorded is engine throughput, not JVM warmup
        best = None
        for _ in range(2):
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)

    # Full untimed warm-up pass: every query runs once BEFORE any
    # timing, so one-off costs (JVM JIT, codegen, scan caches, Python
    # worker spawn, fixture writes, cache materialization) land here
    # and the timed numbers are steady-state regardless of
    # registration order. Round-2 lesson: warming only two queries
    # left 2-3x cold-start noise on whichever queries ran first,
    # swamping per-query regression tracking.
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass  # the timed loop below reports the error

    for name, fn in entrymod.queries().items():
        try:
            run(name, fn)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    full, line = summarize(timings, sf)
    full_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    try:
        full_path.write_text(json.dumps(full, separators=(",", ":")))
    except OSError:
        pass
    print(json.dumps(full, separators=(",", ":")), file=sys.stderr)
    print(json.dumps(line, separators=(",", ":")))
    spark.stop()


#: the driver records only the last this-many chars of stdout
DRIVER_CAPTURE_WINDOW = 2000
#: headroom under the window for the single stdout line
LINE_BUDGET = 1800


def summarize(timings: dict[str, float], sf: str) -> tuple[dict, dict]:
    """(full_record, stdout_line). The driver records only the LAST
    2000 chars of stdout and json-parses that (r4's full 152-query
    line was ~4 KB -> the recorded tail was unparseable,
    BENCH_r04.json "parsed": null). Contract: stdout is EXACTLY one
    compact JSON line that fits the window — summary totals plus as
    many slowest-query timings as fit — while the complete per-query
    map goes to BENCH_FULL.json (and stderr). Pinned in
    tests/test_bench_output.py against the real registry size."""
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # r14 (VERDICT r13 item 4): stamp the side artifact with the
        # core count so a 32-core and an 8-core run are
        # self-describing. The stdout line's keys are UNCHANGED — the
        # driver contract is untouched.
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", 0) or 0),
    }
    full_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    while True:
        line = {
            "metric": "total_query_runtime",
            "value": total,
            "unit": "sec",
            "n_queries": len(timings),
            "queries_full": str(full_path),
            "queries": slowest,
            "sf": sf_val,
        }
        if len(json.dumps(line, separators=(",", ":"))) <= LINE_BUDGET:
            return full, line
        slowest = dict(list(slowest.items())[: max(1, len(slowest) - 10)])


if __name__ == "__main__":
    main()
