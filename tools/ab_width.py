"""A/B the read_table width policy per query (VERDICT r6 task #2).

The r6 uniform ``min_partitions="cores"`` policy made ~8 sub-second
light-parse queries 1.5-1.9x slower at sf0.1 (5000-row fixtures spread
32 ways pay per-task overhead the parse never amortizes), while the
heavy codec family demonstrably needs the full width. This tool times
each query under both symbolic widths by overriding the call site's
request inside ``read_table`` itself, same session, interleaved runs —
so the choice of which call sites switch to "auto" is measured, not
guessed.

Usage: python tools/ab_width.py [sf_dir] [query ...] [--widths cores,auto,8,1]
Prints one line per query: median secs under each width policy.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# default set: the r6 regression cluster + heavy-codec controls that
# the cores width demonstrably helped (they must NOT regress under any
# policy change we land)
DEFAULT = [
    "m6_gzip_text", "m8_mp4_meta", "m10_audio_frames", "m13_tar_samples",
    "m14_jsonl_shards", "m15_bmp_stats", "s13_avro_scan",
    "e4_multimodal_pipeline",
    # controls (heavy decode):
    "m7_jpeg_color", "m11_jpeg_progressive", "m21_h264_intra",
    "m28_flac_audio",
]

RUNS = 3


def main() -> int:
    args = sys.argv[1:]
    policies: list[str | int] = ["cores", "auto"]
    if "--widths" in args:
        i = args.index("--widths")
        policies = [
            w if w in ("cores", "auto") else int(w)
            for w in args[i + 1].split(",")
        ]
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a] or DEFAULT

    import neuroimaging_data_pipeline_spark as ndp
    from neuroimaging_data_pipeline_spark.sources import tables as T
    from neuroimaging_data_pipeline_spark import queries as Q

    spark = ndp.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.all_queries()

    orig = T.read_table
    override: dict[str, str | int | None] = {"policy": None}

    def patched(spark, sf_dir, name, min_partitions=None):
        if min_partitions is not None and override["policy"] is not None:
            min_partitions = override["policy"]
        return orig(spark, sf_dir, name, min_partitions=min_partitions)

    # Most query modules bind read_table at MODULE level
    # (``from ...tables import read_table``), so patching the tables
    # module alone does nothing for them — rebind the name in every
    # already-imported module that holds a direct reference.
    T.read_table = patched
    import sys as _sys

    for mod in list(_sys.modules.values()):
        if mod is not None and getattr(mod, "read_table", None) is orig:
            mod.read_table = patched

    def run(name: str, policy: str) -> float:
        override["policy"] = policy
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        return time.perf_counter() - t0

    # one untimed warmup of the whole set (JIT, codegen caches)
    for n in names:
        run(n, policies[0])

    hdr = " ".join(f"{str(p):>7s}" for p in policies)
    print(f"{'query':30s} {hdr}")
    for n in names:
        # interleave policies so drift hits both equally
        ts: dict[str | int, list[float]] = {p: [] for p in policies}
        for _ in range(RUNS):
            for p in policies:
                ts[p].append(run(n, p))
        meds = " ".join(
            f"{statistics.median(ts[p]):7.3f}" for p in policies
        )
        print(f"{n:30s} {meds}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
