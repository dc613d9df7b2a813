"""Acceptance gate: run the REAL bench harness end-to-end and diff it
against a reference per-query map (VERDICT r13 item 7 — isolated
min-of-N sessions repeatedly disagreed with the driver's full-suite
cold runs, so the full harness is the only measurement this gate
accepts).

Runs ``bench.py`` as a subprocess once per requested core count (the
driver's own methodology: full warm-up pass, min-of-2 noop-sink
timings, one session per run), then compares each run's per-query map
against the reference artifact and FAILS (exit 1) when any query
regresses by more than ``--tolerance`` (default 25%) beyond a small
absolute floor, or when a reference query disappeared.

Usage:
  python tools/bench_gate.py [--ref BENCH_r13.json|BENCH_FULL.json]
                             [--cpus 32 8] [--sf /root/testdata/sf0.1]
                             [--tolerance 0.25] [--abs-floor 0.3]
                             [--out PREFIX]

The reference accepts either a driver ``BENCH_rNN.json`` record (uses
its ``parsed.queries`` partial map — only queries present there are
gated) or a ``BENCH_FULL.json``-style full map. Each run's full map is
written to ``<out>_c<cpus>.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_ref(path: Path) -> dict[str, float]:
    rec = json.loads(path.read_text())
    if "parsed" in rec:  # driver BENCH_rNN.json
        rec = rec["parsed"] or {}
    queries = rec.get("queries", {})
    return {k: v for k, v in queries.items() if isinstance(v, (int, float))}


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    print(f"[bench_gate] running bench.py at local[{cpus}] on {sf_dir} ...",
          flush=True)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        check=False,
    )
    if proc.returncode != 0:
        raise SystemExit(f"bench.py failed (rc={proc.returncode})")
    line = proc.stdout.strip().splitlines()[-1]
    json.loads(line)  # stdout contract: one parseable JSON line
    return json.loads((REPO / "BENCH_FULL.json").read_text())


def gate(
    ref: dict[str, float],
    now: dict[str, float],
    tolerance: float,
    abs_floor: float,
) -> list[str]:
    problems = []
    for name, prev in sorted(ref.items()):
        cur = now.get(name)
        if cur is None:
            problems.append(f"MISSING  {name}: in reference, not in run")
            continue
        if cur < 0:
            problems.append(f"ERROR    {name}: bench error (-1)")
            continue
        if prev <= 0:
            continue
        # small absolute floor: sub-300ms rows are scheduler noise
        if cur - prev > abs_floor and cur > prev * (1 + tolerance):
            problems.append(
                f"REGRESS  {name}: {prev:.3f} -> {cur:.3f} "
                f"({cur / prev:.2f}x)"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=str(REPO / "BENCH_r13.json"))
    ap.add_argument("--cpus", type=int, nargs="+", default=[32, 8])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tolerance", type=float, default=0.25)
    ap.add_argument("--abs-floor", type=float, default=0.3)
    ap.add_argument("--out", default=str(REPO / "BENCH_GATE"))
    args = ap.parse_args()

    ref = load_ref(Path(args.ref))
    print(f"[bench_gate] reference {args.ref}: {len(ref)} gated queries")
    rc = 0
    for cpus in args.cpus:
        full = run_bench(cpus, args.sf)
        out_path = Path(f"{args.out}_c{cpus}.json")
        out_path.write_text(json.dumps(full, separators=(",", ":")))
        now = full["queries"]
        total = full["value"]
        ref_total = sum(v for v in ref.values() if v > 0)
        print(
            f"[bench_gate] local[{cpus}]: total {total:.1f}s over "
            f"{len(now)} queries (reference subset sums "
            f"{ref_total:.1f}s) -> {out_path.name}"
        )
        problems = gate(ref, now, args.tolerance, args.abs_floor)
        for p in problems:
            print(f"[bench_gate]   {p}")
        if problems:
            rc = 1
        else:
            print(f"[bench_gate] local[{cpus}]: PASS "
                  f"(no regression > {args.tolerance:.0%})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
