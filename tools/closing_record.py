"""Reproduce the SURVEY §8b closing record at HEAD.

VERDICT r5 #6: "make the closing record the literal output of one
command ... every numeric claim in SURVEY §8 reproduces by running
the named tool at HEAD." This tool IS that check: it re-runs the
closing-record commands, extracts the same counts §8b quotes, and
compares.

Usage:
    python tools/closing_record.py            # run everything, print lines
    python tools/closing_record.py --check    # also diff against SURVEY §8b
    python tools/closing_record.py --fast     # skip pytest (the slow one)

Checked for equality: pytest pass/skip counts, both oracle-battery
tails (ok / rows-only / failed), and the plan-audit invariants
(row count, row-Python total, SortMergeJoin site count). Bench totals
are REPORTED next to the recorded number but never failed on — wall
time varies ±15% between sessions on this sandbox (documented in
BENCH_DELTA.md); correctness counts do not.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _tail(cmd: list[str]) -> str:
    out = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, check=False
    )
    # stdout only: Spark floods stderr with \r progress lines, and the
    # tools' verdict line goes to stdout (fall back to stderr when a
    # tool dies before printing one)
    for stream in (out.stdout, out.stderr):
        lines = [l for l in stream.splitlines() if l.strip()]
        if lines:
            return lines[-1].strip()
    return ""


def _survey_8b() -> str:
    text = (ROOT / "SURVEY.md").read_text()
    i = text.index("## 8b.")
    return text[i:]


def _pytest_counts(line: str) -> tuple[int, int] | None:
    m = re.search(r"(\d+) passed, (\d+) skipped", line)
    return (int(m.group(1)), int(m.group(2))) if m else None


def _oracle_counts(line: str) -> tuple[int, int, int] | None:
    m = re.search(r"(\d+) ok, (\d+) rows-only, (\d+) failed", line)
    return tuple(map(int, m.groups())) if m else None


def main() -> int:
    check = "--check" in sys.argv
    fast = "--fast" in sys.argv
    recorded = _survey_8b() if check else ""
    failures: list[str] = []

    print("== oracle sf0.01 ==", flush=True)
    o001 = _tail([sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"])
    print(o001)

    print("== oracle sf0.1 ==", flush=True)
    o01 = _tail([sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.1"])
    print(o01)

    print("== plan audit ==", flush=True)
    subprocess.run(
        [sys.executable, "tools/audit_plans.py"], cwd=ROOT,
        capture_output=True, text=True, check=False,
    )
    plans = (ROOT / "PLANS.md").read_text()
    rows = re.findall(
        r"^([a-z][a-z0-9_]+) +(\d+) +(\d+) +(\d+) +(\d+) ", plans, re.M
    )
    n_rows = len(rows)
    pyrow = sum(int(r[4]) for r in rows)
    smj_sites = sum(1 for r in rows if int(r[3]) > 0)
    print(f"{n_rows} rows, pyrow total {pyrow}, SMJ sites {smj_sites}")

    pyt = ""
    if not fast:
        print("== pytest ==", flush=True)
        pyt = _tail([sys.executable, "-m", "pytest", "tests/", "-q"])
        print(pyt)

    print("== bench sf0.1 (reported only, never failed on) ==", flush=True)
    # bench.py rewrites BENCH_FULL.json; a reproducibility CHECK must
    # not clobber the committed artifact — save and restore it.
    full = ROOT / "BENCH_FULL.json"
    saved = full.read_bytes() if full.exists() else None
    try:
        bench = _tail([sys.executable, "bench.py"])
    finally:
        if saved is not None:
            full.write_bytes(saved)
    m = re.search(r'"value":([0-9.]+)', bench)
    print(f"total {m.group(1)} s" if m else bench[:200])

    if check:
        for label, got in (
            ("oracle sf0.01", _oracle_counts(o001)),
            ("oracle sf0.1", _oracle_counts(o01)),
        ):
            want = _oracle_counts(recorded)
            # §8b quotes the same tail for both batteries; compare each
            if got is None:
                failures.append(f"{label}: no tail parsed")
            elif want != got:
                failures.append(f"{label}: recorded {want}, fresh {got}")
        if not fast:
            wantp = _pytest_counts(recorded)
            gotp = _pytest_counts(pyt)
            if gotp is None:
                failures.append("pytest: no tail parsed")
            elif wantp != gotp:
                failures.append(f"pytest: recorded {wantp}, fresh {gotp}")
        m = re.search(r"(\d+) rows, row-Python count (\d+)", recorded)
        if m and (int(m.group(1)), int(m.group(2))) != (n_rows, pyrow):
            failures.append(
                f"plan audit: recorded {m.groups()}, fresh ({n_rows}, {pyrow})"
            )
        if failures:
            print("\nCLOSING RECORD DRIFT:")
            for f in failures:
                print(" -", f)
            return 1
        print("\nclosing record reproduces at HEAD")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
