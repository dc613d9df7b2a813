"""Per-query bench regression report: BENCH_r{N} vs BENCH_r{N-1}.

Reads the two most recent ``BENCH_r*.json`` files at the repo root
(driver-recorded, one JSON line with a ``queries`` map of per-query
seconds), writes ``BENCH_DELTA.md`` with per-query deltas, and flags
regressions worse than REGRESSION_FACTOR. Also usable against a
fresh local ``python bench.py`` output piped to a file.

Usage: python tools/bench_delta.py [old.json new.json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REGRESSION_FACTOR = 1.5
ROOT = Path(__file__).resolve().parent.parent


def _load(path: Path) -> dict:
    text = path.read_text()
    try:  # driver files may be pretty-printed multi-line JSON
        doc = json.loads(text)
        if "queries" in doc:
            return doc
        # driver wrapper: the bench line is embedded in a "tail" string
        tail = doc.get("tail", "")
        i = tail.find('{"metric"')
        if i >= 0:
            inner, _ = json.JSONDecoder().raw_decode(tail[i:])
            return inner
        return doc
    except json.JSONDecodeError:
        pass
    # bench.py output is ONE json line, possibly surrounded by log noise
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise ValueError(f"no JSON object in {path}")


def main() -> int:
    if len(sys.argv) == 3:
        old_p, new_p = Path(sys.argv[1]), Path(sys.argv[2])
    else:
        benches = sorted(
            ROOT.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        if len(benches) < 2:
            print(f"need two BENCH_r*.json files, found {len(benches)} — no delta")
            return 0
        old_p, new_p = benches[-2], benches[-1]
    old, new = _load(old_p), _load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows, flagged = [], []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((name, a, b, None, "added" if a is None else "removed"))
            continue
        ratio = b / a if a > 0 else float("inf")
        note = ""
        if ratio > REGRESSION_FACTOR and b - a > 0.1:  # ignore sub-100ms noise
            note = f"REGRESSION {ratio:.2f}x"
            flagged.append(name)
        elif ratio < 1 / REGRESSION_FACTOR and a - b > 0.1:
            note = f"improved {1 / ratio:.2f}x"
        rows.append((name, a, b, ratio, note))
    lines = [
        f"# Bench delta: {old_p.name} -> {new_p.name}",
        "",
        f"Totals: {old.get('value', '?')} s -> {new.get('value', '?')} s "
        f"(sf={new.get('sf', '?')}); flagged regressions (> "
        f"{REGRESSION_FACTOR}x and > 0.1 s): {len(flagged)}"
        + (f" — {', '.join(flagged)}" if flagged else ""),
        "",
        "| query | old s | new s | ratio | note |",
        "|---|---|---|---|---|",
    ]
    for name, a, b, ratio, note in rows:
        fa = f"{a:.3f}" if a is not None else "—"
        fb = f"{b:.3f}" if b is not None else "—"
        fr = f"{ratio:.2f}" if ratio is not None else "—"
        lines.append(f"| {name} | {fa} | {fb} | {fr} | {note} |")
    out = ROOT / "BENCH_DELTA.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(flagged)} regression(s) flagged)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
