"""bench.py stdout contract: the single JSON line must fit the
driver's 2000-char stdout capture window at the REAL registry size
(the r4 regression: a ~4 KB line -> BENCH_r04.json parsed=null)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import DRIVER_CAPTURE_WINDOW, LINE_BUDGET, summarize  # noqa: E402


def test_line_fits_capture_window_at_real_registry_size():
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    assert len(names) >= 150  # the regime that broke r4
    timings = {n: round(0.1 + i * 0.037, 3) for i, n in enumerate(names)}
    full, line = summarize(timings, "0.1")
    s = json.dumps(line, separators=(",", ":"))
    assert len(s) <= LINE_BUDGET < DRIVER_CAPTURE_WINDOW
    parsed = json.loads(s)
    assert parsed["metric"] == "total_query_runtime"
    assert parsed["n_queries"] == len(names)
    assert parsed["sf"] == 0.1
    assert 0 < len(parsed["queries"]) <= len(names)
    # the slowest query always survives the truncation
    slowest = max(timings, key=timings.get)
    assert slowest in parsed["queries"]
    # the full record keeps everything
    assert full["queries"] == timings
    assert abs(full["value"] - round(sum(timings.values()), 3)) < 1e-9


def test_line_handles_tiny_and_error_timings():
    full, line = summarize({"q1": 0.5, "q2": -1.0}, "0.01")
    assert line["value"] == 0.5  # errored queries excluded from total
    assert json.loads(json.dumps(line))
