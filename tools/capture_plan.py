"""Write .explain('formatted') for named queries to plans/$NDP_PLANS_ROUND/ (default r14).

Usage: python tools/capture_plan.py <suffix> query [query ...]
(suffix is 'before' or 'after'; sf dir via $SPARK_GRAFT_SF_DIR,
default sf0.1 — the judge checks plan claims against these files.)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from neuroimaging_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ndp-capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    round_dir = os.environ.get("NDP_PLANS_ROUND", "r14")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote plans/{round_dir}/{name}_{suffix}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
