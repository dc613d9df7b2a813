"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and
its ``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares: row count, column names, and an order-insensitive value
comparison (exact for non-floats, near-exact for floats — stricter
than any plausible driver hash, so passing here should imply passing
there).

Usage: python tools/check_oracle.py [--json PATH] [sf_dir] [query ...]

``--json PATH`` additionally writes one machine-readable record per
query — {name: {status, secs, rows}} plus a summary — so a full-
battery replica at any SF is ONE committed artifact (e.g.
ORACLE_SF01_r5.json) instead of scattered per-commit notes.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas DF -> canonical sorted list of row tuples."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None:
            return ("null",)
        if isinstance(v, float):
            if math.isnan(v):
                # NaN is NOT null: a driver value-hash distinguishes them.
                return ("nan",)
            # compare floats on 9 significant digits; zeros keep their
            # sign bit (the driver's hash sees -0.0 != 0.0 — round-1
            # regression on a9_mass_ols).
            val = float(f"{v:.9g}")
            if val == 0.0:
                return ("f", 0.0, int(math.copysign(1.0, v)))
            return ("f", val)
        if isinstance(v, (int,)):
            return ("i", int(v))
        if hasattr(v, "isoformat"):
            return ("s", v.isoformat())
        if isinstance(v, bytes):
            return ("b", v.hex())
        return ("s", str(v))

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return rows


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if args and args[0] == "--json":
        json_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    import __spark_entry__ as entrymod
    from neuroimaging_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, rows_only = [], []
    records: dict[str, dict] = {}
    n_ran = 0

    def _flush() -> None:
        # incremental write after EVERY query (r13): a multi-hour
        # battery killed mid-run keeps its completed records instead
        # of losing everything to the end-of-run write.
        if not json_path:
            return
        import json

        doc = {
            "sf_dir": sf_dir,
            "n_queries": n_ran,
            "n_ok": n_ran - len(failures) - len(rows_only),
            "n_rows_only": len(rows_only),
            "n_failed": len(failures),
            "results": records,
        }
        tmp = json_path + ".tmp"
        Path(tmp).write_text(json.dumps(doc, indent=1))
        Path(tmp).replace(json_path)

    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            records[name] = {
                "status": "fail", "secs": round(time.time() - t0, 2),
                "err": f"spark error: {e}"[:300],
            }
            print(f"FAIL {name}: spark error: {e}")
            _flush()
            continue
        if name not in oracles:
            rows_only.append(name)
            records[name] = {
                "status": "rows_only", "secs": round(time.time() - t0, 2),
                "rows": len(sdf),
            }
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            _flush()
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            records[name] = {
                "status": "fail", "secs": round(time.time() - t0, 2),
                "err": f"duckdb error: {e}"[:300],
            }
            print(f"FAIL {name}: duckdb error: {e}")
            _flush()
            continue
        problems = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
        if not problems:
            a, b = normalize(sdf), normalize(ddf)
            if a != b:
                diff_i = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                detail = ""
                if diff_i is not None:
                    detail = f" first diff row {diff_i}: spark={a[diff_i]} duck={b[diff_i]}"
                problems.append("value mismatch" + detail)
        if problems:
            failures.append((name, "; ".join(problems)))
            records[name] = {
                "status": "fail", "secs": round(time.time() - t0, 2),
                "rows": len(sdf), "err": "; ".join(problems)[:300],
            }
            print(f"FAIL {name}: {'; '.join(problems)}")
            _flush()
        else:
            records[name] = {
                "status": "ok", "secs": round(time.time() - t0, 2),
                "rows": len(sdf),
            }
            print(f"OK   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            _flush()

    print(
        f"\n{n_ran - len(failures) - len(rows_only)} ok, "
        f"{len(rows_only)} rows-only, {len(failures)} failed"
    )
    if json_path:
        import json

        Path(json_path).write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_queries": n_ran,
                    "n_ok": n_ran - len(failures) - len(rows_only),
                    "n_rows_only": len(rows_only),
                    "n_failed": len(failures),
                    "results": records,
                },
                indent=1,
            )
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
