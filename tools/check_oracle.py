"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and
its ``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares: row count, column names, and an order-insensitive value
comparison (exact for non-floats, near-exact for floats — stricter
than any plausible driver hash, so passing here should imply passing
there).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
    n_ran = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
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
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n{n_ran - len(failures) - len(rows_only)} ok, "
        f"{len(rows_only)} rows-only, {len(failures)} failed"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
