"""Generate the sf1 scaling dataset: ten id-shifted copies of sf0.1.

The committed generator for the 10x scale-up measurements in
BENCH_DELTA.md (r4 built its 10x data ad hoc; VERDICT r4 #7 asked for
a reproducible full-battery run). Fact tables get 10 copies with
PRIMARY keys shifted so uniqueness holds and entity populations grow
10x (more keys, not hotter keys); foreign keys into the dims stay
unshifted so every join still lands ("shared dims"); lineitem and
orders shift o_orderkey by the SAME offset so their join key stays
consistent. Document/embedding CONTENT repeats verbatim — at 10x that
means real duplicate explosion for the dedup family (the ~45x
true-pair blow-up the r4 table reports), which is the stress we want.

Writes /tmp/sf1/*.parquet. Usage: python tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

SRC = Path("/root/testdata/sf0.1")
COPIES = 10

# offsets comfortably above each table's max key
OFF = {
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "user_id": 100_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/sf1")
    out.mkdir(parents=True, exist_ok=True)

    import duckdb

    con = duckdb.connect()

    def gen(table: str, shifted: dict[str, int]) -> None:
        src = SRC / f"{table}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + c.c * {shifted[c]} AS {c}" if c in shifted else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}'),"
            f" UNNEST(range(0, {COPIES})) AS c(c))"
            f" TO '{out / (table + '.parquet')}' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out / (table + '.parquet')}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    gen("lineitem", {"l_orderkey": OFF["o_orderkey"]})
    gen("orders", {"o_orderkey": OFF["o_orderkey"]})
    gen("events", {"event_id": OFF["event_id"], "user_id": OFF["user_id"]})
    gen("documents", {"doc_id": OFF["doc_id"]})
    gen("embeddings", {"vec_id": OFF["vec_id"]})
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(SRC / f"{dim}.parquet", out / f"{dim}.parquet")
        print(f"{dim}: copied (shared dim)")


if __name__ == "__main__":
    main()
