"""SQLite file source (sources/sqlitefile.py): varint/record codec,
b-tree walk with interior pages and overflow chains, from-scratch
writer validated by the stdlib sqlite3 (integrity_check), stdlib
interop both directions."""

from __future__ import annotations

import os
import random
import sqlite3
import struct
import tempfile

import pytest

from neuroimaging_data_pipeline_spark.sources.sqlitefile import (
    _decode_record,
    _encode_record,
    _read_varint,
    _write_varint,
    read_sqlite_table,
    write_sqlite,
)


def test_varint_roundtrip_including_9_byte_form():
    cases = [0, 1, 127, 128, 16383, 16384, (1 << 56) - 1, 1 << 56, (1 << 64) - 1]
    for v in cases:
        enc = _write_varint(v)
        got, pos = _read_varint(enc, 0)
        assert (got, pos) == (v, len(enc)), v
    assert len(_write_varint(1 << 56)) == 9  # the all-8-bits 9th byte


def test_record_codec_all_serial_types():
    vals = [None, 0, 1, -1, 127, -128, 32767, 1 << 40, -(1 << 40),
            3.5, "héllo", b"\x00\xff", ""]
    assert _decode_record(_encode_record(vals)) == vals
    # stdlib-only serials 8/9 (schema format 4 constants) decode too
    payload = bytes([3, 8, 9]) + b""
    assert _decode_record(payload) == [0, 1]


def test_roundtrip_multi_leaf_with_interior_level():
    rng = random.Random(7)
    rows = [(i, [f"t{i}-" + "x" * rng.randint(0, 300)]) for i in range(1, 1500)]
    blob = write_sqlite("docs", ["doc_id", "text"], rows)
    got = read_sqlite_table(blob, "docs")
    assert [(r, v[1]) for r, v in got] == [(r, v[0]) for r, v in rows]
    # rowid-alias column is stored as NULL in the record, per format
    assert all(v[0] is None for _, v in got)
    # multi-page: page 1 + >1 leaves + interior root
    assert len(blob) // 4096 > 3


def test_stdlib_opens_our_bytes_and_integrity_checks():
    rows = [(i, [f"row {i}"]) for i in range(1, 700)]
    blob = write_sqlite("docs", ["doc_id", "text"], rows)
    with tempfile.NamedTemporaryFile(suffix=".db", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        con = sqlite3.connect(path)
        assert con.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
        assert con.execute(
            "SELECT count(*), min(doc_id), max(doc_id) FROM docs"
        ).fetchone() == (699, 1, 699)
        assert con.execute(
            "SELECT text FROM docs WHERE doc_id = 123"
        ).fetchone() == ("row 123",)
        con.close()
    finally:
        os.unlink(path)


def test_we_read_stdlib_bytes_with_overflow_and_interior_pages():
    with tempfile.NamedTemporaryFile(suffix=".db", delete=False) as f:
        path = f.name
    try:
        con = sqlite3.connect(path)
        con.execute("PRAGMA page_size=1024")
        con.execute(
            "CREATE TABLE t(id INTEGER PRIMARY KEY, a TEXT, b REAL,"
            " c BLOB, d INTEGER)"
        )
        big = "Z" * 9000  # >> 1 KiB page: forces an overflow chain
        data = [
            (i, big if i % 97 == 0 else f"row{i}", i / 7.0,
             bytes([i % 256]) * (i % 50), -i * i)
            for i in range(1, 3000)
        ]
        con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", data)
        con.commit()
        con.close()
        buf = open(path, "rb").read()
    finally:
        os.unlink(path)
    got = read_sqlite_table(buf, "t")
    assert len(got) == len(data)
    for (rowid, rec), exp in zip(got, data):
        assert rowid == exp[0]
        assert rec[0] is None
        assert (rec[1], rec[2], rec[3], rec[4]) == exp[1:]


def test_unknown_table_and_corrupt_magic_raise():
    blob = write_sqlite("docs", ["doc_id", "text"], [(1, ["x"])])
    with pytest.raises(KeyError, match="nope"):
        read_sqlite_table(blob, "nope")
    with pytest.raises(ValueError, match="not an SQLite"):
        read_sqlite_table(b"junk" + blob[4:], "docs")


def test_truncated_overflow_chain_raises():
    # stdlib-written db with one overflowing row, then cut the file
    # after the first overflow page: the declared payload length must
    # fail loudly, not return short data
    with tempfile.NamedTemporaryFile(suffix=".db", delete=False) as f:
        path = f.name
    try:
        con = sqlite3.connect(path)
        con.execute("PRAGMA page_size=512")
        con.execute("CREATE TABLE t(id INTEGER PRIMARY KEY, a TEXT)")
        con.execute("INSERT INTO t VALUES (1, ?)", ("Q" * 5000,))
        con.commit()
        con.close()
        buf = open(path, "rb").read()
    finally:
        os.unlink(path)
    assert read_sqlite_table(buf, "t")[0][1][1] == "Q" * 5000
    with pytest.raises(ValueError, match="out of range|short of declared"):
        read_sqlite_table(buf[: len(buf) // 2], "t")


def test_page1_header_fields_are_load_bearing():
    blob = bytearray(write_sqlite("docs", ["doc_id", "text"], [(1, ["x"])]))
    # flip the declared text encoding to UTF-16le: reader must refuse
    struct.pack_into(">I", blob, 56, 2)
    with pytest.raises(NotImplementedError, match="encoding"):
        read_sqlite_table(bytes(blob), "docs")


def test_writer_leaf_capacity_boundary_sweep():
    """Deterministic sweep across the single-cell-per-leaf and
    payload-fits-exactly edges: text lengths walk the region around
    the one-leaf capacity and the per-cell local-payload maximum
    (X = usable - 35), so off-by-ones in cell packing, pointer-array
    accounting, or the overflow refusal all surface. Every size both
    round-trips through our reader AND passes stdlib integrity."""
    usable = 4096
    x_max = usable - 35
    # record overhead: header varint + [NULL, text serial] + body
    for n in [0, 1, 100, 3900, 3980, x_max - 30, x_max - 25]:
        rows = [(1, ["a" * n]), (2, ["b" * min(n, 50)])]
        blob = write_sqlite("docs", ["doc_id", "text"], rows)
        got = read_sqlite_table(blob, "docs")
        assert [(r, v[1]) for r, v in got] == [(1, "a" * n), (2, "b" * min(n, 50))]
        with tempfile.NamedTemporaryFile(suffix=".db", delete=False) as f:
            f.write(blob)
            path = f.name
        try:
            con = sqlite3.connect(path)
            assert con.execute("PRAGMA integrity_check").fetchone()[0] == "ok", n
            con.close()
        finally:
            os.unlink(path)
    # past the local-payload maximum the writer must refuse loudly
    # (overflow chains are reader-side only)
    with pytest.raises(ValueError, match="overflow"):
        write_sqlite("docs", ["doc_id", "text"], [(1, ["z" * x_max])])


def test_fuzz_reader_against_stdlib_written_layouts():
    """Property-fuzz the UNTESTED direction (VERDICT r6 #8): arbitrary
    stdlib-sqlite3 page layouts — deletions leave freeblocks inside
    leaf pages, updates churn cell sizes, post-delete inserts reuse
    freelist pages, and page sizes from 512 to 8192 move every split
    boundary. The from-scratch reader must agree with a stdlib SELECT
    row-for-row on every scenario."""
    import random

    rng = random.Random(20260815)
    int_pool = [0, 1, -1, 127, -128, 32767, -32768, 2**31, -(2**31),
                2**47, 2**63 - 1, -(2**63)]
    for scenario in range(12):
        page = rng.choice([512, 1024, 2048, 4096, 8192])
        n = rng.randrange(0, 320)
        with tempfile.NamedTemporaryFile(suffix=".db", delete=False) as f:
            path = f.name
        try:
            con = sqlite3.connect(path)
            con.execute(f"PRAGMA page_size={page}")
            con.execute(
                "CREATE TABLE fz(id INTEGER PRIMARY KEY, t TEXT,"
                " i INTEGER, r REAL, b BLOB)"
            )
            rows = []
            rowid = 0
            for k in range(n):
                rowid += rng.randrange(1, 4)  # non-contiguous, increasing
                t = (
                    None if rng.random() < 0.1
                    else "日本語🎈" * rng.randrange(0, 9)
                    + "x" * rng.randrange(0, 2 * page)  # overflow chains
                )
                i = rng.choice(int_pool) if rng.random() < 0.8 else None
                r = (
                    None if rng.random() < 0.2
                    else rng.choice([0.0, -0.0, 1.5, -273.15, 1e300,
                                     float("inf"), 2**53 + 1.0])
                )
                b = (
                    None if rng.random() < 0.2
                    else rng.randbytes(rng.randrange(0, 3 * page))
                )
                rows.append((rowid, t, i, r, b))
            con.executemany("INSERT INTO fz VALUES (?,?,?,?,?)", rows)
            # deletions -> freeblocks + freelist pages
            doomed = [r[0] for r in rows if rng.random() < 0.3]
            con.executemany(
                "DELETE FROM fz WHERE id = ?", [(d,) for d in doomed]
            )
            # updates -> cell-size churn inside leaves
            for r in rows:
                if r[0] not in doomed and rng.random() < 0.2:
                    con.execute(
                        "UPDATE fz SET t = ? WHERE id = ?",
                        ("upd" * rng.randrange(0, page), r[0]),
                    )
            # post-delete inserts -> freelist page reuse
            base = max((r[0] for r in rows), default=0)
            extra = [
                (base + 1 + j, "re" * j, j, j / 3.0, b"\x00" * j)
                for j in range(rng.randrange(0, 40))
            ]
            con.executemany("INSERT INTO fz VALUES (?,?,?,?,?)", extra)
            con.commit()
            want = list(
                con.execute("SELECT id, t, i, r, b FROM fz ORDER BY id")
            )
            con.close()
            buf = open(path, "rb").read()
        finally:
            os.unlink(path)
        got = read_sqlite_table(buf, "fz")
        assert len(got) == len(want), (scenario, page, len(got), len(want))
        for (rowid, rec), exp in zip(got, want):
            assert rowid == exp[0], (scenario, page)
            # the INTEGER PRIMARY KEY alias rides the rowid (NULL cell)
            assert rec[0] is None
            assert tuple(rec[1:]) == tuple(exp[1:]), (scenario, page, rowid)
