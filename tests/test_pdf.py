"""PDF text extraction (multimodal/pdf.py): writer/parser roundtrip
through the xref walk, the Tj escape set and TJ kerning arrays, the
structural cross-checks, and the declared gates (encryption, xref
streams, non-Flate filters)."""

from __future__ import annotations

import re
import zlib

import pytest

from neuroimaging_data_pipeline_spark.multimodal.pdf import (
    extract_text,
    parse_pdf,
    write_pdf,
)


def test_roundtrip_with_full_escape_set():
    text = "plain (parens) back\\slash \nnewline \ttab \rcr end"
    info = parse_pdf(write_pdf([[text]]))
    assert info["text"] == text
    assert info["n_pages"] == 1
    assert info["n_objects"] == 5  # catalog, pages, font, page, stream


def test_multipage_multipiece_reassembly():
    pieces_by_page = [["abc ", "def"], ["gh"], ["", "ijk", "l"]]
    info = parse_pdf(write_pdf(pieces_by_page))
    assert info["text"] == "abc defghijkl"
    assert info["n_pages"] == 3
    assert info["n_objects"] == 3 + 2 * 3


def test_tj_array_and_tj_literal_both_extracted():
    pdf = write_pdf([["first", "second", "third"]])
    # pieces alternate Tj / TJ / Tj by construction
    assert parse_pdf(pdf)["text"] == "firstsecondthird"
    content = zlib.decompress(
        re.search(rb"stream\r?\n(.*?)\nendstream", pdf, re.S).group(1)
    )
    assert b") Tj" in content and b"] TJ" in content


def test_octal_escape_and_line_continuation():
    content = b"BT (\\101\\102\\103) Tj (a\\\nb) Tj ET"
    assert extract_text(content) == "ABCab"


def test_corrupt_xref_offset_fails_loudly():
    pdf = bytearray(write_pdf([["hello"]]))
    m = re.search(rb"\n(\d{10}) 00000 n", pdf)
    bad = f"{int(m.group(1)) + 3:010d}".encode()
    pdf[m.start(1) : m.end(1)] = bad
    with pytest.raises(ValueError, match="no object header"):
        parse_pdf(bytes(pdf))


def test_declared_gates_raise():
    pdf = write_pdf([["x"]])
    # trailer edit sits after the xref, so object offsets stay valid
    enc = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf(enc)
    # same-length filter swap keeps every byte offset intact
    lzw = pdf.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode  ")
    assert len(lzw) == len(pdf)
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        parse_pdf(lzw)
    with pytest.raises(ValueError, match="%PDF"):
        parse_pdf(b"not a pdf")


def test_page_count_crosscheck():
    pdf = write_pdf([["a"], ["b"]])
    broken = pdf.replace(b"/Count 2", b"/Count 3")
    with pytest.raises(ValueError, match="declares 3 pages"):
        parse_pdf(broken)


# --- r11: PDF 1.5 (cross-reference streams + object streams) ---------------


def test_pdf15_roundtrip_and_structure():
    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        parse_pdf,
        write_pdf15,
    )

    for pages in ([["hello ", "world"]], [["a", "b", "c"], ["dd"]],
                  [["x"], ["y("], ["z\\z", "w)"]]):
        buf = write_pdf15(pages)
        assert buf.startswith(b"%PDF-1.5")
        info = parse_pdf(buf)
        assert info["text"] == "".join(p for pg in pages for p in pg)
        assert info["n_pages"] == len(pages)
        assert info["n_objects"] == 2 * len(pages) + 5


def test_pdf15_predictor_paths():
    """The xref stream rows decode through the PNG Up predictor; the
    un-predictor also handles Sub/Average/Paeth and rejects bad row
    tags."""
    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        _unpredict_png,
    )

    rows = bytes(range(21))  # 3 rows x 7 cols
    # identity (tag 0)
    raw = b"".join(b"\x00" + rows[i : i + 7] for i in (0, 7, 14))
    assert _unpredict_png(raw, 7) == rows
    # Up (tag 2): encode then decode
    enc = bytearray()
    prev = bytes(7)
    for i in (0, 7, 14):
        cur = rows[i : i + 7]
        enc.append(2)
        enc += bytes((c - p) & 0xFF for c, p in zip(cur, prev))
        prev = cur
    assert _unpredict_png(bytes(enc), 7) == rows
    # Sub (tag 1): delta against the left byte
    enc = bytearray()
    for i in (0, 7, 14):
        cur = rows[i : i + 7]
        enc.append(1)
        left = 0
        for c in cur:
            enc.append((c - left) & 0xFF)
            left = c
    assert _unpredict_png(bytes(enc), 7) == rows
    import pytest as _pt

    with _pt.raises(ValueError, match="row tag"):
        _unpredict_png(b"\x09" + bytes(7), 7)


def test_pdf15_corruption_fails_loudly():
    """Truncations and bit flips in the 1.5 structures must raise
    controlled errors (ValueError / NotImplementedError)."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        parse_pdf,
        write_pdf15,
    )

    buf = write_pdf15([["some text"], ["more"]])
    for cut in (10, len(buf) // 2, len(buf) - 4):
        try:
            parse_pdf(buf[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = np.random.default_rng(4)
    for _ in range(60):
        data = bytearray(buf)
        i = int(rng.integers(0, len(data)))
        data[i] ^= 1 << int(rng.integers(0, 8))
        try:
            parse_pdf(bytes(data))
        except (ValueError, NotImplementedError):
            pass


# --- r12: incremental updates, /Prev hygiene, DecodeParms key order ---------


def _xref_stream_obj(
    obj_id: int,
    size: int,
    rows: list[tuple[int, int, int, int]],
    prev: int | None,
    at: int,
) -> bytes:
    """Minimal /Type /XRef object (W [1 4 2], Flate, no predictor)
    whose /Index lists each row's object number as a 1-long
    subsection. ``rows`` = [(num, type, f2, f3)]."""
    payload = bytearray()
    index = []
    for num, t, f2, f3 in rows:
        index += [num, 1]
        payload += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    flate = zlib.compress(bytes(payload))
    prev_s = f"/Prev {prev} " if prev is not None else ""
    head = (
        f"{obj_id} 0 obj\n<< /Type /XRef /Size {size} /Root 1 0 R "
        f"/W [1 4 2] /Index [{' '.join(map(str, index))}] "
        f"{prev_s}/Filter /FlateDecode /Length {len(flate)} "
        f">>\nstream\n"
    ).encode()
    return (head + flate + b"\nendstream\nendobj\n"
            + f"startxref\n{at}\n%%EOF\n".encode())


def test_pdf15_prev_cycle_guard():
    """A crafted /Prev that points back at itself (or loops) must
    raise ValueError, not escape with RecursionError."""
    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        _parse_xref_stream,
    )

    buf = _xref_stream_obj(9, 10, [(9, 1, 0, 0)], prev=0, at=0)
    with pytest.raises(ValueError, match="/Prev cycle"):
        _parse_xref_stream(buf, 0)


def test_pdf15_decodeparms_key_order():
    """/DecodeParms keys appear in arbitrary order (7.3.7): the
    /Columns-before-/Predictor spelling must decode identically."""
    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        parse_pdf,
        write_pdf15,
    )

    buf = write_pdf15([["hello ", "world"], ["again"]])
    want = parse_pdf(buf)
    old = b"/DecodeParms << /Predictor 12 /Columns 7 >>"
    new = b"/DecodeParms << /Columns 7 /Predictor 12 >>"
    assert buf.count(old) == 1 and len(old) == len(new)
    swapped = buf.replace(old, new)
    assert parse_pdf(swapped) == want


def test_pdf15_columns_defaults_to_one():
    """ISO 32000-1 Table 8 gives /Columns a default of 1: a
    conforming xref stream using a PNG predictor over true 1-byte
    columns may omit /Columns entirely and must still decode
    (ADVICE r12 — the old behavior rejected it). /W [0 1 0] makes
    the row width genuinely 1 (type defaults to 1 per 7.5.8.3)."""
    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        _parse_xref_stream,
    )

    offsets = [5, 9, 17]
    payload = bytearray()
    prev = 0
    for off in offsets:  # predictor 12 = PNG Up over 1-byte rows
        payload += bytes([2, (off - prev) & 0xFF])
        prev = off
    flate = zlib.compress(bytes(payload))
    buf = (
        f"7 0 obj\n<< /Type /XRef /Size 10 /Root 1 0 R /W [0 1 0] "
        f"/Index [3 3] /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 >> /Length {len(flate)} "
        f">>\nstream\n"
    ).encode() + flate + b"\nendstream\nendobj\n"
    entries = _parse_xref_stream(buf, 0)
    assert entries == {3: ("top", 5), 4: ("top", 9), 5: ("top", 17)}


def test_pdf15_incremental_update_and_free_shadowing():
    """End-to-end incremental updates through the /Prev chain: a
    newer type-1 row replaces an object, a newer type-0 (free) row
    DELETES the entry inherited from the /Prev chain, and the LAST
    startxref in the file wins."""
    from neuroimaging_data_pipeline_spark.multimodal.pdf import (
        parse_pdf,
        write_pdf15,
    )

    base = write_pdf15([["alpha "], ["beta"]])
    info0 = parse_pdf(base)
    assert info0["text"] == "alpha beta"
    assert info0["n_objects"] == 9  # 1..9 (object 0 = free head)
    xref0_at = int(re.search(rb"startxref\s+(\d+)", base).group(1))

    # update 1: replace page-1's content stream (object 5).
    flate = zlib.compress(b"BT /F1 12 Tf 72 720 Td (ALPHA!) Tj ET")
    upd = bytearray(base)
    new5_at = len(upd)
    upd += (
        f"5 0 obj\n<< /Length {len(flate)} /Filter /FlateDecode "
        f">>\nstream\n".encode() + flate + b"\nendstream\nendobj\n"
    )
    xref1_at = len(upd)
    upd += _xref_stream_obj(
        10, 11, [(5, 1, new5_at, 0), (10, 1, xref1_at, 0)],
        prev=xref0_at, at=xref1_at,
    )
    info1 = parse_pdf(bytes(upd))
    assert info1["text"] == "ALPHA!beta"
    assert info1["n_objects"] == 10 and info1["n_pages"] == 2

    # update 2: free object 5 — the newer free row must shadow BOTH
    # older in-use entries (base and update-1), not resurface them.
    xref2_at = len(upd)
    upd += _xref_stream_obj(
        11, 12, [(5, 0, 0, 0xFFFF), (11, 1, xref2_at, 0)],
        prev=xref1_at, at=xref2_at,
    )
    info2 = parse_pdf(bytes(upd))
    assert info2["text"] == "beta"
    assert info2["n_objects"] == 10 and info2["n_pages"] == 2

    # hostile-bytes sweep over the chained document: every bitflip
    # must stay inside the ValueError/NotImplementedError contract.
    import numpy as np

    rng = np.random.default_rng(12)
    final = bytes(upd)
    for _ in range(200):
        data = bytearray(final)
        i = int(rng.integers(0, len(data)))
        data[i] ^= 1 << int(rng.integers(0, 8))
        try:
            parse_pdf(bytes(data))
        except (ValueError, NotImplementedError):
            pass
