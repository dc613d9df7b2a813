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
