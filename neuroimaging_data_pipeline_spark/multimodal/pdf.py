"""PDF text extraction, stdlib-only (zlib) — the document format a
real training corpus mines papers and reports from, completing the
document-ingest story next to HTML (text/html.py) and WARC
(sources/warc.py).

What is REAL here (ISO 32000-1 subset, both directions):

- writer: a well-formed PDF 1.4 — catalog / page-tree / per-page
  FlateDecode content streams / Type1 font objects, a byte-accurate
  xref table (20-byte entries, free-entry head), trailer with /Root
  and /Size, startxref;
- parser: startxref discovery from the file tail, xref table walk to
  every object's byte offset, object header + dictionary scan,
  stream payload extraction via the /Length entry, zlib inflate of
  FlateDecode streams, and a content-stream tokenizer for the text
  shows: BT/ET blocks, Tj literal strings WITH the full escape set
  (\\( \\) \\\\ \\n \\r \\t \\b \\f, octal \\ddd, line
  continuations) and TJ arrays (kerning numbers skipped, string
  pieces concatenated in order);
- page accounting from the parsed page tree (/Type /Page objects),
  cross-checked against /Count in the Pages node.

Text round-trips exactly (writer escapes, parser unescapes), so the
m22 oracle checks md5 of the extracted text straight against the
documents table — any framing, xref, inflate or escape bug breaks
the hash match.

Honest gates (raise, never silent): encrypted PDFs, cross-reference
STREAMS (PDF 1.5 compressed xref), and non-Flate filters raise
NotImplementedError; glyph-level layout (font widths, CMaps,
ToUnicode for composite fonts) is out of scope — the extractor reads
the text operators, the same scope as a WET-style text dump.

Scale: opaque binary + Arrow ``mapInPandas``, narrow, zero shuffle —
the same adapter split as every codec here (reference draws it at
NIfTI, ssm_loop.py:40).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# --- writer -------------------------------------------------------------------


def _escape_pdf_string(s: str) -> str:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out)


def write_pdf(pages: list[list[str]]) -> bytes:
    """A complete single-font PDF: one content stream per page, each
    page's text pieces emitted alternately as Tj shows and TJ
    kerning arrays (so both extractor paths run on every page)."""
    objs: list[bytes] = []  # 1-indexed object bodies (without n 0 obj)
    n_pages = len(pages)
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{i} 0 R" for i in page_obj_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # obj 3
    for pieces in pages:
        shows = []
        for k, piece in enumerate(pieces):
            esc = _escape_pdf_string(piece)
            if k % 2 == 0:
                shows.append(f"({esc}) Tj")
            else:
                shows.append(f"[ ({esc}) -250 ] TJ")
        content = (
            "BT /F1 12 Tf 72 720 Td " + " ".join(shows) + " ET"
        ).encode()
        flate = zlib.compress(content)
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {len(objs) + 2} 0 R >>".encode()
        )
        objs.append(
            f"<< /Length {len(flate)} /Filter /FlateDecode >>\n"
            f"stream\n".encode() + flate + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


# --- parser -------------------------------------------------------------------

_OBJ_HEAD = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _parse_xref(buf: bytes) -> dict[int, int]:
    tail = buf[-256:]
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF", tail)
    if not m:
        raise ValueError("PDF without startxref/%%EOF tail")
    pos = int(m.group(1))
    if buf[pos : pos + 4] != b"xref":
        if buf[pos : pos + 1].isdigit() or _OBJ_HEAD.match(buf, pos):
            raise NotImplementedError(
                "cross-reference streams (PDF 1.5) unsupported"
            )
        raise ValueError("startxref does not point at an xref table")
    offsets: dict[int, int] = {}
    p = pos + 4
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", buf[p : p + 64])
        if not m:
            break
        first, count = int(m.group(1)), int(m.group(2))
        p += m.end()
        for k in range(count):
            entry = buf[p : p + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            off, kind = entry[0:10], entry[17:18]
            if kind == b"n":
                offsets[first + k] = int(off)
            p += 20
        if buf[p : p + 7] == b"trailer":
            break
    if not offsets:
        raise ValueError("empty xref table")
    return offsets


def _object_at(buf: bytes, off: int) -> tuple[dict, bytes | None]:
    """Parse the object at a byte offset into (dict-ish fields,
    stream payload or None). The dictionary scan is shallow: we pull
    /Type, /Length, /Filter, /Count — what the extractor needs."""
    m = _OBJ_HEAD.match(buf, off)
    if not m:
        raise ValueError(f"no object header at offset {off}")
    end = buf.find(b"endobj", m.end())
    if end < 0:
        raise ValueError("object without endobj")
    body = buf[m.end() : end]
    fields: dict[str, object] = {}
    tm = re.search(rb"/Type\s*/(\w+)", body)
    if tm:
        fields["type"] = tm.group(1).decode()
    lm = re.search(rb"/Length\s+(\d+)", body)
    if lm:
        fields["length"] = int(lm.group(1))
    fm = re.search(rb"/Filter\s*/(\w+)", body)
    if fm:
        fields["filter"] = fm.group(1).decode()
    cm = re.search(rb"/Count\s+(\d+)", body)
    if cm:
        fields["count"] = int(cm.group(1))
    if re.search(rb"/Encrypt\b", body):
        raise NotImplementedError("encrypted PDFs unsupported")
    stream = None
    sm = re.search(rb"stream\r?\n", body)
    if sm:
        if "length" not in fields:
            raise ValueError("stream without /Length")
        start = sm.end()
        stream = body[start : start + int(fields["length"])]
        filt = fields.get("filter")
        if filt == "FlateDecode":
            stream = zlib.decompress(stream)
        elif filt is not None:
            raise NotImplementedError(f"filter /{filt} unsupported")
    return fields, stream


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0x5C:  # backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i : i + 1]
        if c in b"nrtbf":
            out.append({"n": 10, "r": 13, "t": 9, "b": 8, "f": 12}[c.decode()])
            i += 1
        elif c == b"\n":  # line continuation
            i += 1
        elif c.isdigit():
            j = i
            while j < n and j - i < 3 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        else:
            out.append(raw[i])
            i += 1
    return out.decode("latin-1")


_TEXT_SHOW = re.compile(
    rb"\((?P<s>(?:[^()\\]|\\.)*)\)\s*Tj"
    rb"|\[(?P<arr>(?:[^\]\\]|\\.)*)\]\s*TJ",
    re.S,  # escaped newlines (line continuations) live inside strings
)
_ARR_STR = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)


def extract_text(content: bytes) -> str:
    """Concatenate the text shown by Tj / TJ operators inside BT/ET
    blocks of one content stream."""
    pieces: list[str] = []
    for bt in re.finditer(rb"BT\b(.*?)\bET", content, re.S):
        for m in _TEXT_SHOW.finditer(bt.group(1)):
            if m.group("s") is not None:
                pieces.append(_unescape_pdf_string(m.group("s")))
            else:
                for sm in _ARR_STR.finditer(m.group("arr")):
                    pieces.append(_unescape_pdf_string(sm.group(0)[1:-1]))
    return "".join(pieces)


def parse_pdf(buf: bytes) -> dict:
    """Parse a PDF into {n_pages, n_objects, text} via the xref walk
    (every object visited at its recorded offset — a wrong offset
    anywhere fails loudly)."""
    buf = bytes(buf)
    if not buf.startswith(b"%PDF-"):
        raise ValueError("missing %PDF header")
    trailer_at = buf.rfind(b"trailer")
    if trailer_at >= 0 and re.search(rb"/Encrypt\b", buf[trailer_at:]):
        raise NotImplementedError("encrypted PDFs unsupported")
    offsets = _parse_xref(buf)
    n_pages = 0
    declared = None
    texts: list[tuple[int, str]] = []
    for num in sorted(offsets):
        fields, stream = _object_at(buf, offsets[num])
        if fields.get("type") == "Page":
            n_pages += 1
        if fields.get("type") == "Pages":
            declared = fields.get("count")
        if stream is not None:
            texts.append((num, extract_text(stream)))
    if declared is not None and declared != n_pages:
        raise ValueError(
            f"page tree declares {declared} pages, found {n_pages}"
        )
    return {
        "n_pages": n_pages,
        "n_objects": len(offsets),
        "text": "".join(t for _, t in sorted(texts)),
    }


# --- Spark surface -------------------------------------------------------------


def synthesize_pdfs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic PDF fixture: each document becomes a PDF with
    1 + id % 3 pages, its text split evenly across pages and within
    a page across alternating Tj / TJ shows — extraction must
    reassemble the exact original string."""
    out_schema = "media_id long, content binary"

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                text = "" if text is None else str(text)
                n_pages = 1 + i % 3
                per = -(-max(len(text), 1) // n_pages)
                pages = []
                for p in range(n_pages):
                    chunk = text[p * per : (p + 1) * per]
                    # split the page chunk into 1-3 show pieces
                    k = 1 + (i + p) % 3
                    step = -(-max(len(chunk), 1) // k)
                    pages.append(
                        [chunk[j * step : (j + 1) * step] for j in range(k)]
                    )
                payloads.append(write_pdf(pages))
            yield pd.DataFrame({"media_id": pdf[id_col], "content": payloads})

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, out_schema
    )


def pdf_text_features(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Parse PDFs and emit (id, n_pages, n_objects, n_chars,
    text_md5) — md5 of the extracted text, oracle-checkable against
    the source table."""
    import hashlib

    out_schema = (
        f"{id_col} long, n_pages int, n_objects int, "
        "n_chars long, text_md5 string"
    )

    def feat_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            np_, no_, nc_, md_ = [], [], [], []
            for payload in pdf[content_col]:
                info = parse_pdf(payload)
                np_.append(info["n_pages"])
                no_.append(info["n_objects"])
                nc_.append(len(info["text"]))
                md_.append(
                    hashlib.md5(info["text"].encode("latin-1")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_pages": pd.Series(np_, dtype="int32"),
                    "n_objects": pd.Series(no_, dtype="int32"),
                    "n_chars": pd.Series(nc_, dtype="int64"),
                    "text_md5": pd.Series(md_, dtype=object),
                }
            )

    return media.mapInPandas(feat_batches, out_schema)
