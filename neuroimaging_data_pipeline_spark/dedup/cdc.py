"""Content-defined chunking (CDC) — shift-resistant sub-document
dedup boundaries.

Fixed-stride passage dedup (dedup/passage.py) breaks when one word is
inserted: every later window shifts. CDC places chunk boundaries
where the CONTENT says so — a hash of the w-char window ending at a
position decides the cut — so an edit only disturbs the chunks it
touches (the rsync/LBFS/casync principle; Muthitacharoen et al.,
"A Low-Bandwidth Network File System", SOSP 2001).

Determinism/parity: the boundary test is md5 of the exact w-char
window with a 16-bit prefix mod D — the same md5-parity discipline as
the MinHash family, so the DuckDB oracle recomputes identical cuts.
(A gear/Rabin ROLLING hash is the constant-factor production variant;
the windowed-md5 form keeps the boundary semantics engine-checkable
while staying O(w·n) map-only. Both are embarrassingly parallel.)

Plan shape: chunking is pure column expressions (zero shuffle); the
only shuffle is the corpus-wide chunk-frequency aggregate on compact
(md5, count) pairs with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: window width (chars) and divisor: boundary where H(window) % D == 0
CDC_W = 16
CDC_D = 64  # expected chunk length ~ D chars


def _norm(text_col) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")


def cdc_chunks(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, chunk_idx, chunk_len, chunk_md5) — one row per
    content-defined chunk of the normalized text. A cut lands after
    position i+w-1 whenever the 16-bit md5 prefix of the w-char
    window starting at i is ≡ 0 (mod D); the final chunk always ends
    at the document end. Empty docs yield no chunks.

    The per-position boundary scan runs in Arrow-batched mapInPandas
    (the byte-codec class, like the media decoders): one md5 per
    character position is crypto work, and the pure-expression HOF
    form measured 15x slower at sf0.1 because Catalyst interprets
    lambda bodies per element (the t_repetition lesson). Values are
    bit-identical either way — md5 over the utf-8 window — so the
    SQL oracle is unchanged. Zero shuffle; embarrassingly parallel."""
    import hashlib
    from typing import Iterator

    import pandas as pd

    d = docs.select(F.col(id_col), _norm(F.col(text_col)).alias("s"))
    out_schema = (
        f"{id_col} long, chunk_idx int, chunk_len long, chunk_md5 string"
    )

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, s in zip(pdf[id_col], pdf["s"]):
                if not s:
                    continue
                L = len(s)
                cuts = []
                if L >= CDC_W:
                    for p in range(L - CDC_W + 1):
                        h = hashlib.md5(
                            s[p : p + CDC_W].encode("utf-8")
                        ).digest()
                        # first 4 hex digits == first 2 bytes big-endian
                        if int.from_bytes(h[:2], "big") % CDC_D == 0:
                            cuts.append(p + CDC_W)
                ends = sorted(set(cuts + [L]))
                prev = 0
                for ci, e in enumerate(ends):
                    c = s[prev:e]
                    rows.append(
                        (
                            did,
                            ci,
                            len(c),
                            hashlib.md5(c.encode("utf-8")).hexdigest(),
                        )
                    )
                    prev = e
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_idx", "chunk_len", "chunk_md5"],
            )

    return d.mapInPandas(chunk_batches, out_schema)


def cdc_dedup_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per document: (id, n_chunks, avg_chunk_len, n_corpus_unique) —
    how many of its content-defined chunks occur exactly once in the
    whole corpus (the storable-savings signal CDC dedup acts on)."""
    ch = cdc_chunks(docs, id_col, text_col)
    freq = ch.groupBy("chunk_md5").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        ch.join(freq, "chunk_md5")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            (F.round(F.avg("chunk_len"), 6) + F.lit(0.0)).alias(
                "avg_chunk_len"
            ),
            F.sum(F.when(F.col("n_occ") == 1, 1).otherwise(0)).alias(
                "n_corpus_unique"
            ),
        )
    )
